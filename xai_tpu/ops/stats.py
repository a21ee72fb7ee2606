"""Curve statistics: AUC, Spearman rank correlation, entropy.

AUC matches MASTestFunctions.py:30-32 exactly (normalized trapezoid).
Spearman matches scipy.stats.spearmanr with average-tie ranks (used by the
monotonicity metric, MonotonicityTest.py:209-213, and the sanity driver).

``auc``/``spearman`` are jnp for use INSIDE traced computations (the
differentiable MAS loss).  For host-side scoring of ~225-point curves use
``auc_np``/``spearman_np`` — each eager jnp op on a tiny array is a full
device dispatch, and a battery's ~20 of them cost more wall-clock over
the device link than all 675 model forwards combined.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def auc_np(arr) -> float:
    arr = np.asarray(arr)
    return float((arr.sum() - arr[0] / 2 - arr[-1] / 2) / (arr.shape[0] - 1))


def spearman_np(a, b) -> float:
    """scipy-free Spearman with average-tie ranks, host numpy."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()

    def ranks(x):
        order = np.argsort(x)
        pos = np.empty_like(order)
        pos[order] = np.arange(len(x))
        xs = x[order]
        # average rank within tie groups
        _, inv, counts = np.unique(xs, return_inverse=True,
                                   return_counts=True)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        avg = starts + (counts - 1) / 2.0
        r = np.empty(len(x))
        r[order] = avg[inv]
        return r

    ra, rb = ranks(a), ranks(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / denom)


def auc(arr) -> jnp.ndarray:
    arr = jnp.asarray(arr)
    return (arr.sum() - arr[0] / 2 - arr[-1] / 2) / (arr.shape[0] - 1)


def _average_ranks(x: jnp.ndarray) -> jnp.ndarray:
    """1-D average ranks (ties get the mean of their positional ranks),
    matching scipy.stats.rankdata(method='average')."""
    n = x.shape[0]
    order = jnp.argsort(x)
    pos = jnp.empty_like(order).at[order].set(jnp.arange(n))
    xs = x[order]
    # for each element, rank = mean of positional ranks of its tie group
    first = jnp.searchsorted(xs, xs, side="left")
    last = jnp.searchsorted(xs, xs, side="right") - 1
    avg = (first + last) / 2.0 + 1.0
    return avg[pos]


def spearman(a, b) -> jnp.ndarray:
    a = jnp.asarray(a, dtype=jnp.float64 if jnp.asarray(a).dtype == jnp.float64
                    else jnp.float32).ravel()
    b = jnp.asarray(b).astype(a.dtype).ravel()
    ra = _average_ranks(a)
    rb = _average_ranks(b)
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    denom = jnp.sqrt((ra * ra).sum() * (rb * rb).sum())
    return (ra * rb).sum() / denom


def entropy_bits(probs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """-sum p log2 p, the per-step entropy column (RISETestFunctions.py:124)."""
    p = jnp.clip(probs, 1e-12, 1.0)
    return -(p * jnp.log2(p)).sum(axis=axis)
