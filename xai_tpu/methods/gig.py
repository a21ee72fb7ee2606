"""Guided IG (util/attribution_methods/GIGBuilder.py, vendored from
PAIR-code/saliency).

The adaptive path search (guided_ig_impl, GIGBuilder.py:194-291) has a
data-dependent inner ``while gamma > 1.0`` loop.  Round-1 strategy ran the
inner loop on host with one device gradient per outer step — ~130 dispatches
per attribution, which the device-link round-trip time bounds at ~0.3
attr/s.  It is now ONE dispatch: a ``lax.scan`` over the 50 outer steps,
each with the softmax gradient and a bounded ``lax.while_loop`` for the
inner search; all the masking/quantile/L1 logic is elementwise jnp.  The
torch 'lower'-interpolation quantile is a sort + floor-index lookup
(static size), and the reference's accumulating ``grad[xc == x_max] = inf``
is equivalent to recomputing the mask each iteration because entries never
leave x_max once placed there.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-9


def _kth_smallest_nonneg(a_flat, k: int):
    """EXACT k-th order statistic (0-based — torch.quantile 'lower') of a
    flat array of NON-NEGATIVE floats (inf allowed), without sorting.

    Binary search on the int32 bit pattern, which is order-isomorphic to
    the float order for non-negative floats: 31 fused count-reductions
    (each one HBM pass) instead of an O(N log^2 N) on-chip sort — the sort
    of the 150k-element |grad| map per inner path-search iteration was
    ~10x the cost of everything else in the loop body."""
    ai = jax.lax.bitcast_convert_type(a_flat, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2                 # int32-overflow-safe
        cnt = jnp.sum(ai <= mid)
        take = cnt >= k + 1
        return jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi)

    lo, _ = jax.lax.fori_loop(
        0, 31, body, (jnp.int32(0), jnp.int32(0x7F800000)))
    return jax.lax.bitcast_convert_type(lo, jnp.float32)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _gig_device(apply_fn, params, x_input, steps, fraction, max_dist,
                x_baseline, target):
    """Full guided-IG path search on device.  Returns [H, W, C] attr."""
    n = x_input.size
    q_idx = int(math.floor(fraction * (n - 1)))
    diff = x_input - x_baseline
    l1_total = jnp.abs(diff).sum()

    def softmax_grad(xc):
        def score(xi):
            return jax.nn.softmax(apply_fn(params, xi[None])[0])[target]
        return jax.grad(score)(xc)

    def outer(carry, step):
        xc, attr = carry
        grad_actual = softmax_grad(xc)
        alpha = (step + 1.0) / steps
        alpha_min = jnp.maximum(alpha - max_dist, 0.0)
        alpha_max = jnp.minimum(alpha + max_dist, 1.0)
        x_min = x_baseline + diff * alpha_min
        x_max = x_baseline + diff * alpha_max
        l1_target = l1_total * (1 - (step + 1.0) / steps)

        def cond(st):
            _, _, gamma, done, it = st
            return (gamma > 1.0) & jnp.logical_not(done) & (it < 4096)

        def body(st):
            xc, attr, _, _, it = st
            x_old = xc
            ratio = jnp.where(diff != 0, (xc - x_baseline) /
                              jnp.where(diff != 0, diff, 1.0), alpha_max)
            xc1 = jnp.where(ratio < alpha_min, x_min, xc)

            l1_current = jnp.abs(xc1 - x_input).sum()
            close = jnp.abs(l1_target - l1_current) <= jnp.maximum(
                EPSILON * jnp.maximum(jnp.abs(l1_target),
                                      jnp.abs(l1_current)), EPSILON)

            grad_iter = jnp.where(xc1 == x_max, jnp.inf, grad_actual)
            a = jnp.abs(grad_iter)
            thr = _kth_smallest_nonneg(a.reshape(-1), q_idx)
            s = (a <= thr) & (grad_iter != jnp.inf)

            l1_s = (jnp.abs(xc1 - x_max) * s).sum()
            gamma = jnp.where(l1_s > 0,
                              (l1_current - l1_target) / l1_s, jnp.inf)
            moved = jnp.where(
                s, jnp.where(gamma > 1.0, x_max,
                             xc1 + (x_max - xc1) * gamma), xc1)
            new_xc = jnp.where(close, xc1, moved)
            new_attr = attr + (new_xc - x_old) * grad_actual
            # l1_s == 0 means no selectable feature can move: the iteration
            # is a no-op and the reference's `while` would spin forever
            # (it only escapes on host via floating-point luck in isclose).
            # Exit explicitly; plus a hard cap as a trace-safe backstop.
            stuck = jnp.logical_not(close) & (l1_s <= 0)
            return (new_xc, new_attr,
                    jnp.where(close, 0.0, gamma), close | stuck, it + 1)

        xc, attr, _, _, _ = jax.lax.while_loop(
            cond, body, (xc, attr, jnp.inf, False, 0))
        return (xc, attr), None

    init = (x_baseline, jnp.zeros_like(x_input))
    (xc, attr), _ = jax.lax.scan(outer, init,
                                 jnp.arange(steps, dtype=jnp.float32))
    return attr


def guided_ig(bundle, x, target, steps: int = 50, fraction: float = 0.5,
              max_dist: float = 1.0, baseline=None) -> np.ndarray:
    """GuidedIG.GetMask with the driver's config x_steps=50, max_dist=1.0,
    fraction=0.5 (evaluatePerturbation.py:114-118). Returns [H, W, C]."""
    x_input = jnp.asarray(x, jnp.float32)
    x_baseline = (jnp.zeros_like(x_input) if baseline is None
                  else jnp.asarray(baseline, jnp.float32))
    if float(jnp.abs(x_input - x_baseline).sum()) == 0:
        return np.zeros_like(np.asarray(x_input))
    return np.asarray(_gig_device(bundle.apply, bundle.params, x_input,
                                  steps, fraction, max_dist, x_baseline,
                                  target))
