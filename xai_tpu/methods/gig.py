"""Guided IG (util/attribution_methods/GIGBuilder.py, vendored from
PAIR-code/saliency).

The adaptive path search (guided_ig_impl, GIGBuilder.py:194-291) has a
data-dependent inner ``while gamma > 1.0`` loop.  Strategy (SURVEY §7 "hard
parts"): host control flow for the inner loop (pure elementwise numpy on a
150k-element image — microseconds), device for every gradient call (the only
expensive part, one fwd+bwd per outer step).  The gradient is of the
*softmax* output (call_model_function, GIGBuilder.py:296-310).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-9


@functools.partial(jax.jit, static_argnums=(0,))
def _softmax_grad(apply_fn, params, x, target):
    def score(xi):
        return jax.nn.softmax(apply_fn(params, xi[None])[0])[target]
    return jax.grad(score)(x)


def _quantile_lower(a: np.ndarray, q: float) -> float:
    """torch.quantile(..., interpolation='lower') on a flat array."""
    flat = np.sort(a.reshape(-1))
    idx = int(math.floor(q * (flat.size - 1)))
    return float(flat[idx])


def guided_ig(bundle, x, target, steps: int = 50, fraction: float = 0.5,
              max_dist: float = 1.0, baseline=None) -> np.ndarray:
    """GuidedIG.GetMask with the driver's config x_steps=50, max_dist=1.0,
    fraction=0.5 (evaluatePerturbation.py:114-118). Returns [H, W, C]."""
    x_input = np.asarray(x, dtype=np.float32)
    x_baseline = (np.zeros_like(x_input) if baseline is None
                  else np.asarray(baseline, dtype=np.float32))
    xc = x_baseline.copy()
    l1_total = np.abs(x_input - x_baseline).sum()
    attr = np.zeros_like(x_input)
    if np.abs(x_input - x_baseline).sum() == 0:
        return attr

    for step in range(steps):
        grad_actual = np.asarray(
            _softmax_grad(bundle.apply, bundle.params, jnp.asarray(xc),
                          target))
        grad = grad_actual.copy()
        alpha = (step + 1.0) / steps
        alpha_min = max(alpha - max_dist, 0.0)
        alpha_max = min(alpha + max_dist, 1.0)
        x_min = x_baseline + (x_input - x_baseline) * alpha_min
        x_max = x_baseline + (x_input - x_baseline) * alpha_max
        l1_target = l1_total * (1 - (step + 1) / steps)

        gamma = np.inf
        while gamma > 1.0:
            x_old = xc.copy()
            with np.errstate(invalid="ignore", divide="ignore"):
                x_alpha = np.where(x_input - x_baseline != 0,
                                   (xc - x_baseline) / (x_input - x_baseline),
                                   np.nan)
            x_alpha[np.isnan(x_alpha)] = alpha_max
            behind = x_alpha < alpha_min
            xc[behind] = x_min[behind]

            l1_current = np.abs(xc - x_input).sum()
            if math.isclose(l1_target, l1_current, rel_tol=EPSILON,
                            abs_tol=EPSILON):
                attr += (xc - x_old) * grad_actual
                break

            grad[xc == x_max] = np.inf
            threshold = _quantile_lower(np.abs(grad), fraction)
            s = np.logical_and(np.abs(grad) <= threshold, grad != np.inf)

            l1_s = (np.abs(xc - x_max) * s).sum()
            gamma = ((l1_current - l1_target) / l1_s) if l1_s > 0 else np.inf

            if gamma > 1.0:
                xc[s] = x_max[s]
            else:
                assert gamma > 0, gamma
                # translate_alpha_to_x(gamma, x_max, xc)
                xc[s] = (xc + (x_max - xc) * gamma)[s]

            attr += (xc - x_old) * grad_actual

    return attr
