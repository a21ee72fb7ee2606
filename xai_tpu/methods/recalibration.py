"""Attribution-recalibration reference samplers
(util/attribution_methods/attribution_recalibration/saliency_methods/
{IG_SG, IG_Uniform}.py): expected-gradients-style IG with a bag of
references — IG-SG draws Gaussian-noised copies of the input, IG-Uniform
draws uniform-random images; k interpolation steps per reference; the
attribution is the mean over (references x steps) of grad x (input - ref).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _expected_ig(apply_fn, params, x, refs, target, k, chunk):
    """refs: [B, H, W, C] reference bag; k alphas in (0, 1]."""
    B = refs.shape[0]
    alphas = (jnp.arange(1, k + 1) / k).reshape(k, 1, 1, 1)
    # [B, k, H, W, C] sample points
    pts = refs[:, None] + alphas[None] * (x[None, None] - refs[:, None])
    pts = pts.reshape((B * k,) + x.shape)
    deltas = jnp.broadcast_to(x[None, None] - refs[:, None],
                              (B, k) + x.shape).reshape((B * k,) + x.shape)

    def score_sum(xb):
        return apply_fn(params, xb)[:, target].sum()

    n = B * k
    pts_c = pts.reshape((n // chunk, chunk) + x.shape)

    def one(xb):
        return jax.grad(score_sum)(xb)

    grads = jax.lax.map(one, pts_c).reshape((n,) + x.shape)
    return (grads * deltas).mean(axis=0)


def ig_sg(bundle, x, target, key, k: int = 10, bg_size: int = 10,
          sigma: float = 0.15, chunk: int = 10):
    """IntGradSG: references = input + N(0, sigma*(max-min)) noise."""
    x = jnp.asarray(x)
    std = sigma * (x.max() - x.min())
    refs = x[None] + std * jax.random.normal(key, (bg_size,) + x.shape)
    n = k * bg_size
    while n % chunk:
        chunk -= 1
    return _expected_ig(bundle.apply, bundle.params, x, refs, target, k,
                        chunk)


def ig_uniform(bundle, x, target, key, k: int = 10, bg_size: int = 10,
               chunk: int = 10, low: float = -1.0, high: float = 1.0):
    """IntGradUniform: references = uniform-random (normalized) images."""
    x = jnp.asarray(x)
    refs = jax.random.uniform(key, (bg_size,) + x.shape, x.dtype, low, high)
    n = k * bg_size
    while n % chunk:
        chunk -= 1
    return _expected_ig(bundle.apply, bundle.params, x, refs, target, k,
                        chunk)
