"""RISE — randomized masked-forward saliency (used by the CLIP pipeline,
CLIP/generate_emap.py:65-104, and generally available for any model).

Reference: generate_masks (N=2000, s=8, p1=0.5 — bilinearly-upsampled random
binary low-res grids with random crop offsets), rise() scores masked images
by the model response and sums response-weighted masks / N / p1.

TPU design: mask generation on device with a fold_in'd PRNG (deterministic
per image index under sharding), upsample via jax.image.resize (bilinear),
masked forwards chunked with lax.map.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def generate_masks(key, n_masks: int = 2000, s: int = 8, p1: float = 0.5,
                   input_hw: int = 224) -> jnp.ndarray:
    """[N, H, W] float masks in [0, 1] (generate_emap.py:65-84 semantics:
    random s*s Bernoulli(p1) grid, bilinear-upsampled to (s+1)*cell, random
    cell-sized crop)."""
    cell = int(jnp.ceil(input_hw / s))
    up = (s + 1) * cell
    k1, k2 = jax.random.split(key)
    grid = (jax.random.uniform(k1, (n_masks, s, s)) < p1).astype(jnp.float32)
    big = jax.image.resize(grid, (n_masks, up, up), method="linear")
    offs = jax.random.randint(k2, (n_masks, 2), 0, cell)

    def crop(m, off):
        return jax.lax.dynamic_slice(m, (off[0], off[1]),
                                     (input_hw, input_hw))

    return jax.vmap(crop)(big, offs)


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _rise_scores(apply_fn, params, x, masks, target, chunk,
                 raw_scores=False):
    n = masks.shape[0]

    def one_chunk(mb):
        xb = x[None] * mb[..., None]
        out = apply_fn(params, xb)
        if raw_scores:
            # reference CLIP weighting: the raw caption cosine, no softmax
            # (generate_emap.py:95-99)
            return out[:, target]
        return jax.nn.softmax(out, axis=-1)[:, target]

    scores = jax.lax.map(one_chunk,
                         masks.reshape((n // chunk, chunk) +
                                       masks.shape[1:]))
    return scores.reshape(n)


def rise(bundle, x, target, key, n_masks: int = 2000, s: int = 8,
         p1: float = 0.5, chunk: int = 50, dtype=None,
         masks=None, raw_scores: bool = False) -> jnp.ndarray:
    """Response-weighted mask sum / (N * p1) (generate_emap.py:85-104).
    Returns [H, W].

    ``dtype=bf16`` runs the N masked scoring forwards — the entire cost at
    N=2000 — in bf16; mask generation and the final response-weighted mask
    sum stay f32 (the weighting einsum is ~N*H*W FLOPs, irrelevant).
    ``masks`` ([N, H, W]) injects a shared mask set (golden-parity
    protocol: both sides score identical masks)."""
    x = jnp.asarray(x)
    hw = x.shape[0]
    if masks is not None:
        masks = jnp.asarray(masks, jnp.float32)
        n_masks = int(masks.shape[0])
    while n_masks % chunk:
        chunk -= 1
    if masks is None:
        masks = generate_masks(key, n_masks, s, p1, hw)
    params = bundle.params
    if dtype is not None:
        from .gradient import _cast_params_cached
        params = _cast_params_cached(bundle, dtype)
        scores = _rise_scores(bundle.apply, params, x.astype(dtype),
                              masks.astype(dtype), target, chunk,
                              raw_scores)
        scores = scores.astype(jnp.float32)
    else:
        scores = _rise_scores(bundle.apply, params, x, masks, target, chunk,
                              raw_scores)
    sal = jnp.einsum("n,nhw->hw", scores, masks)
    return sal / n_masks / p1
