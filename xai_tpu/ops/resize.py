"""Resize ops matching the torchvision semantics the reference relies on.

- ``resize_bilinear``: transforms.Resize(..., antialias=True) on tensors
  (evaluatePerturbation.py:92, 201) — half-pixel centers; triangle-filter
  antialiasing on downscale (jax.image.resize matches this model).
- ``resize_nearest_exact``: InterpolationMode.NEAREST_EXACT
  (evaluatePerturbation.py:95, 202) — index = floor((i + 0.5) * scale),
  implemented with explicit gathers so it is bit-exact.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, hw: tuple, antialias: bool = True
                    ) -> jnp.ndarray:
    """Resize the trailing two spatial dims of [..., H, W] or an NHWC image's
    middle dims. Works on [H, W], [C, H, W] and [N, H, W, C]."""
    if x.ndim == 2:
        shape = hw
    elif x.ndim == 3:  # [C, H, W]
        shape = (x.shape[0],) + tuple(hw)
    elif x.ndim == 4:  # NHWC
        shape = (x.shape[0],) + tuple(hw) + (x.shape[3],)
    else:
        raise ValueError(f"unsupported rank {x.ndim}")
    return jax.image.resize(x, shape, method="linear", antialias=antialias)


def resize_nearest_exact(x: jnp.ndarray, hw: tuple) -> jnp.ndarray:
    """NEAREST_EXACT on the last two dims of [..., H, W]."""
    H, W = x.shape[-2], x.shape[-1]
    h, w = hw
    rows = jnp.clip(jnp.floor((jnp.arange(h) + 0.5) * (H / h)).astype(
        jnp.int32), 0, H - 1)
    cols = jnp.clip(jnp.floor((jnp.arange(w) + 0.5) * (W / w)).astype(
        jnp.int32), 0, W - 1)
    return x[..., rows, :][..., cols]


def upsample_patch_map(patch_map: jnp.ndarray, img_hw: int) -> jnp.ndarray:
    """[P, P] patch-level map -> [img_hw, img_hw] by bilinear upsample — the
    reference's ``resize(saliency_map)`` on 14x14/7x7 ViT maps."""
    return resize_bilinear(patch_map, (img_hw, img_hw))
