"""Quickshift superpixels ON DEVICE — the TPU-native form of LIME's
segmenter (Vedaldi & Soatto, ECCV 2008; lime/wrappers/scikit_image.py:87).

The two hot phases are stencil computations, which a 1-core host CPU runs
at its exp-throughput wall (~150 ms/image even SIMD-vectorized,
native/superpixels.cpp) but a TPU chews through in single-digit ms:

- Parzen density: one ``conv_general_dilated_patches`` op turns the
  (2w+1)^2 window into a vector axis [H, W, K, 3]; density =
  exp(-(color_d2 + spatial)/2s^2) summed over K — fully fused, no scan;
- parent link: argmin over the same K axis of the joint distance to a
  HIGHER-density neighbor (d < max_dist^2, else root).

Only the root-following/label compaction (pointer chasing, O(N log N))
stays on host — numpy parent-jumping, ~1 ms.

Matches native/superpixels.cpp's semantics (same LAB conversion, same
window w = 3*kernel_size, same joint distance); parent choices can differ
only on exact float ties (the C++ ring scan prefers ring order, argmin
prefers the lowest offset index).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rgb2lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] sRGB in [0,1] -> CIELAB (D65), the skimage/native form."""
    c = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4,
                  rgb / 12.92)
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    X = (0.412453 * r + 0.357580 * g + 0.180423 * b) / 0.95047
    Y = (0.212671 * r + 0.715160 * g + 0.072169 * b)
    Z = (0.019334 * r + 0.119193 * g + 0.950227 * b) / 1.08883

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(X), f(Y), f(Z)
    return jnp.stack([116.0 * fy - 16.0, 500.0 * (fx - fy),
                      200.0 * (fy - fz)], axis=-1).astype(jnp.float32)


def _window_patches(x, w: int, fill):
    """[H, W, C] -> [H, W, K*C] where K = (2w+1)^2 window values (row-major
    dy, dx), out-of-image positions = fill.  One XLA patches op — the whole
    window becomes a vector axis instead of a 625-step scan (each scan step
    was a dispatch-latency-bound sliver)."""
    H, W, C = x.shape
    p = jax.lax.conv_general_dilated_patches(
        jnp.pad(x, ((w, w), (w, w), (0, 0)),
                constant_values=fill)[None],
        filter_shape=(2 * w + 1, 2 * w + 1), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    # patches feature layout: channel-major [C * K] -> [H, W, K, C].
    # NOTE fill must be FINITE: the patches op is a one-hot convolution,
    # and inf * 0 = NaN would poison every border window.
    K = (2 * w + 1) ** 2
    return p.reshape(H, W, C, K).transpose(0, 1, 3, 2)


def _quickshift_core(rgb, w: int, wd: int, ratio, inv2s2, max_d2):
    """rgb: [H, W, 3] in [0, 1]. Returns parent [H, W] int32 flat indices.
    The LAB conversion + ratio scale live INSIDE the jit — eager, they were
    three separate dispatches (tunnel round-trips) per image."""
    lab = rgb2lab(rgb) * ratio
    H, W = lab.shape[:2]
    K = (2 * w + 1) ** 2
    dy = jnp.repeat(jnp.arange(-w, w + 1), 2 * w + 1)
    dx = jnp.tile(jnp.arange(-w, w + 1), 2 * w + 1)
    spatial = (dy * dy + dx * dx).astype(jnp.float32)          # [K]

    nb = _window_patches(lab, w, 1e6)                 # [H, W, K, 3]
    diff = nb - lab[:, :, None, :]
    d2 = (diff * diff).sum(-1) + spatial              # [H, W, K]
    density = jnp.exp(-d2 * inv2s2).sum(-1)           # [H, W]

    nb_dens = _window_patches(density[..., None], w,
                              -1e30)[..., 0]          # [H, W, K]
    in_rad = (jnp.maximum(jnp.abs(dy), jnp.abs(dx)) <= wd) & \
             ((dy != 0) | (dx != 0))                  # [K]
    ok = in_rad[None, None] & (nb_dens > density[..., None]) & (d2 < max_d2)
    d_masked = jnp.where(ok, d2, jnp.inf)
    best_k = jnp.argmin(d_masked, axis=-1)            # [H, W]
    found = jnp.take_along_axis(ok, best_k[..., None], -1)[..., 0]
    off = jnp.where(found, dy[best_k] * W + dx[best_k], 0)

    base = (jnp.arange(H)[:, None] * W + jnp.arange(W)[None, :])
    return (base + off).astype(jnp.int32)


_quickshift_device = functools.partial(jax.jit, static_argnums=(1, 2))(
    _quickshift_core)

_quickshift_device_b = functools.partial(jax.jit, static_argnums=(1, 2))(
    lambda rgbs, w, wd, ratio, inv2s2, max_d2: jax.vmap(
        lambda r: _quickshift_core(r, w, wd, ratio, inv2s2, max_d2))(rgbs))


def _use_pallas() -> bool:
    """The Pallas stencil kernel replaces the XLA patches form on real TPU
    (376 MB -> ~1 MB HBM traffic per image); CPU (tests) and any other
    backend keep the portable XLA path."""
    import os
    if os.environ.get("XAI_TPU_QS_IMPL") == "xla":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _parents_batch(imgs, w: int, wd: int, ratio, inv2s2, max_d2):
    if _use_pallas():
        from ..kernels.quickshift_pallas import quickshift_parents_pallas
        return quickshift_parents_pallas(imgs, inv2s2, max_d2, ratio,
                                         w=w, wd=wd)
    return _quickshift_device_b(imgs, w, wd, ratio, inv2s2, max_d2)


def _compact(parent, H, W):
    """Host tail: path-compress to roots (log-steps pointer jumping), then
    compact root ids to consecutive labels."""
    for _ in range(64):
        nxt = parent[parent]
        if np.array_equal(nxt, parent):
            break
        parent = nxt
    roots, labels = np.unique(parent, return_inverse=True)
    return labels.reshape(H, W).astype(np.int32)


# NOTE: a fully on-device compaction via sort + searchsorted was measured
# SLOWER than download+numpy (~96 ms vs ~45 ms download + ~8 ms host for a
# batch of four 224px maps), so the *standalone* quickshift entry points
# keep host compaction.  The sort-free form below (cumsum-of-roots rank,
# O(N) with one gather) is cheap enough to run on device and exists for
# consumers that keep the labels on the chip (the fused LIME pipeline) —
# for them the download+reupload would cost more than the compaction.


def _labels_from_parents(parent_flat):
    """[N] int32 parent pointers -> (labels [N] int32, n_roots int32).

    Pointer-jumps to roots (16 doublings cover chains up to 2^16 = 65536
    pixels), then assigns consecutive labels in ascending-root-index order
    via ``cumsum(is_root)`` — bit-identical to the host ``np.unique``
    compaction in ``_compact`` (unique sorts its roots the same way)."""
    n = parent_flat.shape[0]
    p = jax.lax.fori_loop(0, 16, lambda _, q: jnp.take(q, q), parent_flat)
    is_root = p == jnp.arange(n, dtype=p.dtype)
    rank = jnp.cumsum(is_root.astype(jnp.int32))
    return (jnp.take(rank, p) - 1).astype(jnp.int32), rank[-1]


def parents_to_labels_batch(parents):
    """[B, H, W] int32 parent maps -> (labels [B, H*W], counts [B]).
    Pure jnp — intended to be called inside a caller's jit."""
    B = parents.shape[0]
    return jax.vmap(_labels_from_parents)(parents.reshape(B, -1))


def quickshift_device_batch(images, ratio: float = 0.2,
                            kernel_size: float = 4.0,
                            max_dist: float = 200.0) -> np.ndarray:
    """[B, H, W, 3] float images in [0, 1] -> [B, H, W] int32 labels.
    The stencil phases for the whole batch ride ONE device dispatch; only
    the per-image label compaction stays on host."""
    imgs = jnp.asarray(images, jnp.float32)
    B, H, W = imgs.shape[:3]
    w = max(1, int(3.0 * kernel_size))
    wd = min(w, int(np.ceil(max_dist)))
    parents = np.asarray(_parents_batch(
        imgs, w, wd, jnp.float32(ratio),
        jnp.float32(1.0 / (2.0 * kernel_size * kernel_size)),
        jnp.float32(max_dist * max_dist))).reshape(B, -1)
    return np.stack([_compact(parents[b], H, W) for b in range(B)])


def quickshift_device(image, ratio: float = 0.2, kernel_size: float = 4.0,
                      max_dist: float = 200.0) -> np.ndarray:
    """[H, W, 3] float image in [0, 1] -> [H, W] int32 segment labels."""
    return quickshift_device_batch(np.asarray(image)[None], ratio,
                                   kernel_size, max_dist)[0]
