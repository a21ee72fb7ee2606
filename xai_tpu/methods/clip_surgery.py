"""CLIP Surgery — training-free dense similarity maps
(util/attribution_methods/CLIP/CLIP_Surgery/, 1.7k LoC vendored fork).

The "architecture surgery" (clip_surgery_model.py:58-106, 317-355) is a pure
re-wiring of the standard weights — no new parameters — so it is a function
over the same Flax CLIP params:
- last 6 visual blocks run dual-path: the original path unchanged; the
  surgery path uses v-v self-attention (q = k = v) and SKIPS the FFN,
  accumulating attention outputs only;
- the surgery path's CLS row is replaced by the original path's before
  ln_post/proj;
- feature surgery (clip.py:287-309): per-token element-wise products with
  class-prob weights minus the mean-over-classes redundant component;
- similarity map (clip.py:271-284): per-class minmax over tokens, reshaped
  to the grid, bilinear upsampled.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip as clipmod
from ..models.clip import quick_gelu

SURGERY_DEPTH = 6


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mlp(x, p):
    h = x @ p["mlp_c_fc"]["kernel"] + p["mlp_c_fc"]["bias"]
    return quick_gelu(h) @ p["mlp_c_proj"]["kernel"] + \
        p["mlp_c_proj"]["bias"]


def _mha(x, p, heads):
    B, N, C = x.shape
    hd = C // heads
    qkv = x @ p["in_proj"]["kernel"] + p["in_proj"]["bias"]
    qkv = qkv.reshape(B, N, 3, heads, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    scale = hd ** -0.5
    attn_ori = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1)
    x_ori = jnp.einsum("bhnm,bhmd->bhnd", attn_ori, v)
    # surgery: v-v self-attention
    attn_vv = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", v, v) * scale, axis=-1)
    x_new = jnp.einsum("bhnm,bhmd->bhnd", attn_vv, v)

    def proj(t):
        t = t.transpose(0, 2, 1, 3).reshape(B, N, C)
        return t @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

    return proj(x_new), proj(x_ori)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _surgery_encode(model, cfg, params, x):
    """Per-token projected features from the dual-path visual tower."""
    vp = params["visual"]
    B = x.shape[0]
    y = jax.lax.conv_general_dilated(
        x, vp["conv1"]["kernel"], (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, -1, cfg.vision_width)
    y = jnp.concatenate(
        [jnp.broadcast_to(vp["class_embedding"],
                          (B, 1, cfg.vision_width)), y], axis=1)
    y = y + vp["positional_embedding"]
    y = _ln(y, vp["ln_pre"])

    L = cfg.vision_layers
    start = L - SURGERY_DEPTH
    x_cur = y
    x_new = None
    for i in range(L):
        blk = vp[f"block{i}"]
        if i < start:
            h = _ln(x_cur, blk["ln_1"])
            _, a_ori = _mha(h, blk["attn"], cfg.vision_heads)
            x_cur = x_cur + a_ori
            x_cur = x_cur + _mlp(_ln(x_cur, blk["ln_2"]), blk)
        else:
            h = _ln(x_cur, blk["ln_1"])
            a_new, a_ori = _mha(h, blk["attn"], cfg.vision_heads)
            if x_new is None:
                x_new = x_cur + a_new          # start of dual path
            else:
                x_new = x_new + a_new          # skip ffn for the new path
            x_cur = x_cur + a_ori
            x_cur = x_cur + _mlp(_ln(x_cur, blk["ln_2"]), blk)
    # surgery path CLS replaced by original path CLS (:351)
    x_new = x_new.at[:, 0].set(x_cur[:, 0])
    out = _ln(x_new, vp["ln_post"]) @ vp["proj"]
    return out


def clip_feature_surgery(image_features, text_features, t: float = 2.0):
    """clip.py:287-309 — redundant-feature removal."""
    prob = jax.nn.softmax(
        (image_features[:, :1] @ text_features.T) * t, axis=-1)
    w = prob / prob.mean(-1, keepdims=True)
    feats = image_features[:, :, None, :] * text_features[None, None]
    feats = feats * w[:, :, :, None].transpose(0, 1, 2, 3)
    redundant = feats.mean(2, keepdims=True)
    return (feats - redundant).sum(-1)


def get_similarity_map(sm, hw: int):
    """clip.py:271-284: minmax per class over tokens -> grid -> bilinear."""
    mn = sm.min(1, keepdims=True)
    mx = sm.max(1, keepdims=True)
    sm = (sm - mn) / (mx - mn)
    B, N, T = sm.shape
    side = int(N ** 0.5)
    sm = sm.reshape(B, side, side, T)
    return jax.image.resize(sm, (B, hw, hw, T), method="linear")


def surgery_map(bundle, x, text_features) -> np.ndarray:
    """clip_surgery_map (generate_emap.py:117-132): returns [H, W] for the
    first caption channel (the driver's [0, :, :, 0])."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    return np.asarray(_surgery_map_jit(
        bundle.extras["model"], bundle.extras["cfg"], bundle.params, x,
        jnp.asarray(text_features)))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _surgery_map_jit(model, cfg, params, x, text_features):
    feats = _surgery_encode(model, cfg, params, x)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    sim = clip_feature_surgery(feats, text_features)
    smap = get_similarity_map(sim[:, 1:, :], x.shape[1])
    return smap[0, :, :, 0]
