"""LRP transformer attribution (t_attr) — Chefer-style relevance propagation.

Reference: util/attribution_methods/VIT_LRP/ViT_LRP_timm.py:633-760 (relprop
driver) + VIT_LRP/util/layers_ours.py:35-286 (alpha-1-beta-0 rules).  The
reference builds a *parallel* ViT from relevance-propagating layer wrappers;
here relprop is a pure reverse sweep over the standard model's taps — block
internals are recomputed from params (one extra forward worth of matmuls,
fused by XLA), and every rule is a closed-form einsum.  With alpha=1 the
Linear rule needs only the activator term.

Rules implemented (layers_ours.py):
- safe_divide (:10-13)
- Linear alpha1beta0 (:215-238)
- RelPropSimple for the two attention einsum matmuls (:50-60, halved as in
  Attention.relprop ViT_LRP_timm.py:361-376)
- Add with sum-renormalization (:104-125)
- Clone (:156-175), IndexSelect pool (:134-152)
- LayerNorm/GELU/Softmax/Dropout pass relevance unchanged (:70-82)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import vit as vitmod
from .vit_explain import _collect as _ve_collect
from .vit_explain import rollout_residual, _cls_patch_grid


def _safe_divide(a, b):
    den = jnp.clip(b, 1e-9, None) + jnp.clip(b, None, 1e-9)
    den = den + (den == 0) * 1e-9
    return a / den * (b != 0)


def _linear_rp(R, X, K):
    """alpha=1 beta=0 Linear rule; K is the flax kernel [in, out]."""
    pw = jnp.clip(K, 0, None)
    nw = jnp.clip(K, None, 0)
    px = jnp.clip(X, 0, None)
    nx = jnp.clip(X, None, 0)
    Z = px @ pw + nx @ nw
    S = _safe_divide(R, Z)
    return px * (S @ pw.T) + nx * (S @ nw.T)


def _add_rp(R, X0, X1):
    Z = X0 + X1
    S = _safe_divide(R, Z)
    a = X0 * S
    b = X1 * S
    a_sum, b_sum = a.sum(), b.sum()
    tot = jnp.abs(a_sum) + jnp.abs(b_sum)
    a_fact = _safe_divide(jnp.abs(a_sum), tot) * R.sum()
    b_fact = _safe_divide(jnp.abs(b_sum), tot) * R.sum()
    a = a * _safe_divide(a_fact, a.sum())
    b = b * _safe_divide(b_fact, b.sum())
    return a, b


def _clone_rp(R0, R1, X):
    return X * (_safe_divide(R0, X) + _safe_divide(R1, X))


def _matmul2_rp(R, attn, v):
    """einsum('bhij,bhjd->bhid') RelPropSimple, halved (ViT_LRP:361-364)."""
    Z = jnp.einsum("bhij,bhjd->bhid", attn, v)
    S = _safe_divide(R, Z)
    c_attn = jnp.einsum("bhid,bhjd->bhij", S, v)
    c_v = jnp.einsum("bhij,bhid->bhjd", attn, S)
    return (attn * c_attn) / 2, (v * c_v) / 2


def _matmul1_rp(R, q, k):
    """einsum('bhid,bhjd->bhij') RelPropSimple, halved (:372-375)."""
    Z = jnp.einsum("bhid,bhjd->bhij", q, k)
    S = _safe_divide(R, Z)
    c_q = jnp.einsum("bhij,bhjd->bhid", S, k)
    c_k = jnp.einsum("bhij,bhid->bhjd", S, q)
    return (q * c_q) / 2, (k * c_k) / 2


def _layernorm(x, p, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _attn_cams_and_bottom(apply_probed, cfg, params, x, target):
    """Full relprop sweep; returns per-block attention relevance
    [L, B, H, N, N] plus the taps needed afterwards."""
    logits, taps = apply_probed(params, x, None)
    B = x.shape[0]
    H = cfg.num_heads
    d = cfg.embed_dim // H
    scale = d ** -0.5

    # head -> pool -> norm (identity)
    tokens_final = taps["block_out"][-1]            # [B, N, D]
    normed = _layernorm(tokens_final, params["norm"])
    cls_feat = normed[:, 0]
    R = jax.nn.one_hot(jnp.asarray([target]), cfg.num_classes,
                       dtype=x.dtype)               # [1, C]
    R = _linear_rp(R, cls_feat, params["head"]["kernel"])   # [B, D]
    cam = jnp.zeros_like(normed).at[:, 0].set(R)    # IndexSelect scatter

    attn_cams = []
    for i in reversed(range(cfg.depth)):
        p = params[f"block{i}"]
        xin = taps["block_in"][i]
        x_plus = taps["input_plus_attn"][i]
        attn = taps["attn"][i]
        v = taps["v"][i]
        # recompute the remaining internals
        n1 = _layernorm(xin, p["norm1"])
        qkv = (n1 @ p["attn"]["qkv"]["kernel"] + p["attn"]["qkv"]["bias"])
        qkv = qkv.reshape(B, -1, 3, H, d)
        q, k = qkv[:, :, 0].transpose(0, 2, 1, 3), qkv[:, :, 1].transpose(
            0, 2, 1, 3)
        out_pre_proj = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out_pre_proj = out_pre_proj.transpose(0, 2, 1, 3).reshape(
            B, -1, cfg.embed_dim)
        n2 = _layernorm(x_plus, p["norm2"])
        h1 = n2 @ p["mlp_fc1"]["kernel"] + p["mlp_fc1"]["bias"]
        hact = jax.nn.gelu(h1, approximate=False)

        # --- Block.relprop (ViT_LRP_timm.py:434-447) ---
        cam1, cam2 = _add_rp(cam, x_plus, taps["mlp_val"][i])
        cam2 = _linear_rp(cam2, hact, p["mlp_fc2"]["kernel"])
        cam2 = _linear_rp(cam2, n2, p["mlp_fc1"]["kernel"])
        cam = _clone_rp(cam1, cam2, x_plus)

        cam1, cam2 = _add_rp(cam, xin, taps["attn_out"][i])
        # Attention.relprop (:355-379)
        camA = _linear_rp(cam2, out_pre_proj, p["attn"]["proj"]["kernel"])
        camA = camA.reshape(B, -1, H, d).transpose(0, 2, 1, 3)
        cam_attn, cam_v = _matmul2_rp(camA, attn, v)
        attn_cams.append(cam_attn)
        cam_q, cam_k = _matmul1_rp(cam_attn, q, k)
        cam_qkv = jnp.stack([cam_q, cam_k, cam_v], axis=2)  # [B,H,3,N,d]
        cam_qkv = cam_qkv.transpose(0, 3, 2, 1, 4).reshape(
            B, -1, 3 * cfg.embed_dim)
        cam2 = _linear_rp(cam_qkv, n1, p["attn"]["qkv"]["kernel"])
        cam = _clone_rp(cam1, cam2, xin)

    return jnp.stack(attn_cams[::-1]), cam, taps    # cams, bottom relevance


def _attn_cams(apply_probed, cfg, params, x, target):
    cams, _, _ = _attn_cams_and_bottom(apply_probed, cfg, params, x, target)
    return cams


def lrp_rollout(bundle, x, target, start_layer: int = 0):
    """relprop method='rollout' (ViT_LRP_timm.py:651-661): positive
    head-mean attention relevance rolled out with the residual rule."""
    xb = jnp.asarray(x)
    if xb.ndim == 3:
        xb = xb[None]
    return _lrp_rollout_jit(bundle.apply_probed, bundle.extras, start_layer,
                            bundle.params, xb, target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _lrp_rollout_jit(apply_probed, cfg, start_layer, params, xb, target):
    cams = _attn_cams(apply_probed, cfg, params, xb, target)
    mats = jnp.clip(cams, 0).mean(axis=2)
    ro = rollout_residual(mats, start_layer)[0, 0]
    return _cls_patch_grid(ro, ro.shape[-1])


def lrp_layer(bundle, x, target, layer: int = -1,
              is_ablation: bool = False):
    """relprop method='last_layer'/'second_layer'
    (ViT_LRP_timm.py:726-745): one block's attention relevance CLS row,
    optionally gradient-weighted."""
    xb = jnp.asarray(x)
    if xb.ndim == 3:
        xb = xb[None]
    return _lrp_layer_jit(bundle.apply_probed, bundle.extras, layer,
                          is_ablation, bundle.params, xb, target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _lrp_layer_jit(apply_probed, cfg, layer, is_ablation, params, xb,
                   target):
    cams = _attn_cams(apply_probed, cfg, params, xb, target)
    cam = cams[layer][0]
    if is_ablation:
        _, grads = _ve_collect(apply_probed, cfg, params, xb, target)
        cam = grads[layer][0] * cam
    cam = jnp.clip(cam, 0).mean(axis=0)
    return _cls_patch_grid(cam[0], cam.shape[-1])


def _conv_zb_rp(R_tokens, x_img, kernel, patch: int):
    """z^B rule for the patch-embedding conv (layers_ours.py Conv2d branch
    for 3-channel inputs): bounds L/H are the global input min/max."""
    pw = jnp.clip(kernel, 0, None)
    nw = jnp.clip(kernel, None, 0)
    L = jnp.full_like(x_img, x_img.min())
    H = jnp.full_like(x_img, x_img.max())

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (patch, patch), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    Za = conv(x_img, kernel) - conv(L, pw) - conv(H, nw) + 1e-9
    S = R_tokens / Za

    def convT(s, w):
        _, vjp = jax.vjp(lambda v: conv(v, w), x_img)
        return vjp(s)[0]

    return x_img * convT(S, kernel) - L * convT(S, pw) - H * convT(S, nw)


def lrp_full(bundle, x, target):
    """relprop method='full' (ViT_LRP_timm.py:645-651): relevance propagated
    through the positional-embedding Add and the patch-embedding conv (z^B
    rule) back to the pixels.  Returns [H, W] (channel-summed)."""
    xb = jnp.asarray(x)
    if xb.ndim == 3:
        xb = xb[None]
    cfg = bundle.extras
    return _lrp_full_jit(bundle.apply_probed, cfg, bundle.params, xb,
                         target)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _lrp_full_jit(apply_probed, cfg, params, xb, target):
    _, bottom, taps = _attn_cams_and_bottom(apply_probed, cfg,
                                            params, xb, target)
    pos = params["pos_embed"]
    x0 = taps["patch_embedding"] - pos               # tokens pre-pos-add
    cam_x, _ = _add_rp(bottom, x0, jnp.broadcast_to(pos, x0.shape))
    cam_patches = cam_x[:, 1:]                       # drop CLS
    P = cfg.grid
    R_tokens = cam_patches.reshape(xb.shape[0], P, P, cfg.embed_dim)
    R_img = _conv_zb_rp(R_tokens, xb,
                        params["patch_embed"]["kernel"], cfg.patch)
    return R_img[0].sum(-1)


def transformer_attribution(bundle, x, target, start_layer: int = 0):
    """LRP.generate_LRP(method='transformer_attribution')
    (ViT_explanation_generator.py:107-133 + ViT_LRP_timm.py:665-684):
    per-block (grad * attn_cam).clamp(0).mean(heads), residual rollout,
    CLS row.  Returns [P, P]."""
    xb = jnp.asarray(x)
    if xb.ndim == 3:
        xb = xb[None]
    return _t_attr_jit(bundle.apply_probed, bundle.extras, start_layer,
                       bundle.params, xb, target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _t_attr_jit(apply_probed, cfg, start_layer, params, xb, target):
    cams = _attn_cams(apply_probed, cfg, params, xb, target)
    _, grads = _ve_collect(apply_probed, cfg, params, xb, target)
    weighted = jnp.clip(grads * cams, 0).mean(axis=2)   # [L, B, N, N]
    ro = rollout_residual(weighted, start_layer)[0, 0]
    return _cls_patch_grid(ro, ro.shape[-1])
