"""CLIP explainers: Grad-ECLIP (+ablations), MaskCLIP, self-attention,
GAME relevance, CLIP-LRP, attention rollout, Grad-CAM — the capability
surface of util/attribution_methods/CLIP/generate_emap.py.

The four vendored CLIP forks collapse onto two primitives:
- ``encode_dense``: the last visual block decomposed with 1-HEAD attention
  exposing q/k/v, the attention map, the pre-projection attention output and
  the value-path embedding v_final (clip_encode_dense,
  generate_emap.py:309-377);
- probed attention gradients on the standard model (mm_interpret /
  clip_lrp, :133-268) via models/clip.zero_probes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip as clipmod


class DenseOutputs(NamedTuple):
    outputs: jnp.ndarray      # [B, N, E] projected tokens
    v_final: jnp.ndarray      # [B, N-1, E] value-path embedding
    x_in: jnp.ndarray         # [B, N, W] input to the last block
    v: jnp.ndarray            # [B, N, W] raw values
    q_out: jnp.ndarray        # [B, N, W] out_proj(q)
    k_out: jnp.ndarray        # [B, N, W] out_proj(k)
    attn: jnp.ndarray         # [B, N, N] 1-head attention
    att_output: jnp.ndarray   # [B, N, W] pre-out_proj attention output
    map_size: tuple


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mlp(x, p):
    h = x @ p["mlp_c_fc"]["kernel"] + p["mlp_c_fc"]["bias"]
    h = clipmod.quick_gelu(h)
    return h @ p["mlp_c_proj"]["kernel"] + p["mlp_c_proj"]["bias"]


def _dense_tail(att_output, x_in, blk, vp):
    """att_output -> projected output tokens (the differentiable tail for
    grad_eclip's gradient)."""
    x_after = att_output @ blk["attn"]["out_proj"]["kernel"] + \
        blk["attn"]["out_proj"]["bias"]
    x = x_after + x_in
    x = x + _mlp(_ln(x, blk["ln_2"]), blk)
    x = _ln(x, vp["ln_post"])
    return x @ vp["proj"]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _encode_dense_jit(model, cfg, params, x):
    vp = params["visual"]
    L = cfg.vision_layers
    blk = vp[f"block{L - 1}"]
    x_in = model.apply({"params": params}, x, stop_before_last=True,
                       method=clipmod.CLIP.encode_image)

    h = _ln(x_in, blk["ln_1"])
    qkv = h @ blk["attn"]["in_proj"]["kernel"] + blk["attn"]["in_proj"]["bias"]
    W = cfg.vision_width
    q, k, v = qkv[..., :W], qkv[..., W:2 * W], qkv[..., 2 * W:]
    # 1-head "dense" attention; scaling uses head_dim = W / 1 per the
    # reference's attention_layer(q, k, v, 1) call (generate_emap.py:288-306)
    scale = float(W) ** -0.5
    attn = jax.nn.softmax(
        jnp.einsum("bnd,bmd->bnm", q * scale, k,
                   preferred_element_type=jnp.float32), axis=-1)
    att_output = jnp.einsum("bnm,bmd->bnd", attn, v,
                            preferred_element_type=jnp.float32)
    outputs = _dense_tail(att_output, x_in, blk, vp)

    def out_proj(t):
        return t @ blk["attn"]["out_proj"]["kernel"] + \
            blk["attn"]["out_proj"]["bias"]

    q_out, k_out, v_out = out_proj(q), out_proj(k), out_proj(v)
    v_final = v_out + x_in
    v_final = v_final + _mlp(_ln(v_final, blk["ln_2"]), blk)
    v_final = _ln(v_final, vp["ln_post"]) @ vp["proj"]
    return DenseOutputs(outputs, v_final[:, 1:], x_in, v, q_out, k_out,
                        attn, att_output, (cfg.grid, cfg.grid))


def encode_dense(bundle, x) -> DenseOutputs:
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    return _encode_dense_jit(bundle.extras["model"], bundle.extras["cfg"],
                             bundle.params, x)


def _cosine(outputs, txt_emb):
    img = outputs[:, 0]
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    return (img @ txt_emb.T)[0]


def grad_eclip(bundle, x, txt_emb, withksim: bool = True,
               withgrad: bool = True) -> jnp.ndarray:
    """Grad-ECLIP (generate_emap.py:453-486): for each caption cosine c,
    relu(sum_D grad_c(att_output)[CLS] * v[patches] * minmax(cos(q_cls,
    k_patch)))); summed over captions.  Returns [P, P]."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    txt_emb = jnp.asarray(txt_emb)
    if txt_emb.ndim == 1:
        txt_emb = txt_emb[None]
    return _grad_eclip_jit(bundle.extras["model"], bundle.extras["cfg"],
                           withksim, withgrad, bundle.params, x, txt_emb)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _grad_eclip_jit(model, cfg, withksim, withgrad, params, x, txt_emb):
    d = _encode_dense_jit(model, cfg, params, x)
    blk = params["visual"][f"block{cfg.vision_layers - 1}"]
    vp = params["visual"]

    if withksim:
        q_cls = d.q_out[0, 0]
        k_patch = d.k_out[0, 1:]
        q_cls = q_cls / jnp.linalg.norm(q_cls)
        k_patch = k_patch / jnp.linalg.norm(k_patch, axis=-1, keepdims=True)
        cos_qk = k_patch @ q_cls
        cos_qk = (cos_qk - cos_qk.min()) / (cos_qk.max() - cos_qk.min())
    else:
        cos_qk = jnp.ones(d.v.shape[1] - 1)

    total = jnp.zeros(d.v.shape[1] - 1)
    for t in range(txt_emb.shape[0]):
        if withgrad:
            def c_of(att_out):
                outs = _dense_tail(att_out, d.x_in, blk, vp)
                return _cosine(outs, txt_emb)[t]
            grad = jax.grad(c_of)(d.att_output)
            grad_cls = grad[0, 0]
            emap = jax.nn.relu(
                (grad_cls * d.v[0, 1:] * cos_qk[:, None]).sum(-1))
        else:
            emap = jax.nn.relu((d.v[0, 1:] * cos_qk[:, None]).sum(-1))
        total = total + emap
    return total.reshape(cfg.grid, cfg.grid)


def mask_clip(bundle, x, txt_emb) -> jnp.ndarray:
    """MaskCLIP (generate_emap.py:500-530): cosine(v_final, text) modulated
    by k-cls/k-patch similarity; summed over captions.  Returns [P, P]."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    txt = jnp.asarray(txt_emb)
    if txt.ndim == 1:
        txt = txt[None]
    return _mask_clip_jit(bundle.extras["model"], bundle.extras["cfg"],
                          bundle.params, x, txt)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _mask_clip_jit(model, cfg, params, x, txt):
    d = _encode_dense_jit(model, cfg, params, x)
    vf = d.v_final / jnp.linalg.norm(d.v_final, axis=-1, keepdims=True)
    cos_v = (vf[0] @ txt.T).T                        # [T, N-1]
    k_cls = d.k_out[0, 0] / jnp.linalg.norm(d.k_out[0, 0])
    k_patch = d.k_out[0, 1:]
    k_patch = k_patch / jnp.linalg.norm(k_patch, axis=-1, keepdims=True)
    cos_k = k_patch @ k_cls
    sim = cos_v * cos_k[None]
    return sim.sum(0).reshape(cfg.grid, cfg.grid)


def self_attn(bundle, x) -> jnp.ndarray:
    """selfattn (evaluatePerturbation.py:423-424): the dense 1-head
    attention CLS row."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    return _self_attn_jit(bundle.extras["model"], bundle.extras["cfg"],
                          bundle.params, x)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _self_attn_jit(model, cfg, params, x):
    d = _encode_dense_jit(model, cfg, params, x)
    return d.attn[0, 0, 1:].reshape(cfg.grid, cfg.grid)


def clip_grad_cam(bundle, x, txt_emb) -> jnp.ndarray:
    """Grad-CAM on the last-block input features (generate_emap.py:488-499)."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    txt = jnp.asarray(txt_emb)
    if txt.ndim == 1:
        txt = txt[None]
    return _clip_grad_cam_jit(bundle.extras["model"], bundle.extras["cfg"],
                              bundle.params, x, txt)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _clip_grad_cam_jit(model, cfg, params, x, txt):
    d = _encode_dense_jit(model, cfg, params, x)
    blk = params["visual"][f"block{cfg.vision_layers - 1}"]
    vp = params["visual"]

    def c_of(x_in):
        h = _ln(x_in, blk["ln_1"])
        qkv = h @ blk["attn"]["in_proj"]["kernel"] + \
            blk["attn"]["in_proj"]["bias"]
        W = cfg.vision_width
        q, k, v = qkv[..., :W], qkv[..., W:2 * W], qkv[..., 2 * W:]
        scale = float(W) ** -0.5
        attn = jax.nn.softmax(
            jnp.einsum("bnd,bmd->bnm", q * scale, k), axis=-1)
        att_output = jnp.einsum("bnm,bmd->bnd", attn, v)
        outs = _dense_tail(att_output, x_in, blk, vp)
        return _cosine(outs, txt)[0]

    grad = jax.grad(c_of)(d.x_in)[0]                 # [N, W]
    w = grad.mean(0, keepdims=True)
    cam = jax.nn.relu((w * d.x_in[0, 1:]).sum(-1))
    return cam.reshape(cfg.grid, cfg.grid)


# ---------------------------------------------------------------------------
# probed full-model relevance (GAME / LRP / rollout)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1))
def _mm_grads(model, cfg, params, x, text):
    """logit_per_image[0,0] gradients w.r.t. visual+text attention probes,
    plus the attention taps (mm_interpret loss, generate_emap.py:134-144)."""
    vis = clipmod.zero_probes(cfg, "visual", x.shape[0])
    txt = clipmod.zero_probes(cfg, "text", text.shape[0],
                              seq=text.shape[1])

    def loss(pr):
        lpi, _, vtap, ttap = model.apply({"params": params}, x, text,
                                         vis_probes=pr[0], txt_probes=pr[1],
                                         taps=True)
        return jnp.trace(lpi), (vtap, ttap)

    (gv, gt), (vtap, ttap) = jax.grad(loss, has_aux=True)((vis, txt))
    return vtap, ttap, gv["attn"], gt["attn"]


def _relevance(attn, grads, start_layer: int):
    """R = I + sum over blocks >= start of (grad*attn).clamp(0).mean(heads)
    @ R (mm_interpret :154-170)."""
    L, B, H, N, _ = attn.shape
    R = jnp.eye(N, dtype=attn.dtype)[None]
    for i in range(L):
        if i < start_layer:
            continue
        cam = jnp.clip(grads[i] * attn[i], 0).mean(axis=1)
        R = R + jnp.einsum("bnm,bmk->bnk", cam, R)
    return R


def game(bundle, x, text_tokens, start_layer: int = -1) -> jnp.ndarray:
    """GAME (mm_interpret, default start_layer = last block).  Returns the
    [P, P] image relevance (summed over the caption batch)."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    text_tokens = jnp.asarray(text_tokens)
    if x.shape[0] == 1 and text_tokens.shape[0] > 1:
        # reference repeats the image per caption (mm_interpret :134-135) so
        # the diagonal one_hot gives each caption its own relevance slice
        x = jnp.repeat(x, text_tokens.shape[0], axis=0)
    cfg = bundle.extras["cfg"]
    sl = cfg.vision_layers - 1 if start_layer == -1 else start_layer
    return _game_jit(bundle.extras["model"], cfg, sl, bundle.params, x,
                     text_tokens)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _game_jit(model, cfg, start_layer, params, x, text_tokens):
    vtap, _, gv, _ = _mm_grads(model, cfg, params, x, text_tokens)
    R = _relevance(vtap["attn"], gv, start_layer)
    rel = R[:, 0, 1:]
    return rel.sum(0).reshape(cfg.grid, cfg.grid)


def clip_lrp(bundle, x, text_tokens, start_layer: int = 0,
             start_layer_text: int = 0):
    """clip_lrp (generate_emap.py:207-268): grad*attn relevance over ALL
    blocks of both towers.  Returns (text_relevance, image_relevance[P,P])."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    text_tokens = jnp.asarray(text_tokens)
    if x.shape[0] == 1 and text_tokens.shape[0] > 1:
        x = jnp.repeat(x, text_tokens.shape[0], axis=0)
    cfg = bundle.extras["cfg"]
    return _clip_lrp_jit(bundle.extras["model"], cfg, start_layer,
                         start_layer_text, bundle.params, x, text_tokens)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _clip_lrp_jit(model, cfg, start_layer, start_layer_text, params, x,
                  text_tokens):
    vtap, ttap, gv, gt = _mm_grads(model, cfg, params, x, text_tokens)
    R_img = _relevance(vtap["attn"], gv, start_layer)
    R_txt = _relevance(ttap["attn"], gt, start_layer_text)
    return R_txt, R_img[0, 0, 1:].reshape(cfg.grid, cfg.grid)


def clip_rollout(bundle, x, text_tokens) -> jnp.ndarray:
    """The driver's CLIP 'rollout' (evaluatePerturbation.py:418-422):
    mm_interpret(rollout=True) collects head-mean attentions only for
    blocks >= last, so this is the residual-normalized LAST-block attention
    rolled out (compute_rollout_attention on a single matrix)."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    _, taps = bundle.apply_taps(bundle.params, x)
    a = taps["attn"][-1].mean(axis=1)                # [B, N, N]
    n = a.shape[-1]
    aug = a + jnp.eye(n)
    aug = aug / aug.sum(-1, keepdims=True)
    p = bundle.extras["cfg"].grid
    return aug[0, 0, 1:].reshape(p, p)
