"""Flax Swin Transformer (tiny/small/base) — torchvision-compatible eval
math: 4x4 patch embed, windowed W-MSA / shifted SW-MSA with relative
position bias, patch merging, LN + mean-pool head.

Part of the image_finder model surface (swin_{tiny,small,base} masks in
util/class_maps/ImageNet/).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import ModelBundle, ModelMeta, jit_bundle


def _rel_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]               # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                      # [N, N]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    # attention scale; None = head_dim ** -0.5 (swin).  torchvision MaxViT
    # scales by feat_dim ** -0.5 instead (maxvit.py
    # RelativePositionalMultiHeadAttention.scale_factor) — pass it here.
    scale: float | None = None

    @nn.compact
    def __call__(self, x, mask=None):
        """x: [nW, N, C] windows; mask: [nW_types, N, N] or None."""
        nW, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = qkv.reshape(nW, N, 3, self.num_heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        scale = hd ** -0.5 if self.scale is None else self.scale
        pet = x.dtype     # see vit.Attention: compute-dtype attention
        attn = jnp.einsum("whnd,whmd->whnm", q, k,
                          preferred_element_type=pet) * scale

        table = self.param("rel_bias_table", nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_rel_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(N, N, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nm = mask.shape[0]
            attn = attn.reshape(nW // nm, nm, self.num_heads, N, N)
            attn = attn + mask.astype(attn.dtype)[None, :, None]
            attn = attn.reshape(nW, self.num_heads, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("whnm,whmd->whnd", attn, v,
                         preferred_element_type=pet).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(nW, N, C)
        return nn.Dense(self.dim, name="proj")(out)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _window_reverse(wins, ws, B, H, W):
    C = wins.shape[-1]
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _shift_mask(H, W, ws, shift) -> np.ndarray:
    """Attention mask distinguishing the shifted-window regions
    (torchvision SwinTransformerBlock attn_mask)."""
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wss] = cnt
            cnt += 1
    wins = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, ws * ws)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C]."""
        B, H, W, C = x.shape
        ws = min(self.window, H, W)
        shift = 0 if ws >= min(H, W) and self.shift else self.shift
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if shift:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
        wins = _window_partition(h, ws)
        mask = jnp.asarray(_shift_mask(H, W, ws, shift)) if shift else None
        a = WindowAttention(self.dim, self.num_heads, ws, name="attn")(
            wins, mask)
        a = _window_reverse(a, ws, B, H, W)
        if shift:
            a = jnp.roll(a, (shift, shift), axis=(1, 2))
        x = x + a
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(4 * self.dim, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    dim: int  # input dim

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(y)


class SwinTransformer(nn.Module):
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    embed_dim: int = 96
    window: int = 7
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, taps: bool = False):
        tap = {}
        y = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    name="patch_embed")(x)
        y = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(y)
        dim = self.embed_dim
        for s, (depth, heads) in enumerate(zip(self.depths,
                                               self.num_heads)):
            if s > 0:
                y = PatchMerging(dim, name=f"merge{s}")(y)
                dim *= 2
            for b in range(depth):
                y = SwinBlock(dim, heads, self.window,
                              shift=0 if b % 2 == 0 else self.window // 2,
                              name=f"stage{s}_block{b}")(y)
            tap[f"stage{s}"] = y
        tap["layer4"] = y
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        y = y.mean(axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="head")(y)
        if taps:
            return logits, tap
        return logits


ARCHS = {
    "swin_tiny": dict(depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                      embed_dim=96),
    "swin_small": dict(depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
                       embed_dim=96),
    "swin_base": dict(depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                      embed_dim=128),
}


def swin_from_torch(sd, depths) -> dict:
    """Convert a torchvision Swin state dict (features.N layout):
    features.0 = stem (Conv2d at .0, LN at .2); odd indices = stages of
    SwinTransformerBlocks (norm1/attn.qkv/attn.proj/
    attn.relative_position_bias_table/norm2/mlp.{0,3}); even >0 =
    PatchMerging (reduction Linear, norm LN); final norm + head."""

    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else \
            np.asarray(t)

    def conv(w):
        return _np(w).transpose(2, 3, 1, 0)

    def dense(w):
        return _np(w).T

    def ln(prefix):
        return {"scale": _np(sd[prefix + ".weight"]),
                "bias": _np(sd[prefix + ".bias"])}

    params = {
        "patch_embed": {"kernel": conv(sd["features.0.0.weight"]),
                        "bias": _np(sd["features.0.0.bias"])},
        "patch_norm": ln("features.0.2"),
        "norm": ln("norm"),
        "head": {"kernel": dense(sd["head.weight"]),
                 "bias": _np(sd["head.bias"])},
    }
    for s in range(len(depths)):
        if s > 0:
            t = f"features.{2 * s}"
            params[f"merge{s}"] = {
                "norm": ln(f"{t}.norm"),
                "reduction": {"kernel": dense(sd[f"{t}.reduction.weight"])},
            }
        for b in range(depths[s]):
            t = f"features.{2 * s + 1}.{b}"
            params[f"stage{s}_block{b}"] = {
                "norm1": ln(f"{t}.norm1"),
                "norm2": ln(f"{t}.norm2"),
                "attn": {
                    "qkv": {"kernel": dense(sd[f"{t}.attn.qkv.weight"]),
                            "bias": _np(sd[f"{t}.attn.qkv.bias"])},
                    "proj": {"kernel": dense(sd[f"{t}.attn.proj.weight"]),
                             "bias": _np(sd[f"{t}.attn.proj.bias"])},
                    "rel_bias_table": _np(
                        sd[f"{t}.attn.relative_position_bias_table"]),
                },
                "mlp_fc1": {"kernel": dense(sd[f"{t}.mlp.0.weight"]),
                            "bias": _np(sd[f"{t}.mlp.0.bias"])},
                "mlp_fc2": {"kernel": dense(sd[f"{t}.mlp.3.weight"]),
                            "bias": _np(sd[f"{t}.mlp.3.bias"])},
            }
    return params


def swin_from_hf(sd, depths) -> dict:
    """Convert a HuggingFace SwinForImageClassification state dict (the
    checkpoints the reference's image_finder loads:
    microsoft/swin-{tiny,small,base}-patch4-window7-224).  HF keeps q/k/v
    separate and hangs each stage's downsample off the PREVIOUS layer."""

    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else \
            np.asarray(t)

    def conv(w):
        return _np(w).transpose(2, 3, 1, 0)

    def dense(w):
        return _np(w).T

    def ln(prefix):
        return {"scale": _np(sd[prefix + ".weight"]),
                "bias": _np(sd[prefix + ".bias"])}

    params = {
        "patch_embed": {
            "kernel": conv(sd["swin.embeddings.patch_embeddings."
                              "projection.weight"]),
            "bias": _np(sd["swin.embeddings.patch_embeddings."
                           "projection.bias"])},
        "patch_norm": ln("swin.embeddings.norm"),
        "norm": ln("swin.layernorm"),
        "head": {"kernel": dense(sd["classifier.weight"]),
                 "bias": _np(sd["classifier.bias"])},
    }
    for s in range(len(depths)):
        if s > 0:
            t = f"swin.encoder.layers.{s - 1}.downsample"
            params[f"merge{s}"] = {
                "norm": ln(f"{t}.norm"),
                "reduction": {"kernel": dense(sd[f"{t}.reduction.weight"])},
            }
        for b in range(depths[s]):
            t = f"swin.encoder.layers.{s}.blocks.{b}"
            q = dense(sd[f"{t}.attention.self.query.weight"])
            k = dense(sd[f"{t}.attention.self.key.weight"])
            v = dense(sd[f"{t}.attention.self.value.weight"])
            qb = _np(sd[f"{t}.attention.self.query.bias"])
            kb = _np(sd[f"{t}.attention.self.key.bias"])
            vb = _np(sd[f"{t}.attention.self.value.bias"])
            params[f"stage{s}_block{b}"] = {
                "norm1": ln(f"{t}.layernorm_before"),
                "norm2": ln(f"{t}.layernorm_after"),
                "attn": {
                    "qkv": {"kernel": np.concatenate([q, k, v], axis=1),
                            "bias": np.concatenate([qb, kb, vb])},
                    "proj": {"kernel": dense(
                        sd[f"{t}.attention.output.dense.weight"]),
                        "bias": _np(
                            sd[f"{t}.attention.output.dense.bias"])},
                    "rel_bias_table": _np(
                        sd[f"{t}.attention.self."
                           "relative_position_bias_table"]),
                },
                "mlp_fc1": {"kernel": dense(
                    sd[f"{t}.intermediate.dense.weight"]),
                    "bias": _np(sd[f"{t}.intermediate.dense.bias"])},
                "mlp_fc2": {"kernel": dense(sd[f"{t}.output.dense.weight"]),
                            "bias": _np(sd[f"{t}.output.dense.bias"])},
            }
    return params


def make_bundle(arch: str = "swin_tiny", params=None, key=None,
                batch_size: int = 25) -> ModelBundle:
    model = SwinTransformer(num_classes=1000, **ARCHS[arch])
    if params is None:
        from .common import init_on_cpu
        key = key if key is not None else jax.random.PRNGKey(0)
        params = init_on_cpu(
            lambda: model.init(key, jnp.zeros((1, 224, 224, 3)))["params"])
    meta = ModelMeta(name=arch, family="cnn", batch_size=batch_size)

    def apply(p, x):
        return model.apply({"params": p}, x)

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True)

    return jit_bundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, extras={"model": model})
