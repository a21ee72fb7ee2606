"""Flax PVT v1 (tiny/small/medium) — Pyramid Vision Transformer with
spatial-reduction attention, per-stage patch embedding + positional
embeddings, CLS token in the last stage.

Part of the image_finder model surface (pvt_{tiny,small,med} masks in
util/class_maps/ImageNet/).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ModelBundle, ModelMeta, jit_bundle


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, hw):
        """x: [B, N(,+1 cls), C]; hw: (H, W) of the patch grid."""
        B, N, C = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, name="q")(x)
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            H, W = hw
            extra = N - H * W          # cls token(s) excluded from reduction
            spatial = x[:, extra:].reshape(B, H, W, C)
            red = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                          strides=(self.sr_ratio, self.sr_ratio),
                          name="sr")(spatial)
            red = red.reshape(B, -1, C)
            red = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(red)
            kv_in = jnp.concatenate([x[:, :extra], red], axis=1) \
                if extra else red
        kv = nn.Dense(2 * self.dim, name="kv")(kv_in)
        M = kv.shape[1]
        kv = kv.reshape(B, M, 2, self.num_heads, hd)
        k, v = kv[:, :, 0].transpose(0, 2, 1, 3), \
            kv[:, :, 1].transpose(0, 2, 1, 3)
        pet = x.dtype     # see vit.Attention: compute-dtype attention
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=pet) * hd ** -0.5,
            axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=pet).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(self.dim, name="proj")(out)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, hw):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            name="attn")(h, hw)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + h


class PVT(nn.Module):
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    num_classes: int = 1000
    img_hw: int = 224

    @nn.compact
    def __call__(self, x, taps: bool = False):
        tap = {}
        B = x.shape[0]
        y = x
        n_stages = len(self.depths)
        grid = self.img_hw
        for s in range(n_stages):
            ps = self.patch_sizes[s]
            grid = grid // ps
            y = nn.Conv(self.dims[s], (ps, ps), strides=(ps, ps),
                        name=f"patch_embed{s}")(y)
            y = y.reshape(B, grid * grid, self.dims[s])
            y = nn.LayerNorm(epsilon=1e-6, name=f"embed_norm{s}")(y)
            n_tokens = grid * grid
            last = s == n_stages - 1
            if last:
                cls = self.param("cls_token", nn.initializers.zeros,
                                 (1, 1, self.dims[s]))
                y = jnp.concatenate(
                    [jnp.broadcast_to(cls, (B, 1, self.dims[s])), y], 1)
                n_tokens += 1
            pos = self.param(f"pos_embed{s}", nn.initializers.normal(0.02),
                             (1, n_tokens, self.dims[s]))
            y = y + pos
            for b in range(self.depths[s]):
                y = PVTBlock(self.dims[s], self.num_heads[s],
                             self.mlp_ratios[s], self.sr_ratios[s],
                             name=f"stage{s}_block{b}")(y, (grid, grid))
            if last:
                y_final = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
                tap["layer4"] = y
                logits = nn.Dense(self.num_classes,
                                  name="head")(y_final[:, 0])
            else:
                y = y.reshape(B, grid, grid, self.dims[s])
                tap[f"stage{s}"] = y
        if taps:
            return logits, tap
        return logits


ARCHS = {
    "pvt_tiny": dict(depths=(2, 2, 2, 2)),
    "pvt_small": dict(depths=(3, 4, 6, 3)),
    "pvt_medium": dict(depths=(3, 4, 18, 3)),
}


def pvt_from_hf(sd, depths) -> dict:
    """Convert a HuggingFace PvtForImageClassification state dict
    (the checkpoints the reference's image_finder loads:
    Xrenya/pvt-{tiny,small}-224, Zetatech/pvt-medium-224)."""
    import numpy as np

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
        "norm": ln("pvt.encoder.layer_norm"),
        "head": {"kernel": dense(sd["classifier.weight"]),
                 "bias": _np(sd["classifier.bias"])},
    }
    n = len(depths)
    for s in range(n):
        pe = f"pvt.encoder.patch_embeddings.{s}"
        params[f"patch_embed{s}"] = {
            "kernel": conv(sd[f"{pe}.projection.weight"]),
            "bias": _np(sd[f"{pe}.projection.bias"])}
        params[f"embed_norm{s}"] = ln(f"{pe}.layer_norm")
        pos = _np(sd[f"{pe}.position_embeddings"])
        params[f"pos_embed{s}"] = pos
        if s == n - 1:
            params["cls_token"] = _np(sd[f"{pe}.cls_token"])
        for b in range(depths[s]):
            t = f"pvt.encoder.block.{s}.{b}"
            q = dense(sd[f"{t}.attention.self.query.weight"])
            k = dense(sd[f"{t}.attention.self.key.weight"])
            v = dense(sd[f"{t}.attention.self.value.weight"])
            qb = _np(sd[f"{t}.attention.self.query.bias"])
            kb = _np(sd[f"{t}.attention.self.key.bias"])
            vb = _np(sd[f"{t}.attention.self.value.bias"])
            blk = {
                "norm1": ln(f"{t}.layer_norm_1"),
                "norm2": ln(f"{t}.layer_norm_2"),
                "attn": {
                    "q": {"kernel": q, "bias": qb},
                    "kv": {"kernel": np.concatenate([k, v], axis=1),
                           "bias": np.concatenate([kb, vb])},
                    "proj": {"kernel": dense(
                        sd[f"{t}.attention.output.dense.weight"]),
                        "bias": _np(sd[f"{t}.attention.output.dense.bias"])},
                },
                "mlp_fc1": {"kernel": dense(sd[f"{t}.mlp.dense1.weight"]),
                            "bias": _np(sd[f"{t}.mlp.dense1.bias"])},
                "mlp_fc2": {"kernel": dense(sd[f"{t}.mlp.dense2.weight"]),
                            "bias": _np(sd[f"{t}.mlp.dense2.bias"])},
            }
            if f"{t}.attention.self.sequence_reduction.weight" in sd:
                blk["attn"]["sr"] = {
                    "kernel": conv(
                        sd[f"{t}.attention.self.sequence_reduction.weight"]),
                    "bias": _np(
                        sd[f"{t}.attention.self.sequence_reduction.bias"])}
                blk["attn"]["sr_norm"] = ln(
                    f"{t}.attention.self.layer_norm")
            params[f"stage{s}_block{b}"] = blk
    return params


def make_bundle(arch: str = "pvt_tiny", params=None, key=None,
                batch_size: int = 25) -> ModelBundle:
    model = PVT(num_classes=1000, **ARCHS[arch])
    if params is None:
        from .common import init_on_cpu
        key = key if key is not None else jax.random.PRNGKey(0)
        params = init_on_cpu(
            lambda: model.init(key, jnp.zeros((1, 224, 224, 3)))["params"])
    meta = ModelMeta(name=arch, family="vit", batch_size=batch_size)

    def apply(p, x):
        return model.apply({"params": p}, x)

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True)

    return jit_bundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, extras={"model": model})
