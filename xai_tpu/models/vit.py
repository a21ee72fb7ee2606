"""Flax timm-style Vision Transformer with a tap + probe API.

Replaces the reference's hook-instrumented fork
(``util/attribution_methods/VIT_LRP/ViT_new_timm.py:193-312``): instead of
mutable ``save_*``/``get_*`` slots and ``register_hook`` attention-gradient
hooks, the forward optionally

- returns a ``taps`` pytree of stacked per-block intermediates
  (attention maps, block inputs/outputs, input+attn, mlp values, patch
  embedding) — everything the explainers in methods/vit_explain.py consume;
- accepts additive zero-valued ``probes`` on the post-softmax attention of
  every block and on the patch embedding, so that
  ``jax.grad(..., wrt=probes)`` yields exactly the attention / embedding
  gradients the reference captures with hooks (ViT_new_timm.py:236-243,
  464-466).  Pure, jit-safe, and works under vmap.

Per-block classification probabilities (ViT_new_timm.py:483-495) are
computed from taps by :func:`block_probs` — the final norm+head applied to
every block output's CLS token.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ModelBundle, ModelMeta, jit_bundle


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    img_hw: int = 224

    @property
    def tokens(self) -> int:
        return (self.img_hw // self.patch) ** 2 + 1

    @property
    def grid(self) -> int:
        return self.img_hw // self.patch


CONFIGS = {
    "vit_tiny_patch16_224": ViTConfig(16, 192, 12, 3),
    "vit_small_patch16_224": ViTConfig(16, 384, 12, 6),
    "vit_small_patch32_224": ViTConfig(32, 384, 12, 6),
    "vit_base_patch8_224": ViTConfig(8, 768, 12, 12),
    "vit_base_patch16_224": ViTConfig(16, 768, 12, 12),
    "vit_base_patch32_224": ViTConfig(32, 768, 12, 12),
    "vit_large_patch16_224": ViTConfig(16, 1024, 24, 16),
    "vit_large_patch32_224": ViTConfig(32, 1024, 24, 16),
}
CLI_ARCH = {"VIT16": "vit_base_patch16_224", "VIT32": "vit_base_patch32_224",
            "VIT8": "vit_base_patch8_224"}


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, probe=None):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        # The attention score tensor [B, H, N, N] is the HBM hot spot of
        # the whole tower (2.4 GB/fwd at batch 128 in f32).  Accumulate and
        # store in the COMPUTE dtype: f32 mode keeps exact f32
        # logits+softmax (reference parity), the opt-in bf16 fast path
        # stays bf16 end-to-end — the old f32 preferred_element_type pin
        # silently promoted everything downstream of block 0, making
        # dtype=bf16 a no-op (bf16 quality is gated by the rank-stability
        # contracts in tests/test_batch_attr.py).
        pet = x.dtype
        attn_logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=pet) * scale
        attn = jax.nn.softmax(attn_logits, axis=-1).astype(x.dtype)
        if probe is not None:
            # additive zero probe: grad w.r.t. probe == grad w.r.t. attn map
            attn = attn + probe.astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=pet).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(self.dim, name="proj")(out)
        tap = {"attn": attn, "attn_logits": attn_logits, "v": v,
               "attn_out": out}
        return out, tap


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x, probe=None):
        attn_in = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        a, atap = Attention(self.dim, self.num_heads, name="attn")(attn_in, probe)
        x_plus_attn = x + a
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x_plus_attn)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        mlp_val = nn.Dense(self.dim, name="mlp_fc2")(h)
        out = x_plus_attn + mlp_val
        tap = dict(atap)
        tap.update({"block_in": x, "norm1_out": attn_in,
                    "input_plus_attn": x_plus_attn,
                    "mlp_val": mlp_val, "block_out": out})
        return out, tap


class VisionTransformer(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, probes: Optional[dict] = None, taps: bool = False,
                 token_indices: Optional[jnp.ndarray] = None):
        """``token_indices``: optional [K] patch-token indices (0-based,
        excluding CLS) to KEEP after the positional embedding — the
        functional form of TIS's token-dropping pos_drop forward hook
        (TIS.py:262-298).  CLS is always kept."""
        cfg = self.cfg
        B = x.shape[0]
        y = nn.Conv(cfg.embed_dim, (cfg.patch, cfg.patch),
                    strides=(cfg.patch, cfg.patch), name="patch_embed")(x)
        y = y.reshape(B, -1, cfg.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.embed_dim))
        y = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.embed_dim)), y],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.tokens, cfg.embed_dim))
        y = y + pos
        if probes is not None and "embed" in probes:
            y = y + probes["embed"]
        patch_embedding = y
        if token_indices is not None:
            y = jnp.concatenate([y[:, :1], y[:, 1:][:, token_indices]],
                                axis=1)

        tap_list = []
        for i in range(cfg.depth):
            probe = None
            if probes is not None and "attn" in probes:
                probe = probes["attn"][i]
            y, tap = Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                           name=f"block{i}")(y, probe)
            tap_list.append(tap)

        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        logits = nn.Dense(cfg.num_classes, name="head")(y[:, 0])
        if taps:
            stacked = {k: jnp.stack([t[k] for t in tap_list])
                       for k in tap_list[0]}
            stacked["patch_embedding"] = patch_embedding
            return logits, stacked
        return logits


def zero_probes(cfg: ViTConfig, batch: int = 1) -> dict:
    return {
        "attn": jnp.zeros((cfg.depth, batch, cfg.num_heads, cfg.tokens,
                           cfg.tokens)),
        "embed": jnp.zeros((batch, cfg.tokens, cfg.embed_dim)),
    }


def block_probs(params, block_outs, softmax: bool = True):
    """Final norm+head applied to every block output's CLS token — the
    reference's per-block 'classification probs' (ViT_new_timm.py:483-495).

    block_outs: [L, B, N, D] stacked tap. Returns [L, B, num_classes].
    """
    ln = params["norm"]
    mu = block_outs.mean(-1, keepdims=True)
    var = ((block_outs - mu) ** 2).mean(-1, keepdims=True)
    y = (block_outs - mu) * jax.lax.rsqrt(var + 1e-6)
    y = y * ln["scale"] + ln["bias"]
    logits = jnp.einsum("lbd,dk->lbk", y[:, :, 0], params["head"]["kernel"],
                        preferred_element_type=jnp.float32)
    logits = logits + params["head"]["bias"]
    return jax.nn.softmax(logits, axis=-1) if softmax else logits


def make_model(arch: str, num_classes: int = 1000) -> VisionTransformer:
    cfg = CONFIGS[arch]
    if num_classes != cfg.num_classes:
        cfg = dataclasses.replace(cfg, num_classes=num_classes)
    return VisionTransformer(cfg)


def make_bundle(arch_or_cli: str, params=None, key=None,
                batch_size: int = 25) -> ModelBundle:
    arch = CLI_ARCH.get(arch_or_cli, arch_or_cli)
    model = make_model(arch)
    cfg = model.cfg
    if params is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        from .common import init_on_cpu
        params = init_on_cpu(lambda: model.init(
            key, jnp.zeros((1, cfg.img_hw, cfg.img_hw, 3)))["params"])
    meta = ModelMeta(name=arch_or_cli, family="vit", img_hw=cfg.img_hw,
                     num_patches=cfg.grid, batch_size=batch_size,
                     mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))

    def apply(p, x):
        return model.apply({"params": p}, x)

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True)

    def apply_probed(p, x, probes):
        return model.apply({"params": p}, x, probes=probes, taps=True)

    def apply_tokens(p, x, token_indices):
        return model.apply({"params": p}, x, token_indices=token_indices)

    return jit_bundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, apply_probed=apply_probed,
                       apply_tokens=apply_tokens, extras=cfg)
