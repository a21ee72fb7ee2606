"""Flax MaxViT (tiny) — MBConv + block (window) attention + grid (dilated)
attention per stage, relative position biases, stem + pooled MLP head.

Completes the image_finder model surface (MAXVIT masks in
util/class_maps/ImageNet/).  Eval math follows the MaxViT paper /
torchvision structure; the window-attention core shares the oracle-tested
relative-bias formulation with models/swin.py.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ModelBundle, ModelMeta
from .swin import WindowAttention, _window_partition, _window_reverse


class SqueezeExcite(nn.Module):
    dim: int
    ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))
        hidden = max(1, int(self.dim * self.ratio))
        s = nn.silu(nn.Dense(hidden, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(self.dim, name="fc2")(s))
        return x * s[:, None, None, :]


class MBConv(nn.Module):
    dim: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        inp = x
        mid = self.dim * self.expansion
        h = nn.LayerNorm(epsilon=1e-5, name="pre_norm")(x)
        h = nn.Conv(mid, (1, 1), name="expand")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=mid,
                    name="dw")(h)
        h = nn.gelu(h, approximate=False)
        h = SqueezeExcite(mid, name="se")(h)
        h = nn.Conv(self.dim, (1, 1), name="proj")(h)
        if self.stride > 1 or inp.shape[-1] != self.dim:
            inp = nn.avg_pool(inp, (self.stride, self.stride),
                              strides=(self.stride, self.stride)) \
                if self.stride > 1 else inp
            inp = nn.Conv(self.dim, (1, 1), name="shortcut")(inp)
        return inp + h


def _grid_partition(x, gs):
    """Grid (dilated) partition: [B, H, W, C] -> [B*(H/gs)*(W/gs)? no:
    grid attention groups every gs-strided pixel: windows of size gs x gs
    sampled with stride H/gs."""
    B, H, W, C = x.shape
    x = x.reshape(B, gs, H // gs, gs, W // gs, C)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, gs * gs, C)


def _grid_reverse(wins, gs, B, H, W):
    C = wins.shape[-1]
    x = wins.reshape(B, H // gs, W // gs, gs, gs, C)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(B, H, W, C)


class AttnLayer(nn.Module):
    dim: int
    num_heads: int
    window: int
    grid: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = min(self.window, H, W)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        wins = _grid_partition(h, ws) if self.grid else \
            _window_partition(h, ws)
        a = WindowAttention(self.dim, self.num_heads, ws, name="attn")(wins)
        a = _grid_reverse(a, ws, B, H, W) if self.grid else \
            _window_reverse(a, ws, B, H, W)
        x = x + a
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(x)
        h = nn.Dense(4 * self.dim, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + h


class MaxViTBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = MBConv(self.dim, self.stride, name="mbconv")(x)
        x = AttnLayer(self.dim, self.num_heads, self.window, grid=False,
                      name="block_attn")(x)
        x = AttnLayer(self.dim, self.num_heads, self.window, grid=True,
                      name="grid_attn")(x)
        return x


class MaxViT(nn.Module):
    depths: Sequence[int] = (2, 2, 5, 2)
    dims: Sequence[int] = (64, 128, 256, 512)
    stem_dim: int = 64
    window: int = 7
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, taps: bool = False):
        tap = {}
        y = nn.Conv(self.stem_dim, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name="stem1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.stem_dim, (3, 3), padding=((1, 1), (1, 1)),
                    name="stem2")(y)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            for b in range(depth):
                heads = max(1, dim // 32)
                y = MaxViTBlock(dim, heads, self.window,
                                stride=2 if b == 0 else 1,
                                name=f"stage{s}_block{b}")(y)
            tap[f"stage{s}"] = y
        tap["layer4"] = y
        y = y.mean(axis=(1, 2))
        y = nn.LayerNorm(epsilon=1e-5, name="head_norm")(y)
        y = jnp.tanh(nn.Dense(self.dims[-1], name="head_pre")(y))
        logits = nn.Dense(self.num_classes, name="head")(y)
        if taps:
            return logits, tap
        return logits


def make_bundle(params=None, key=None, batch_size: int = 25) -> ModelBundle:
    model = MaxViT()
    if params is None:
        from .common import init_on_cpu
        key = key if key is not None else jax.random.PRNGKey(0)
        params = init_on_cpu(
            lambda: model.init(key, jnp.zeros((1, 224, 224, 3)))["params"])
    meta = ModelMeta(name="MAXVIT", family="cnn", batch_size=batch_size)

    def apply(p, x):
        return model.apply({"params": p}, x)

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True)

    return ModelBundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, extras={"model": model})
