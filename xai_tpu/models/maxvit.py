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

from .common import ModelBundle, ModelMeta, jit_bundle
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
    scale: float | None = None   # None = head_dim**-0.5

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = min(self.window, H, W)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        wins = _grid_partition(h, ws) if self.grid else \
            _window_partition(h, ws)
        a = WindowAttention(self.dim, self.num_heads, ws, scale=self.scale,
                            name="attn")(wins)
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


class FoldedBN(nn.Module):
    """Inference BatchNorm as y = x * scale + bias (see models/resnet.py);
    the converter folds running stats with eps = 1e-3 (torchvision maxvit's
    norm_layer eps)."""
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class SqueezeExciteTV(nn.Module):
    """torchvision.ops.SqueezeExcitation(mid, sqz, activation=SiLU):
    explicit squeeze width (out_channels // 4 = mid // 16), unlike the
    paper-form SqueezeExcite above."""
    mid: int
    sqz: int

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))
        s = nn.silu(nn.Dense(self.sqz, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(self.mid, name="fc2")(s))
        return x * s[:, None, None, :]


class MBConvTV(nn.Module):
    """torchvision maxvit.MBConv (eval): BN pre-norm, conv_a 1x1 + BN +
    GELU, depthwise 3x3(stride) + BN + GELU, SE(SiLU), conv_c 1x1(bias);
    shortcut = AvgPool(3, 2, pad 1) + 1x1 conv(bias) when stride 2."""
    dim: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        inp = x
        mid = self.dim * self.expansion
        h = FoldedBN(x.shape[-1], name="pre_norm")(x)
        h = nn.Conv(mid, (1, 1), use_bias=False, name="conv_a")(h)
        h = nn.gelu(FoldedBN(mid, name="bn_a")(h), approximate=False)
        h = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=mid,
                    use_bias=False, name="conv_b")(h)
        h = nn.gelu(FoldedBN(mid, name="bn_b")(h), approximate=False)
        h = SqueezeExciteTV(mid, self.dim // 4, name="se")(h)
        h = nn.Conv(self.dim, (1, 1), name="conv_c")(h)
        if self.stride != 1 or inp.shape[-1] != self.dim:
            if self.stride == 2:
                # torch AvgPool2d(3, 2, padding=1, count_include_pad=True)
                inp = nn.avg_pool(jnp.pad(inp, ((0, 0), (1, 1), (1, 1),
                                                (0, 0))),
                                  (3, 3), strides=(2, 2))
            inp = nn.Conv(self.dim, (1, 1), name="shortcut")(inp)
        return inp + h


class MaxViTBlockTV(nn.Module):
    dim: int
    num_heads: int
    window: int
    stride: int

    @nn.compact
    def __call__(self, x):
        scale = self.dim ** -0.5  # torchvision feat_dim**-0.5 quirk
        x = MBConvTV(self.dim, self.stride, name="mbconv")(x)
        x = AttnLayer(self.dim, self.num_heads, self.window, grid=False,
                      scale=scale, name="window_attn")(x)
        x = AttnLayer(self.dim, self.num_heads, self.window, grid=True,
                      scale=scale, name="grid_attn")(x)
        return x


class MaxViTTV(nn.Module):
    """torchvision-faithful maxvit_t (torchvision/models/maxvit.py): the
    form behind the reference's correctly_classified_MAXVIT.txt class map.
    Differences from the paper-form MaxViT above: BN (not LN) in MBConv,
    stem Conv+BN+GELU / Conv(bias), SE squeeze = out//4, attention scaled
    by feat_dim**-0.5, and a bias-free final classifier Linear."""
    depths: Sequence[int] = (2, 2, 5, 2)
    dims: Sequence[int] = (64, 128, 256, 512)
    stem_dim: int = 64
    window: int = 7
    head_dim: int = 32
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, taps: bool = False):
        tap = {}
        y = nn.Conv(self.stem_dim, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name="stem_conv1")(x)
        y = nn.gelu(FoldedBN(self.stem_dim, name="stem_bn")(y),
                    approximate=False)
        y = nn.Conv(self.stem_dim, (3, 3), padding=((1, 1), (1, 1)),
                    name="stem_conv2")(y)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            for b in range(depth):
                heads = max(1, dim // self.head_dim)
                y = MaxViTBlockTV(dim, heads, self.window,
                                  stride=2 if b == 0 else 1,
                                  name=f"stage{s}_block{b}")(y)
            tap[f"stage{s}"] = y
        tap["layer4"] = y
        y = y.mean(axis=(1, 2))
        y = nn.LayerNorm(epsilon=1e-5, name="head_norm")(y)
        y = jnp.tanh(nn.Dense(self.dims[-1], name="head_pre")(y))
        logits = nn.Dense(self.num_classes, use_bias=False, name="head")(y)
        if taps:
            return logits, tap
        return logits


def make_bundle(params=None, key=None, batch_size: int = 25,
                variant: str = "tv") -> ModelBundle:
    """variant='tv' (default) is the torchvision-faithful form — the one
    whose pretrained weights produced correctly_classified_MAXVIT.txt;
    'paper' keeps the LN-MBConv paper form."""
    model = MaxViTTV() if variant == "tv" else MaxViT()
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

    return jit_bundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, extras={"model": model})
