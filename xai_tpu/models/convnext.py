"""Flax ConvNeXt (tiny/small/base) — torchvision-compatible eval math.

Part of the image_finder model surface (the reference generates
correctly-classified masks for CONVNXT —
util/image_finder/findCorrectlyClassifiedImageNet.py).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ModelBundle, ModelMeta, jit_bundle


class CNBlock(nn.Module):
    dim: int
    layer_scale: float = 1e-6

    @nn.compact
    def __call__(self, x):
        # depthwise 7x7 -> LN -> pw 4x -> GELU -> pw -> layer scale, + skip
        h = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pw1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pw2")(h)
        gamma = self.param("gamma", nn.initializers.constant(
            self.layer_scale), (self.dim,))
        return x + gamma * h


class ConvNeXt(nn.Module):
    depths: Sequence[int]
    dims: Sequence[int]
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, taps: bool = False):
        tap = {}
        # stem: 4x4 s4 conv + LN
        y = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem_conv")(x)
        y = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(y)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if s > 0:
                y = nn.LayerNorm(epsilon=1e-6, name=f"down{s}_norm")(y)
                y = nn.Conv(dim, (2, 2), strides=(2, 2),
                            name=f"down{s}_conv")(y)
            for b in range(depth):
                y = CNBlock(dim, name=f"stage{s}_block{b}")(y)
            tap[f"stage{s}"] = y
        tap["layer4"] = y
        y = y.mean(axis=(1, 2))
        y = nn.LayerNorm(epsilon=1e-6, name="head_norm")(y)
        logits = nn.Dense(self.num_classes, name="head")(y)
        if taps:
            return logits, tap
        return logits


ARCHS = {
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "convnext_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    # the reference's CONVNXT is torchvision convnext_large
    # (findCorrectlyClassifiedImageNet.py:65)
    "convnext_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
}


def make_bundle(arch: str = "convnext_tiny", params=None, key=None,
                batch_size: int = 50) -> ModelBundle:
    model = ConvNeXt(num_classes=1000, **ARCHS[arch])
    if params is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        from .common import init_on_cpu
        params = init_on_cpu(
            lambda: model.init(key, jnp.zeros((1, 224, 224, 3)))["params"])
    meta = ModelMeta(name=arch, family="cnn", batch_size=batch_size)

    def apply(p, x):
        return model.apply({"params": p}, x)

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True)

    return jit_bundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, extras={"model": model})


def convnext_from_torch(sd, depths) -> dict:
    """Convert a torchvision ConvNeXt state dict (features.N layout):
    features.0 = stem (conv, LN); odd indices = downsample (LN, conv);
    even >0 = stages of CNBlocks (block.0 dwconv, block.2 LN, block.3
    Linear, block.5 Linear, layer_scale); classifier.0 LN, classifier.2
    Linear."""
    import numpy as np

    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else \
            np.asarray(t)

    def conv(w):
        return _np(w).transpose(2, 3, 1, 0)

    def dense(w):
        return _np(w).T

    params = {
        "stem_conv": {"kernel": conv(sd["features.0.0.weight"]),
                      "bias": _np(sd["features.0.0.bias"])},
        "stem_norm": {"scale": _np(sd["features.0.1.weight"]),
                      "bias": _np(sd["features.0.1.bias"])},
        "head_norm": {"scale": _np(sd["classifier.0.weight"]),
                      "bias": _np(sd["classifier.0.bias"])},
        "head": {"kernel": dense(sd["classifier.2.weight"]),
                 "bias": _np(sd["classifier.2.bias"])},
    }
    for s in range(len(depths)):
        feat_idx = 1 + 2 * s
        if s > 0:
            dn = f"features.{2 * s}"
            params[f"down{s}_norm"] = {"scale": _np(sd[f"{dn}.0.weight"]),
                                       "bias": _np(sd[f"{dn}.0.bias"])}
            params[f"down{s}_conv"] = {"kernel": conv(sd[f"{dn}.1.weight"]),
                                       "bias": _np(sd[f"{dn}.1.bias"])}
        for b in range(depths[s]):
            t = f"features.{feat_idx}.{b}.block"
            params[f"stage{s}_block{b}"] = {
                "dwconv": {"kernel": conv(sd[f"{t}.0.weight"]),
                           "bias": _np(sd[f"{t}.0.bias"])},
                "norm": {"scale": _np(sd[f"{t}.2.weight"]),
                         "bias": _np(sd[f"{t}.2.bias"])},
                "pw1": {"kernel": dense(sd[f"{t}.3.weight"]),
                        "bias": _np(sd[f"{t}.3.bias"])},
                "pw2": {"kernel": dense(sd[f"{t}.5.weight"]),
                        "bias": _np(sd[f"{t}.5.bias"])},
                # torchvision stores layer_scale as [dim, 1, 1] (NCHW)
                "gamma": _np(
                    sd[f"features.{feat_idx}.{b}.layer_scale"]).reshape(-1),
            }
    return params
