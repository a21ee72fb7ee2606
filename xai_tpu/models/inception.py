"""Flax Inception-v3 — torchvision eval math (299x299 input, BN eps 1e-3,
aux head unused in eval).  Completes the instrumented-classical-models
surface (util/modified_models/inception.py) and the image_finder IV3 row.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ModelBundle, ModelMeta, jit_bundle
from .resnet import FoldedBN


class BasicConv2d(nn.Module):
    out: int
    kernel: tuple
    stride: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out, self.kernel, strides=self.stride,
                    padding=self.padding, use_bias=False, name="conv")(x)
        y = FoldedBN(self.out, name="bn")(y)
        return nn.relu(y)


def _avgpool3(x):
    # torch AvgPool2d(3, stride=1, padding=1, count_include_pad=True)
    y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 3, 3, 1),
                                 (1, 1, 1, 1), "VALID") / 9.0


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2),
                         name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        p03 = ((0, 0), (3, 3))
        p30 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(self.c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(self.c7, (1, 7), padding=p03,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p30, name="branch7x7_3")(b7)
        bd = BasicConv2d(self.c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(self.c7, (7, 1), padding=p30,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(self.c7, (1, 7), padding=p03,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(self.c7, (7, 1), padding=p30,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p03,
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2),
                         name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, taps: bool = False):
        tap = {}
        y = BasicConv2d(32, (3, 3), stride=(2, 2), name="Conv2d_1a_3x3")(x)
        y = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(y)
        y = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)),
                        name="Conv2d_2b_3x3")(y)
        y = _maxpool3s2(y)
        y = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(y)
        y = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(y)
        y = _maxpool3s2(y)
        y = InceptionA(32, name="Mixed_5b")(y)
        y = InceptionA(64, name="Mixed_5c")(y)
        y = InceptionA(64, name="Mixed_5d")(y)
        y = InceptionB(name="Mixed_6a")(y)
        y = InceptionC(128, name="Mixed_6b")(y)
        y = InceptionC(160, name="Mixed_6c")(y)
        y = InceptionC(160, name="Mixed_6d")(y)
        y = InceptionC(192, name="Mixed_6e")(y)
        tap["mixed_6e"] = y
        y = InceptionD(name="Mixed_7a")(y)
        y = InceptionE(name="Mixed_7b")(y)
        y = InceptionE(name="Mixed_7c")(y)
        tap["layer4"] = y
        y = y.mean(axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="fc")(y)
        if taps:
            return logits, tap
        return logits


def make_bundle(params=None, key=None, batch_size: int = 25) -> ModelBundle:
    model = InceptionV3()
    if params is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        from .common import init_on_cpu
        params = init_on_cpu(
            lambda: model.init(key, jnp.zeros((1, 299, 299, 3)))["params"])
    meta = ModelMeta(name="IV3", family="cnn", img_hw=299,
                     batch_size=batch_size)

    def apply(p, x):
        return model.apply({"params": p}, x)

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True)

    return jit_bundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, extras={"model": model})


def inception_from_torch(sd) -> dict:
    """Convert a torchvision inception_v3 state dict (aux head skipped);
    BN folded with eps 1e-3."""
    import numpy as np

    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else \
            np.asarray(t)

    def fold(prefix):
        g = _np(sd[prefix + ".bn.weight"])
        b = _np(sd[prefix + ".bn.bias"])
        m = _np(sd[prefix + ".bn.running_mean"])
        v = _np(sd[prefix + ".bn.running_var"])
        scale = g / np.sqrt(v + 1e-3)
        return {"conv": {"kernel": _np(sd[prefix + ".conv.weight"]
                                       ).transpose(2, 3, 1, 0)},
                "bn": {"scale": scale, "bias": b - m * scale}}

    params = {}
    units = set()
    for k in sd:
        if k.endswith(".conv.weight") and not k.startswith("AuxLogits"):
            units.add(k[: -len(".conv.weight")])
    for u in sorted(units):
        parts = u.split(".")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = fold(u)
    params["fc"] = {"kernel": _np(sd["fc.weight"]).T,
                    "bias": _np(sd["fc.bias"])}
    return params
