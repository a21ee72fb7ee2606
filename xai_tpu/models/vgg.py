"""Flax VGG-(11|13|16|19) with taps.

Parity with torchvision VGG as used by the reference's image_finder
(``util/image_finder/findCorrectlyClassifiedImageNet.py``) and the
non-inplace-ReLU fork (``util/modified_models/vgg.py:44-84``) — the fork is
unnecessary here (guided ReLU is a custom VJP, methods/guided.py).
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ModelBundle, ModelMeta, jit_bundle

# torchvision cfgs: number = conv out-channels, "M" = maxpool
CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    cfg: Sequence
    num_classes: int = 1000
    hidden: int = 4096
    relu: Callable = nn.relu

    @nn.compact
    def __call__(self, x, taps: bool = False):
        tap = {}
        conv_idx = 0
        stage = 0
        for c in self.cfg:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                stage += 1
                tap[f"pool{stage}"] = x
            else:
                x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv{conv_idx}")(x)
                x = self.relu(x)
                conv_idx += 1
        tap["features"] = x
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)  # NCHW flatten, torch order
        x = self.relu(nn.Dense(self.hidden, name="fc0")(x))
        x = self.relu(nn.Dense(self.hidden, name="fc1")(x))
        logits = nn.Dense(self.num_classes, name="fc2")(x)
        if taps:
            return logits, tap
        return logits


def make_model(arch: str, num_classes: int = 1000) -> VGG:
    return VGG(CFGS[arch], num_classes)


def make_bundle(arch: str, params=None, key=None,
                batch_size: int = 50) -> ModelBundle:
    model = make_model(arch)
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
                       apply_taps=apply_taps)
