"""Flax ResNet / ResNeXt (+ wide) family with an intermediate-tap API.

Capability parity with the reference's torchvision models
(``evaluatePerturbation.py:627-647``: R101, R152, RNXT = resnext101_64x4d)
and the "modified" non-inplace-ReLU fork (``util/modified_models/resnet.py``)
whose only purpose is GuidedBackprop hooking — unnecessary here: the guided
ReLU rule is a ``jax.custom_vjp`` (see methods/guided.py), so ONE model
serves both roles.

TPU-first choices:
- NHWC layout (XLA TPU's native conv layout; torchvision is NCHW).
- Inference-mode BatchNorm is algebraically folded into a per-channel
  scale+bias at weight-conversion time zero runtime BN cost, while keeping
  the raw (gamma, beta, mean, var) around for the sanity-check driver's
  weight randomization (evaluateSanity.py:108-120).
- taps: the four stage outputs; ``layer4`` feeds Grad-CAM
  (evaluatePerturbation.py:147-153).
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ModelBundle, ModelMeta, jit_bundle


class FoldedBN(nn.Module):
    """Inference BatchNorm as y = x * scale + bias.

    scale = gamma / sqrt(var + eps), bias = beta - mean * scale, computed by
    the converter (convert/torch_import.py). Stored unfolded params allow
    re-randomization for sanity checks.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class Bottleneck(nn.Module):
    """torchvision-style bottleneck block (resnet.py Bottleneck semantics:
    conv1x1-bn-relu, conv3x3(stride, groups)-bn-relu, conv1x1-bn, +skip, relu).
    """

    width: int
    out_features: int
    stride: int = 1
    groups: int = 1
    relu: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        y = FoldedBN(self.width, name="bn1")(y)
        y = self.relu(y)
        y = nn.Conv(
            self.width, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), feature_group_count=self.groups,
            use_bias=False, name="conv2",
        )(y)
        y = FoldedBN(self.width, name="bn2")(y)
        y = self.relu(y)
        y = nn.Conv(self.out_features, (1, 1), use_bias=False, name="conv3")(y)
        y = FoldedBN(self.out_features, name="bn3")(y)
        if residual.shape[-1] != self.out_features or self.stride != 1:
            residual = nn.Conv(
                self.out_features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = FoldedBN(self.out_features, name="downsample_bn")(residual)
        return self.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-(50|101|152) / ResNeXt with stage taps.

    call returns logits; ``taps=True`` additionally returns
    {"layer1".."layer4": stage activations NHWC, "pool": pooled features}.
    """

    layers: Sequence[int]
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    relu: Callable = nn.relu

    @nn.compact
    def __call__(self, x, taps: bool = False, probes=None):
        """``probes``: optional dict of zero tensors added to stage outputs
        (e.g. {"layer4": zeros}); grad w.r.t. a probe == grad w.r.t. that
        activation — the functional replacement for captum's LayerGradCam
        hook on ``model.layer4`` (evaluatePerturbation.py:147-153)."""
        tap = {}
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        y = FoldedBN(64, name="bn1")(y)
        y = self.relu(y)
        # torch MaxPool2d(3, stride=2, padding=1)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))

        in_planes = 64
        for stage_idx, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if stage_idx == 0 else 2
            width = int(planes * (self.width_per_group / 64.0)) * self.groups
            out_features = planes * 4
            for b in range(blocks):
                y = Bottleneck(
                    width=width,
                    out_features=out_features,
                    stride=stride if b == 0 else 1,
                    groups=self.groups,
                    relu=self.relu,
                    name=f"layer{stage_idx + 1}_{b}",
                )(y)
            in_planes = out_features
            if probes is not None and f"layer{stage_idx + 1}" in probes:
                y = y + probes[f"layer{stage_idx + 1}"]
            tap[f"layer{stage_idx + 1}"] = y

        y = jnp.mean(y, axis=(1, 2))
        tap["pool"] = y
        logits = nn.Dense(self.num_classes, name="fc")(y)
        if taps:
            return logits, tap
        return logits


ARCHS = {
    "resnet50": dict(layers=(3, 4, 6, 3)),
    "resnet101": dict(layers=(3, 4, 23, 3)),
    "resnet152": dict(layers=(3, 8, 36, 3)),
    "resnext50_32x4d": dict(layers=(3, 4, 6, 3), groups=32, width_per_group=4),
    "resnext101_32x8d": dict(layers=(3, 4, 23, 3), groups=32, width_per_group=8),
    "resnext101_64x4d": dict(layers=(3, 4, 23, 3), groups=64, width_per_group=4),
    "wide_resnet50_2": dict(layers=(3, 4, 6, 3), width_per_group=128),
    "wide_resnet101_2": dict(layers=(3, 4, 23, 3), width_per_group=128),
}

# registry names used by the reference CLI (evaluatePerturbation.py:627-647)
CLI_ARCH = {"R50": "resnet50", "R101": "resnet101", "R152": "resnet152",
            "RNXT": "resnext101_64x4d"}


def make_model(arch: str, num_classes: int = 1000) -> ResNet:
    return ResNet(num_classes=num_classes, **ARCHS[arch])


def init_params(arch: str, key=None, num_classes: int = 1000):
    model = make_model(arch, num_classes)
    key = key if key is not None else jax.random.PRNGKey(0)
    from .common import init_on_cpu
    return init_on_cpu(
        lambda: model.init(key, jnp.zeros((1, 224, 224, 3)))["params"])


def make_bundle(arch_or_cli: str, params=None, key=None,
                batch_size: int = 50) -> ModelBundle:
    arch = CLI_ARCH.get(arch_or_cli, arch_or_cli)
    model = make_model(arch)
    if params is None:
        params = init_params(arch, key)
    meta = ModelMeta(name=arch_or_cli, family="cnn", batch_size=batch_size)

    def apply(p, x):
        return model.apply({"params": p}, x)

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True)

    def apply_probed(p, x, probes):
        return model.apply({"params": p}, x, taps=True, probes=probes)

    return jit_bundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, apply_probed=apply_probed,
                       extras={"model": model})
