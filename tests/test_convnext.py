"""ConvNeXt parity vs a torchvision-naming torch oracle."""
import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from xai_tpu.models.convnext import ConvNeXt, convnext_from_torch


class Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class TorchCNBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim),
            Permute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim),
            nn.GELU(),
            nn.Linear(4 * dim, dim),
            Permute([0, 3, 1, 2]),
        )
        self.layer_scale = nn.Parameter(torch.full((dim, 1, 1), 1e-6))

    def forward(self, x):
        return x + self.layer_scale * self.block(x)


class TorchConvNeXt(nn.Module):
    def __init__(self, depths=(1, 1), dims=(8, 16), num_classes=5):
        super().__init__()
        feats = [nn.Sequential(nn.Conv2d(3, dims[0], 4, 4),
                               _LN2d(dims[0]))]
        for s in range(len(depths)):
            if s > 0:
                feats.append(nn.Sequential(_LN2d(dims[s - 1]),
                                           nn.Conv2d(dims[s - 1], dims[s],
                                                     2, 2)))
            feats.append(nn.Sequential(
                *[TorchCNBlock(dims[s]) for _ in range(depths[s])]))
        self.features = nn.Sequential(*feats)
        self.classifier = nn.Sequential(
            _LN2d(dims[-1]), nn.Flatten(1), nn.Linear(dims[-1], num_classes))
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        return self.classifier(x)


class _LN2d(nn.LayerNorm):
    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


def test_convnext_parity():
    torch.manual_seed(0)
    depths, dims = (1, 1), (8, 16)
    tm = TorchConvNeXt(depths, dims, 5).eval()
    # give layer scales nontrivial values
    for m in tm.modules():
        if isinstance(m, TorchCNBlock):
            m.layer_scale.data.uniform_(0.5, 1.5)
    params = convnext_from_torch(tm.state_dict(), depths)
    jm = ConvNeXt(depths=depths, dims=dims, num_classes=5)

    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) < 2e-4, np.max(np.abs(got - ref))
