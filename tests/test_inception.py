"""Inception-v3: block-level torch-oracle parity + full-model smoke."""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from xai_tpu.models.inception import (InceptionA, InceptionV3,
                                      inception_from_torch)


class TorchBasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TorchInceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TorchBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TorchBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TorchBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TorchBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TorchBasicConv2d(64, 96, kernel_size=3,
                                               padding=1)
        self.branch3x3dbl_3 = TorchBasicConv2d(96, 96, kernel_size=3,
                                               padding=1)
        self.branch_pool = TorchBasicConv2d(cin, pool_features,
                                            kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(
            torch.nn.functional.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


def test_inception_a_block_parity():
    torch.manual_seed(0)
    tm = TorchInceptionA(16, 32).eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.3, 0.3)
    sd = {f"Mixed.{k}": v for k, v in tm.state_dict().items()}
    params = inception_from_torch(
        {**sd, "fc.weight": torch.zeros(2, 3), "fc.bias": torch.zeros(2)})
    block_params = params["Mixed"]

    jm = InceptionA(pool_features=32)
    x = np.random.RandomState(0).randn(2, 17, 17, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jm.apply({"params": block_params}, jnp.asarray(x)))
    got = got.transpose(0, 3, 1, 2)
    assert np.max(np.abs(got - ref)) < 2e-4, np.max(np.abs(got - ref))


def test_inception_v3_full_forward_smoke():
    model = InceptionV3(num_classes=10)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 299, 299, 3)))["params"]
    logits, taps = model.apply({"params": params},
                               jnp.zeros((1, 299, 299, 3)), taps=True)
    assert logits.shape == (1, 10)
    assert taps["layer4"].shape == (1, 8, 8, 2048)
    assert taps["mixed_6e"].shape == (1, 17, 17, 768)
