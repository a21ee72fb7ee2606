"""Model + converter parity vs torch oracles (random weights, eval mode)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from xai_tpu.convert import resnet_from_torch, vgg_from_torch, vit_from_torch
from xai_tpu.models import resnet as jresnet
from xai_tpu.models import vgg as jvgg
from xai_tpu.models import vit as jvit
from xai_tpu.models.vit import ViTConfig, VisionTransformer

from torch_oracles import TorchResNet, TorchViT, TorchVGG


def _rand_bn_stats(model):
    """Give BN layers nontrivial running stats so folding is exercised."""
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)


@pytest.mark.parametrize("groups,width", [(1, 64), (2, 32)])
def test_resnet_parity(groups, width):
    torch.manual_seed(0)
    layers = (1, 1, 1, 1)
    tm = TorchResNet(layers, num_classes=17, groups=groups,
                     width_per_group=width).eval()
    _rand_bn_stats(tm)

    params = resnet_from_torch(tm.state_dict(), layers)
    jm = jresnet.ResNet(layers=layers, num_classes=17, groups=groups,
                        width_per_group=width)

    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) < 2e-4, np.max(np.abs(got - ref))


def test_resnet_taps():
    layers = (1, 1, 1, 1)
    tm = TorchResNet(layers, num_classes=5).eval()
    params = resnet_from_torch(tm.state_dict(), layers)
    jm = jresnet.ResNet(layers=layers, num_classes=5)
    x = jnp.zeros((1, 64, 64, 3))
    logits, taps = jm.apply({"params": params}, x, taps=True)
    assert set(taps) == {"layer1", "layer2", "layer3", "layer4", "pool"}
    assert taps["layer4"].shape[-1] == 2048


def test_vit_parity():
    torch.manual_seed(0)
    tm = TorchViT(patch=8, dim=64, depth=2, heads=4, img=32,
                  num_classes=11).eval()
    params = vit_from_torch(tm.state_dict(), depth=2)
    cfg = ViTConfig(patch=8, embed_dim=64, depth=2, num_heads=4,
                    num_classes=11, img_hw=32)
    jm = VisionTransformer(cfg)

    x = np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) < 2e-4, np.max(np.abs(got - ref))


def test_vit_taps_and_probes():
    import jax
    cfg = ViTConfig(patch=8, embed_dim=64, depth=2, num_heads=4,
                    num_classes=11, img_hw=32)
    jm = VisionTransformer(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                    dtype=jnp.float32)
    params = jm.init(jax.random.PRNGKey(0), x)["params"]
    logits, taps = jm.apply({"params": params}, x, taps=True)
    assert taps["attn"].shape == (2, 1, 4, 17, 17)
    assert taps["block_out"].shape == (2, 1, 17, 64)

    # probe gradients == attention-map gradients
    probes = jvit.zero_probes(cfg, batch=1)

    def f(pr):
        lg, _ = jm.apply({"params": params}, x, probes=pr, taps=True)
        return lg[0, 3]

    g = jax.grad(f)(probes)
    assert g["attn"].shape == probes["attn"].shape
    assert float(jnp.abs(g["attn"]).sum()) > 0

    # probs from block taps: last block must equal the model's own softmax
    bp = jvit.block_probs(params, taps["block_out"])
    ref = jax.nn.softmax(logits, axis=-1)
    assert np.allclose(np.asarray(bp[-1]), np.asarray(ref), atol=1e-5)


def test_vgg_parity():
    torch.manual_seed(0)
    tm = TorchVGG(cfg=(8, "M", 16, "M"), num_classes=9, img=32).eval()
    params = vgg_from_torch(tm.state_dict())
    jm = jvgg.VGG(cfg=(8, "M", 16, "M"), num_classes=9, hidden=32)

    x = np.random.RandomState(3).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) < 2e-4, np.max(np.abs(got - ref))
