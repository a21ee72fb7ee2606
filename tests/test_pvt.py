"""PVT smoke + SR-attention reduction behavior."""
import numpy as np
import jax
import jax.numpy as jnp

from xai_tpu.models.pvt import PVT, SRAttention


def test_sr_attention_shapes_and_reduction():
    att = SRAttention(dim=16, num_heads=2, sr_ratio=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16), jnp.float32)
    params = att.init(jax.random.PRNGKey(0), x, (4, 4))["params"]
    out = att.apply({"params": params}, x, (4, 4))
    assert out.shape == (2, 16, 16)
    # the reduction conv sees the 4x4 grid -> kv length 4 (+0 cls)
    assert params["sr"]["kernel"].shape == (2, 2, 16, 16)


def test_sr_attention_with_cls_token():
    att = SRAttention(dim=16, num_heads=2, sr_ratio=2)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 17, 16), jnp.float32)
    params = att.init(jax.random.PRNGKey(0), x, (4, 4))["params"]
    out = att.apply({"params": params}, x, (4, 4))
    assert out.shape == (1, 17, 16)


def test_pvt_full_forward():
    model = PVT(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                num_heads=(1, 2, 4, 8), mlp_ratios=(2, 2, 2, 2),
                sr_ratios=(4, 2, 2, 1), num_classes=6, img_hw=64)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
    logits, taps = model.apply({"params": params},
                               jnp.zeros((2, 64, 64, 3)), taps=True)
    assert logits.shape == (2, 6)
    assert taps["stage0"].shape == (2, 16, 16, 8)
    assert taps["layer4"].shape[1] == 2 * 2 + 1   # 2x2 grid + cls
