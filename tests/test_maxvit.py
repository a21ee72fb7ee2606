"""MaxViT: grid-partition algebra + full-model smoke."""
import numpy as np
import jax
import jax.numpy as jnp

from xai_tpu.models.maxvit import (MaxViT, MBConv, _grid_partition,
                                   _grid_reverse)


def test_grid_partition_roundtrip_and_dilation():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 8, 8, 3), jnp.float32)
    g = _grid_partition(x, 4)
    assert g.shape == (2 * 4, 16, 3)
    back = _grid_reverse(g, 4, 2, 8, 8)
    assert np.allclose(np.asarray(back), np.asarray(x))
    # grid windows sample STRIDED pixels: first window of the first batch
    # holds x[0, 0::2, 0::2] (stride H/gs = 2)
    want = np.asarray(x)[0, 0::2, 0::2].reshape(16, 3)
    assert np.allclose(np.asarray(g[0]), want)


def test_mbconv_stride_and_residual():
    m = MBConv(8, stride=2)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 4), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == (1, 4, 4, 8)


def test_maxvit_full_forward():
    model = MaxViT(depths=(1, 1), dims=(8, 16), stem_dim=8, window=4,
                   num_classes=5)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
    logits, taps = model.apply({"params": params},
                               jnp.zeros((2, 64, 64, 3)), taps=True)
    assert logits.shape == (2, 5)
    assert taps["stage0"].shape == (2, 16, 16, 8)
    assert taps["layer4"].shape == (2, 8, 8, 16)
