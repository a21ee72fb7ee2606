"""Swin: window-attention torch-oracle parity + full-model smoke."""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from xai_tpu.models.swin import (SwinBlock, SwinTransformer,
                                 WindowAttention, _rel_position_index,
                                 _shift_mask, _window_partition,
                                 _window_reverse)


def test_rel_position_index_properties():
    idx = _rel_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 7 * 7
    # symmetric pairs map to mirrored offsets, diagonal constant
    assert len(set(idx[np.arange(16), np.arange(16)])) == 1


def test_window_partition_roundtrip():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 8, 8, 5), jnp.float32)
    w = _window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 5)
    back = _window_reverse(w, 4, 2, 8, 8)
    assert np.allclose(np.asarray(back), np.asarray(x))


def test_window_attention_matches_torch():
    """Oracle: torch MHA restricted to one window with relative bias."""
    torch.manual_seed(0)
    dim, heads, ws = 8, 2, 3
    N = ws * ws
    att = WindowAttention(dim, heads, ws)
    x = jnp.asarray(np.random.RandomState(1).randn(2, N, dim), jnp.float32)
    params = att.init(jax.random.PRNGKey(0), x)["params"]

    qkv_w = np.asarray(params["qkv"]["kernel"])       # [dim, 3dim]
    qkv_b = np.asarray(params["qkv"]["bias"])
    proj_w = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])
    table = np.asarray(params["rel_bias_table"])

    xt = torch.tensor(np.asarray(x))
    qkv = xt @ torch.tensor(qkv_w) + torch.tensor(qkv_b)
    q, k, v = qkv.split(dim, -1)

    def split_heads(t):
        return t.reshape(2, N, heads, dim // heads).permute(0, 2, 1, 3)

    q, k, v = map(split_heads, (q, k, v))
    attn = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
    idx = _rel_position_index(ws)
    bias = torch.tensor(table)[torch.tensor(idx.reshape(-1))]
    bias = bias.reshape(N, N, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias[None], -1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(2, N, dim)
    want = (out @ torch.tensor(proj_w) + torch.tensor(proj_b)).numpy()

    got = np.asarray(att.apply({"params": params}, x))
    assert np.max(np.abs(got - want)) < 1e-5


def test_swin_full_forward_smoke():
    model = SwinTransformer(depths=(1, 1), num_heads=(2, 4), embed_dim=16,
                            window=4, num_classes=7)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
    logits, taps = model.apply({"params": params},
                               jnp.zeros((2, 64, 64, 3)), taps=True)
    assert logits.shape == (2, 7)
    assert taps["stage0"].shape == (2, 16, 16, 16)
    assert taps["layer4"].shape == (2, 8, 8, 32)


def test_shifted_block_changes_output():
    """The SW-MSA mask must make the shifted block differ from plain W-MSA
    on non-uniform input."""
    model0 = SwinBlock(8, 2, 4, shift=0)
    model2 = SwinBlock(8, 2, 4, shift=2)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 8), jnp.float32)
    p = model0.init(jax.random.PRNGKey(0), x)["params"]
    y0 = model0.apply({"params": p}, x)
    y2 = model2.apply({"params": p}, x)
    assert not np.allclose(np.asarray(y0), np.asarray(y2))
    m = _shift_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) == {-100.0, 0.0}
