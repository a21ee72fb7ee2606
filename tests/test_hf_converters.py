"""Converter parity against the ACTUAL HuggingFace implementations the
reference's image_finder loads (random-init small configs; no downloads)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")


def test_swin_hf_parity():
    from transformers import SwinConfig, SwinForImageClassification
    from xai_tpu.models.swin import SwinTransformer, swin_from_hf

    torch.manual_seed(0)
    cfg = SwinConfig(image_size=32, patch_size=4, embed_dim=8,
                     depths=[1, 2], num_heads=[2, 4], window_size=4,
                     num_labels=5, drop_path_rate=0.0,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    tm = SwinForImageClassification(cfg).eval()
    params = swin_from_hf(tm.state_dict(), depths=[1, 2])
    jm = SwinTransformer(depths=(1, 2), num_heads=(2, 4), embed_dim=8,
                         window=4, num_classes=5)
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) < 3e-4, np.max(np.abs(got - ref))


def test_pvt_hf_parity():
    from transformers import PvtConfig, PvtForImageClassification
    from xai_tpu.models.pvt import PVT, pvt_from_hf

    torch.manual_seed(1)
    # real PVT configs use sr_ratio 1 in the CLS-token stage (HF errors
    # otherwise)
    cfg = PvtConfig(image_size=32, num_encoder_blocks=2, depths=[1, 1],
                    sequence_reduction_ratios=[4, 1], hidden_sizes=[8, 16],
                    patch_sizes=[4, 2], strides=[4, 2],
                    num_attention_heads=[1, 2], mlp_ratios=[2, 2],
                    num_labels=5, drop_path_rate=0.0,
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)
    tm = PvtForImageClassification(cfg).eval()
    params = pvt_from_hf(tm.state_dict(), depths=[1, 1])
    jm = PVT(depths=(1, 1), dims=(8, 16), num_heads=(1, 2),
             mlp_ratios=(2, 2), sr_ratios=(4, 1), patch_sizes=(4, 2),
             num_classes=5, img_hw=32)
    x = np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) < 3e-4, np.max(np.abs(got - ref))
