"""Direct M2IB oracle parity (closes the last CLIP oracle gap, VERDICT r2).

Runs the reference's OWN vision_heatmap_iba composition
(util/attribution_methods/CLIP/M2IB/scripts/{methods,iba}.py — Estimator,
IBAInterpreter, InformationBottleneck, replace_layer) on a small real
HuggingFace ``transformers.CLIPModel``, captures the torch RNG draws made
inside its optimizer loop (the `_sample_t` eps, one [batch, N, W] tensor
per step), and injects the SAME noise into our fused lax.scan
implementation on weights converted with ``clip_from_hf``.
"""
import sys
import types

import numpy as np
import pytest
import torch

from reference_loader import load_ref, _install_stubs, REF


def _load_ref_m2ib():
    """Import the reference M2IB scripts package (relative .iba/.utils)."""
    name = "_ref_m2ib_pkg"
    if name in sys.modules:
        return sys.modules[f"{name}.methods"]
    _install_stubs()
    if "clip" not in sys.modules:
        clipm = types.ModuleType("clip")
        sys.modules["clip"] = clipm
    import importlib
    pkg = types.ModuleType(name)
    pkg.__path__ = [f"{REF}/util/attribution_methods/CLIP/M2IB/scripts"]
    sys.modules[name] = pkg
    return importlib.import_module(f"{name}.methods")


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, \
        CLIPVisionConfig

    from xai_tpu.convert import clip_from_hf
    from xai_tpu.models import clip as clipmod
    from xai_tpu.models.common import ModelBundle, ModelMeta

    tc = CLIPTextConfig(hidden_size=16, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=2,
                        max_position_embeddings=12, vocab_size=50,
                        hidden_act="quick_gelu", projection_dim=16,
                        eos_token_id=49)
    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          image_size=32, patch_size=8,
                          hidden_act="quick_gelu", projection_dim=16)
    cfg = CLIPConfig(text_config=tc.to_dict(), vision_config=vc.to_dict(),
                     projection_dim=16)
    torch.manual_seed(5)
    tm = CLIPModel(cfg).eval()
    params = clip_from_hf(tm.state_dict(), vision_layers=2, text_layers=2)
    jcfg = clipmod.CLIPConfig(patch=8, vision_width=32, vision_layers=2,
                              vision_heads=4, embed_dim=16, text_width=16,
                              text_heads=2, text_layers=2, vocab_size=50,
                              context_length=12, img_hw=32)
    jm = clipmod.CLIP(jcfg)
    meta = ModelMeta(name="hfclip", family="clip", img_hw=32,
                     num_patches=4, num_classes=10)
    bundle = ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: jm.apply({"params": p}, x,
                                    method=clipmod.CLIP.encode_image)[:, 0],
        extras={"cfg": jcfg, "model": jm})
    return tm, bundle


def test_hf_clip_converter_parity(hf_pair):
    import jax.numpy as jnp
    from xai_tpu.models import clip as clipmod

    tm, bundle = hf_pair
    jm = bundle.extras["model"]
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref_i = tm.get_image_features(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got_i = np.asarray(bundle.apply(bundle.params, jnp.asarray(x)))
    assert np.abs(got_i - ref_i).max() < 1e-4

    toks = np.array([[1, 5, 9, 49, 0, 0, 0, 0, 0, 0, 0, 0]], np.int32)
    with torch.no_grad():
        ref_t = tm.get_text_features(torch.from_numpy(
            toks.astype(np.int64))).numpy()
    got_t = np.asarray(jm.apply({"params": bundle.params},
                                jnp.asarray(toks),
                                method=clipmod.CLIP.encode_text))
    assert np.abs(got_t - ref_t).max() < 1e-4


def test_m2ib_vision_heatmap_oracle(hf_pair):
    from xai_tpu.methods.clip_m2ib import vision_heatmap_iba

    tm, bundle = hf_pair
    methods = _load_ref_m2ib()
    iba = sys.modules["_ref_m2ib_pkg.iba"]

    # capture the per-step bottleneck noise from the reference run
    captured = []

    def sample_rec(mu, noise_var):
        eps = torch.randn(mu.size())
        captured.append(eps.detach().numpy())
        return mu + noise_var.sqrt() * eps

    orig = iba.InformationBottleneck._sample_t
    iba.InformationBottleneck._sample_t = staticmethod(sample_rec)
    try:
        rs = np.random.RandomState(3)
        x = rs.randn(1, 3, 32, 32).astype(np.float32)
        toks = torch.tensor([[1, 5, 9, 49, 0, 0, 0, 0, 0, 0, 0, 0]])
        torch.manual_seed(0)
        ref_map = methods.vision_heatmap_iba(
            toks, torch.from_numpy(x), tm, layer_idx=0, beta=0.1, var=1,
            lr=1, train_steps=10, progbar=False, device="cpu")
    finally:
        iba.InformationBottleneck._sample_t = orig

    assert len(captured) == 10
    assert ref_map.shape == (224, 224)   # reference hardcodes 224

    import jax.numpy as jnp
    from xai_tpu.models import clip as clipmod
    jm = bundle.extras["model"]
    txt = np.asarray(jm.apply({"params": bundle.params},
                              jnp.asarray(np.asarray(toks.numpy(),
                                                     np.int32)),
                              method=clipmod.CLIP.encode_text))
    got = vision_heatmap_iba(bundle,
                             jnp.asarray(x.transpose(0, 2, 3, 1)),
                             txt, vlayer=0, beta=0.1, lr=1.0, steps=10,
                             noises=np.stack(captured), out_hw=224)
    assert got.shape == (224, 224)
    assert np.abs(got - ref_map).max() < 5e-3, np.abs(got - ref_map).max()
