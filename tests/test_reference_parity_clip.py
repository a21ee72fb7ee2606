"""Direct numeric parity for the CLIP dense explainers vs the reference's
OWN generate_emap.py (util/attribution_methods/CLIP/), loaded as a package.

The torch side runs the reference functions verbatim on OracleCLIP (the
openai-naming replica already used for tower parity in test_clip.py),
in HALF precision exactly as clip_encode_dense does (:315 `x = x.half()`);
the JAX side runs xai_tpu.methods.clip_explain in f32 on converted
weights.  Tolerances account for the f16 round-trip.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import reference_loader as rl
from tests.test_clip import OracleCLIP
from xai_tpu.convert import clip_from_torch
from xai_tpu.models import clip as clipmod
from xai_tpu.methods import clip_explain as CE


@pytest.fixture(scope="module")
def dense_pair():
    torch.manual_seed(0)
    tm = OracleCLIP().eval()
    sd = {k: v.clone() for k, v in tm.state_dict().items()}
    params = clip_from_torch(sd, vision_layers=2, text_layers=2)
    cfg = clipmod.CLIPConfig(patch=8, vision_width=32, vision_layers=2,
                             vision_heads=4, embed_dim=16, text_width=16,
                             text_heads=2, text_layers=2, vocab_size=50,
                             context_length=12, img_hw=32)
    jm = clipmod.CLIP(cfg)
    # attrs clip_encode_dense reads off the openai model (:310-313)
    tm.visual.transformer.width = 32
    tm.visual.input_resolution = 32
    tm = tm.half()

    from xai_tpu.models.common import ModelBundle, ModelMeta
    meta = ModelMeta(name="smallclip", family="clip", img_hw=32,
                     num_patches=4, num_classes=10)
    bundle = ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: jm.apply(
            {"params": p}, x, method=clipmod.CLIP.encode_image)[:, 0],
        apply_taps=lambda p, x: jm.apply(
            {"params": p}, x, taps=True, method=clipmod.CLIP.encode_image),
        extras={"cfg": cfg, "model": jm})
    return tm, bundle


@pytest.fixture(scope="module")
def xc():
    return np.random.RandomState(2).rand(32, 32, 3).astype(np.float32)


@pytest.fixture(scope="module")
def txt3():
    t = np.random.RandomState(5).randn(3, 16).astype(np.float32)
    return t / np.linalg.norm(t, axis=-1, keepdims=True)


def _ref_dense(tm, xc):
    ge = rl.load_generate_emap()
    timg = torch.from_numpy(xc.transpose(2, 0, 1))[None]
    return ge, ge.clip_encode_dense(timg, tm)


def test_clip_encode_dense_matches_reference(dense_pair, xc):
    tm, bundle = dense_pair
    ge, ref = _ref_dense(tm, xc)
    (outputs, v_final, x_in, v, q_out, k_out, attn, att_output,
     map_size) = ref
    d = CE.encode_dense(bundle, xc)
    assert tuple(map_size) == tuple(d.map_size)
    # torch dense tensors are LND (seq, batch, dim); ours are BND
    for name, want, got in [
            ("outputs", outputs, d.outputs),
            ("v_final", v_final, d.v_final),
            ("x_in", x_in.transpose(0, 1), d.x_in),
            ("v", v.transpose(0, 1), d.v),
            ("q_out", q_out.transpose(0, 1), d.q_out),
            ("k_out", k_out.transpose(0, 1), d.k_out),
            ("attn", attn, d.attn),
            ("att_output", att_output.transpose(0, 1), d.att_output)]:
        w = want.detach().float().numpy()
        g = np.asarray(got)
        scale = max(1.0, np.abs(w).max())
        err = np.abs(g - w).max() / scale
        assert err < 5e-3, (name, err)


def test_grad_eclip_matches_reference(dense_pair, xc, txt3):
    """eclip + the eclip_wo / eclip_nograd ablations, summed over captions
    exactly as the driver does (evaluatePerturbation.py:399-410)."""
    tm, bundle = dense_pair
    ge, ref = _ref_dense(tm, xc)
    (outputs, v_final, x_in, v, q_out, k_out, attn, att_output,
     map_size) = ref
    img_emb = torch.nn.functional.normalize(outputs[:, 0], dim=-1)
    cosines = (img_emb @ torch.from_numpy(txt3).half().T)[0]

    for kwargs in ({}, {"withksim": False}, {"withgrad": False}):
        want = torch.stack(
            [ge.grad_eclip(c, q_out, k_out, v, att_output, map_size,
                           **kwargs) for c in cosines], 0).sum(0)
        want = want.detach().float().numpy()
        got = np.asarray(CE.grad_eclip(bundle, xc, txt3, **kwargs))
        scale = max(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / scale < 2e-2, \
            (kwargs, np.abs(got - want).max() / scale)


def test_mask_clip_matches_reference(dense_pair, xc, txt3):
    tm, bundle = dense_pair
    ge, ref = _ref_dense(tm, xc)
    (outputs, v_final, x_in, v, q_out, k_out, attn, att_output,
     map_size) = ref
    txt = torch.from_numpy(txt3).half()
    want = ge.mask_clip(txt.T, v_final, k_out, map_size).sum(0)
    want = want.detach().float().numpy()
    got = np.asarray(CE.mask_clip(bundle, xc, txt3))
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 1e-2, \
        np.abs(got - want).max() / scale


def test_selfattn_matches_reference(dense_pair, xc):
    """selfattn = CLS row of the dense 1-head attention
    (evaluatePerturbation.py:423-424)."""
    tm, bundle = dense_pair
    _, ref = _ref_dense(tm, xc)
    attn, map_size = ref[6], ref[8]
    want = attn[0, :1, 1:].detach().float().reshape(*map_size).numpy()
    got = np.asarray(CE.self_attn(bundle, xc))
    assert np.abs(got - want).max() < 5e-3


def test_grad_cam_matches_reference(dense_pair, xc, txt3):
    """grad_cam on the last block's input features (generate_emap.py:
    488-499; layer_feat = clip_encode_dense's x_in, the driver's
    last_input)."""
    tm, bundle = dense_pair
    ge, ref = _ref_dense(tm, xc)
    outputs, x_in, map_size = ref[0], ref[2], ref[8]
    img_emb = torch.nn.functional.normalize(outputs[:, 0], dim=-1)
    cosines = (img_emb @ torch.from_numpy(txt3).half().T)[0]
    # library fn, not in the driver's CLI list -> per-caption comparison
    want = ge.grad_cam(cosines[0], x_in, map_size).detach().float().numpy()
    got = np.asarray(CE.clip_grad_cam(bundle, xc, txt3[:1]))
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 2e-2, \
        np.abs(got - want).max() / scale


# ---------------------------------------------------------------------------
# full-model relevance (GAME / rollout / LRP) vs the Game_MM_CLIP fork
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mm_pair():
    """The reference's hookable CLIP (Game_MM_CLIP/clip/model.py) with tiny
    dims, f32, weights converted to our Flax CLIP.  vision_width=64 because
    the fork hard-codes vision_heads = width // 64 (model.py:278)."""
    mm = rl.load_mm_clip_model()
    torch.manual_seed(1)
    tm = mm.CLIP(embed_dim=16, image_resolution=32, vision_layers=2,
                 vision_width=64, vision_patch_size=8, context_length=12,
                 vocab_size=50, transformer_width=16, transformer_heads=2,
                 transformer_layers=2).eval().float()
    params = clip_from_torch(tm.state_dict(), vision_layers=2, text_layers=2)
    cfg = clipmod.CLIPConfig(patch=8, vision_width=64, vision_layers=2,
                             vision_heads=1, embed_dim=16, text_width=16,
                             text_heads=2, text_layers=2, vocab_size=50,
                             context_length=12, img_hw=32)
    jm = clipmod.CLIP(cfg)
    from xai_tpu.models.common import ModelBundle, ModelMeta
    meta = ModelMeta(name="mmclip", family="clip", img_hw=32,
                     num_patches=4, num_classes=10)
    bundle = ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: jm.apply(
            {"params": p}, x, method=clipmod.CLIP.encode_image)[:, 0],
        apply_taps=lambda p, x: jm.apply(
            {"params": p}, x, taps=True, method=clipmod.CLIP.encode_image),
        extras={"cfg": cfg, "model": jm})
    return tm, bundle


@pytest.fixture(scope="module")
def tok3():
    # eot = argmax(token ids) per the openai convention: 49 marks the end;
    # full context_length=12 columns (the fork adds the whole positional
    # embedding, model.py:352 — no sequence slicing)
    t = np.zeros((3, 12), np.int64)
    t[0, :4] = [1, 5, 9, 49]
    t[1, :3] = [3, 7, 49]
    t[2, :5] = [2, 4, 6, 8, 49]
    return t


def test_mm_joint_logits_match_reference(mm_pair, xc, tok3):
    tm, bundle = mm_pair
    timg = torch.from_numpy(xc.transpose(2, 0, 1))[None].repeat(3, 1, 1, 1)
    # no torch.no_grad(): the fork registers attention hooks that require
    # grad-enabled tensors (auxilary.py:247-250)
    lpi, lpt = (t.detach() for t in tm(timg, torch.from_numpy(tok3)))
    jm, cfg = bundle.extras["model"], bundle.extras["cfg"]
    x = jnp.asarray(xc)[None].repeat(3, axis=0)
    glpi, glpt = jm.apply({"params": bundle.params}, x,
                          jnp.asarray(tok3))[:2]
    assert np.abs(np.asarray(glpi) - lpi.numpy()).max() < 2e-3
    assert np.abs(np.asarray(glpt) - lpt.numpy()).max() < 2e-3


def test_game_matches_reference(mm_pair, xc, tok3):
    """GAME = mm_interpret image relevance (generate_emap.py:133-171),
    summed over the caption batch as the driver does (:414)."""
    tm, bundle = mm_pair
    ge = rl.load_generate_emap()
    timg = torch.from_numpy(xc.transpose(2, 0, 1))[None]
    want = ge.mm_interpret(model=tm, image=timg,
                           texts=torch.from_numpy(tok3), device="cpu")
    want = want.sum(0).detach().numpy()
    got = np.asarray(CE.game(bundle, xc, tok3))
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 1e-3, \
        np.abs(got - want).max() / scale


def test_clip_rollout_matches_reference(mm_pair, xc, tok3):
    """rollout = mm_interpret(rollout=True) attention collection +
    compute_rollout_attention (driver :418-422)."""
    tm, bundle = mm_pair
    ge = rl.load_generate_emap()
    timg = torch.from_numpy(xc.transpose(2, 0, 1))[None]
    attns = ge.mm_interpret(model=tm, image=timg,
                            texts=torch.from_numpy(tok3), device="cpu",
                            rollout=True)
    want = ge.compute_rollout_attention(attns)[0].detach().numpy()
    got = np.asarray(CE.clip_rollout(bundle, xc, tok3))
    assert np.abs(got - want).max() < 1e-5, np.abs(got - want).max()


def test_clip_lrp_matches_reference(mm_pair, xc, tok3):
    """lrp = generate_emap.clip_lrp over all blocks of both towers; the
    driver feeds a single caption (:436)."""
    tm, bundle = mm_pair
    ge = rl.load_generate_emap()
    timg = torch.from_numpy(xc.transpose(2, 0, 1))[None]
    t1 = tok3[:1]
    _, want = ge.clip_lrp(timg, torch.from_numpy(t1), tm, "cpu")
    want = want.detach().numpy().reshape(4, 4)
    _, got = CE.clip_lrp(bundle, xc, t1)
    got = np.asarray(got)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 1e-3, \
        np.abs(got - want).max() / scale


# ---------------------------------------------------------------------------
# CLIP Surgery: dual-path v-v attention + feature surgery + similarity map
# ---------------------------------------------------------------------------

def test_clip_surgery_matches_reference(xc):
    """clip_surgery_map's pipeline (generate_emap.py:117-132) against the
    CLIP_Surgery fork's own model + clip functions.  6 vision layers because
    the fork rewires resblocks[-1..-6] in place (clip_surgery_model.py:
    321-327); text features are supplied directly (the prompt-ensemble
    encode is tokenizer+text-tower, parity-covered elsewhere)."""
    ge = rl.load_generate_emap()
    surgery_clip = ge.surgery_clip
    import sys
    smod = sys.modules["_ref_clip_pkg.CLIP_Surgery.clip.clip_surgery_model"]
    torch.manual_seed(2)
    tm = smod.CLIPSurgery(
        embed_dim=16, image_resolution=32, vision_layers=6,
        vision_width=64, vision_patch_size=8, context_length=12,
        vocab_size=50, transformer_width=16, transformer_heads=2,
        transformer_layers=2).eval().float()
    from xai_tpu.methods import clip_surgery as CS
    params = clip_from_torch(tm.state_dict(), vision_layers=6,
                             text_layers=2)
    cfg = clipmod.CLIPConfig(patch=8, vision_width=64, vision_layers=6,
                             vision_heads=1, embed_dim=16, text_width=16,
                             text_heads=2, text_layers=2, vocab_size=50,
                             context_length=12, img_hw=32)
    jm = clipmod.CLIP(cfg)
    from xai_tpu.models.common import ModelBundle, ModelMeta
    meta = ModelMeta(name="surgclip", family="clip", img_hw=32,
                     num_patches=4, num_classes=10)
    bundle = ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: jm.apply(
            {"params": p}, x, method=clipmod.CLIP.encode_image)[:, 0],
        extras={"cfg": cfg, "model": jm})

    txt = np.random.RandomState(6).randn(3, 16).astype(np.float32)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)

    timg = torch.from_numpy(xc.transpose(2, 0, 1))[None]
    with torch.no_grad():
        feats = tm.encode_image(timg)
        feats = feats / feats.norm(dim=-1, keepdim=True)
        sim = surgery_clip.clip_feature_surgery(feats,
                                                torch.from_numpy(txt))
        want = surgery_clip.get_similarity_map(sim[:, 1:, :],
                                               (32, 32)).numpy()

    got = np.asarray(CS.surgery_map(bundle, xc, txt))
    assert got.shape == (32, 32)
    assert np.abs(got - want[0, :, :, 0]).max() < 1e-4, \
        np.abs(got - want[0, :, :, 0]).max()
