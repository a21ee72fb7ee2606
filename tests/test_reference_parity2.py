"""Direct numeric parity vs the reference's OWN modules, round 2 additions:
GIGBuilder.py (Guided IG path search), XRAIBuilder.py (greedy region
growth), AICTestFunctions / MonotonicityTest / PosNegPertFunctions metric
curves, PICTestFunctions (SIC/AIC information curves), plus a sklearn
oracle for LIME's weighted ridge solve.

sanityForMethods.py is the one metric file NOT oracle-importable here
(skimage ssim/hog are unavailable in this image); its SSIM/HOG are covered
by the transliteration tests in tests/test_metrics_extra.py.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import reference_loader as rl
from tests.torch_oracles import TorchResNet
from xai_tpu.convert import resnet_from_torch
from xai_tpu.models import resnet as jresnet
from xai_tpu.models.common import ModelBundle, ModelMeta
from xai_tpu.methods import gig as jgig
from xai_tpu.methods import xrai as jxrai
from xai_tpu.metrics import classic as jclassic
from xai_tpu.metrics import pic as jpic


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


# ---------------------------------------------------------------------------
# Guided IG (GIGBuilder.py:194-291 via GuidedIG.GetMask)
# ---------------------------------------------------------------------------

def test_guided_ig_matches_reference(cnn_pair, x64):
    rgig = rl.load_gig()
    tm, bundle = cnn_pair
    want = rgig.GuidedIG().GetMask(
        _t(x64), tm, "cpu", rgig.call_model_function,
        {"class_idx_str": TARGET}, x_baseline=torch.zeros_like(_t(x64)),
        x_steps=8, max_dist=1.0, fraction=0.5)
    want = want.squeeze().numpy()                     # [3, H, W]
    got = np.asarray(jgig.guided_ig(bundle, x64, TARGET, steps=8,
                                    fraction=0.5, max_dist=1.0))
    scale = max(np.abs(want).max(), 1e-12)
    assert np.abs(got.transpose(2, 0, 1) - want).max() < 1e-4 * scale


# ---------------------------------------------------------------------------
# XRAI greedy region growth (XRAIBuilder.py:619-788) on identical masks
# ---------------------------------------------------------------------------

def _random_masks(hw=32, n=20, seed=0):
    rs = np.random.RandomState(seed)
    masks = []
    for _ in range(n):
        r0, c0 = rs.randint(0, hw - 6, 2)
        h, w = rs.randint(4, 16, 2)
        m = np.zeros((hw, hw), bool)
        m[r0:r0 + h, c0:c0 + w] = True
        masks.append(m)
    return masks


def test_xrai_full_matches_reference():
    rxrai = rl.load_xrai()
    attr = np.random.RandomState(5).randn(32, 32)
    segs = _random_masks()
    want, _ = rxrai.XRAI._xrai(attr.copy(), [m.copy() for m in segs],
                               min_pixel_diff=10)
    got = jxrai.xrai_full(attr, segs, min_pixel_diff=10)
    assert np.allclose(got, want, atol=1e-12)


def test_xrai_fast_matches_reference():
    rxrai = rl.load_xrai()
    attr = np.random.RandomState(6).randn(32, 32)
    segs = _random_masks(seed=7)
    want, _ = rxrai.XRAI._xrai_fast(attr.copy(), [m.copy() for m in segs],
                                    min_pixel_diff=10)
    got = jxrai.xrai_fast(attr, segs, min_pixel_diff=10)
    assert np.allclose(got, want, atol=1e-12)


# ---------------------------------------------------------------------------
# AIC / Monotonicity / MoRF-LeRF metric curves
# ---------------------------------------------------------------------------

HW_PIX = 64 * 64
STEP = 512


@pytest.mark.parametrize("mode", ["ins", "del"])
def test_aic_matches_reference(cnn_pair, x64, mode):
    raic = rl.load_aic()
    tm, bundle = cnn_pair
    sal = np.abs(np.asarray(x64).sum(-1)).astype(np.float64)
    rn, rnorm = raic.AICMetric(tm, HW_PIX, mode, STEP,
                               substrate_fn=torch.zeros_like).single_run(
        _t(x64), sal.copy(), "cpu", max_batch_size=4)
    gn, gnorm = jclassic.AICMetric(
        bundle, HW_PIX, mode, STEP,
        substrate_fn=lambda im: im * 0.0).single_run(
        x64, sal.copy(), max_batch_size=4)
    assert gn == rn
    assert np.abs(np.asarray(gnorm) - rnorm).max() < 1e-6


def test_aic_decision_flip_matches_reference(cnn_pair, x64):
    raic = rl.load_aic()
    tm, bundle = cnn_pair
    sal = np.abs(np.asarray(x64).sum(-1)).astype(np.float64)
    rscore, rresp = raic.AICMetric(
        tm, HW_PIX, "ins", STEP,
        substrate_fn=torch.zeros_like).single_run(
        _t(x64), sal.copy(), "cpu", max_batch_size=4, decision_flip=True)
    gscore, gresp = jclassic.AICMetric(
        bundle, HW_PIX, "ins", STEP,
        substrate_fn=lambda im: im * 0.0).single_run(
        x64, sal.copy(), max_batch_size=4, decision_flip=True)
    assert np.allclose(np.asarray(gresp), rresp)
    assert abs(gscore - rscore) < 1e-12


@pytest.mark.parametrize("mode", ["positive", "negative"])
def test_monotonicity_matches_reference(cnn_pair, x64, mode):
    rmono = rl.load_monotonicity()
    tm, bundle = cnn_pair
    sal = np.abs(np.asarray(x64).sum(-1)).astype(np.float64)
    rresp, rmono_v = rmono.MonotonicityMetric(
        tm, HW_PIX, mode, STEP, substrate_fn=torch.zeros_like).single_run(
        _t(x64), sal.copy(), "cpu", max_batch_size=4)
    gresp, gmono_v = jclassic.MonotonicityMetric(
        bundle, HW_PIX, mode, STEP,
        substrate_fn=lambda im: im * 0.0).single_run(
        x64, sal.copy(), max_batch_size=4)
    assert np.abs(np.asarray(gresp) - rresp).max() < 1e-5
    assert abs(gmono_v - rmono_v) < 1e-6


@pytest.mark.parametrize("mode", ["morf", "lerf"])
def test_posneg_matches_reference(cnn_pair, x64, mode):
    rpn = rl.load_posneg()
    tm, bundle = cnn_pair
    sal = np.abs(np.asarray(x64).sum(-1)).astype(np.float64)
    rn, rresp = rpn.PositiveNegativePerturbation(
        tm, HW_PIX, mode, STEP, substrate_fn=torch.zeros_like).single_run(
        _t(x64), sal.copy(), "cpu", max_batch_size=4)
    gn, gresp = jclassic.PositiveNegativePerturbation(
        bundle, HW_PIX, mode, STEP,
        substrate_fn=lambda im: im * 0.0).single_run(
        x64, sal.copy(), max_batch_size=4)
    assert gn == rn
    assert np.abs(np.asarray(gresp) - rresp).max() < 1e-5


@pytest.mark.parametrize("mode", ["ins", "del", "lerf"])
def test_rise_matches_reference(cnn_pair, x64, mode):
    rrise = rl.load_rise_test_functions()
    tm, bundle = cnn_pair
    sal = np.abs(np.asarray(x64).sum(-1)).astype(np.float64)
    rn, rent, rnorm = rrise.RISEMetric(
        tm, HW_PIX, mode, STEP, substrate_fn=torch.zeros_like).single_run(
        _t(x64), sal.copy(), "cpu", max_batch_size=4)
    gn, gent, gnorm = jclassic.RISEMetric(
        bundle, HW_PIX, mode, STEP,
        substrate_fn=lambda im: im * 0.0).single_run(
        x64, sal.copy(), max_batch_size=4)
    assert gn == rn
    assert np.abs(np.asarray(gnorm) - rnorm).max() < 1e-5
    assert np.abs(np.asarray(gent) - rent).max() < 1e-4


# ---------------------------------------------------------------------------
# PIC (PICTestFunctions.py compute_pic_metric) — SIC and AIC variants
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", [0, 1])
def test_pic_matches_reference(cnn_pair, method):
    rpic = rl.load_pic()
    tm, bundle = cnn_pair
    rs = np.random.RandomState(4)
    img = rs.rand(64, 64, 3).astype(np.float32)      # [0, 1] pixels
    sal = rs.rand(64, 64)
    # seeded: the normalization divides by (original - blurred) prediction,
    # which can amplify f32 forward noise on an unlucky random mask
    random_mask = jpic.generate_random_mask(64, 64, 0.02,
                                            rng=np.random.RandomState(9))
    thresholds = [0.05, 0.1, 0.3, 0.6]

    want = rpic.compute_pic_metric(
        img, sal, random_mask, thresholds, method, tm, "cpu",
        normalization=lambda t: t, num_data_points=100)
    got = jpic.compute_pic_metric(
        bundle, img, sal, random_mask, thresholds, method,
        normalize_fn=None, num_data_points=100)
    if want == 0:
        assert got == 0
        return
    assert np.abs(np.asarray(got.curve_y) - want.curve_y).max() < 1e-5
    assert abs(float(got.auc) - float(want.auc)) < 1e-5


def test_pic_both_metrics_and_aggregate_match_reference(cnn_pair):
    """compute_both_metrics (one sweep -> SIC+AIC, PICTestFunctions.py:
    348-466) and aggregate_individual_pic_results (:494-532)."""
    rpic = rl.load_pic()
    tm, bundle = cnn_pair
    rs = np.random.RandomState(11)
    thresholds = [0.05, 0.1, 0.3, 0.6]
    results_sic_got, results_sic_want = [], []
    for seed in (5, 6):
        img = rs.rand(64, 64, 3).astype(np.float32)
        sal = rs.rand(64, 64)
        random_mask = jpic.generate_random_mask(
            64, 64, 0.02, rng=np.random.RandomState(seed))
        want_sic, want_aic = rpic.compute_both_metrics(
            img, sal, random_mask, thresholds, tm, "cpu",
            normalization=lambda t: t, num_data_points=100)
        got_sic, got_aic = jpic.compute_both_metrics(
            bundle, img, sal, random_mask, thresholds,
            normalize_fn=None, num_data_points=100)
        for got, want in ((got_sic, want_sic), (got_aic, want_aic)):
            assert np.abs(np.asarray(got.curve_y) - want.curve_y).max() < 1e-5
            assert abs(float(got.auc) - float(want.auc)) < 1e-5
        results_sic_got.append(got_sic)
        results_sic_want.append(want_sic)
    for method in ("mean", "median"):
        agg_want = rpic.aggregate_individual_pic_results(
            results_sic_want, method=method)
        agg_got = jpic.aggregate_individual_pic_results(
            results_sic_got, method=method)
        assert np.abs(np.asarray(agg_got.curve_y) - agg_want.curve_y
                      ).max() < 1e-5
        assert abs(float(agg_got.auc) - float(agg_want.auc)) < 1e-5


# ---------------------------------------------------------------------------
# LRP transformer attribution (ViT_LRP_timm.py relprop + generate_LRP)
# ---------------------------------------------------------------------------

def test_transformer_attribution_matches_reference_lrp():
    """t_attr: the reference's full relprop sweep (ViT_LRP_timm.relprop with
    alpha=1 + grad*cam rollout) vs the closed-form reverse sweep in
    methods/vit_lrp.py, on a shared-weight tiny LRP ViT."""
    from xai_tpu.convert import vit_from_torch
    from xai_tpu.methods.vit_lrp import transformer_attribution
    from xai_tpu.models import vit as jvit

    vl = rl.load_vit_lrp_timm()
    eg = rl.load_vit_explanation_generator()
    torch.manual_seed(0)
    tm = vl.VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                              depth=3, num_heads=4, num_classes=13).eval()
    with torch.no_grad():
        tm.cls_token.normal_(0, 0.5)
        tm.pos_embed.normal_(0, 0.5)
        tm.head.weight.normal_(0, 0.2)
        tm.head.bias.normal_(0, 0.2)
    params = vit_from_torch(tm.state_dict(), depth=3)

    cfg = jvit.ViTConfig(patch=8, embed_dim=32, depth=3, num_heads=4,
                         num_classes=13, img_hw=32)
    jm = jvit.VisionTransformer(cfg)
    meta = ModelMeta(name="tiny_lrp", family="vit", img_hw=32,
                     num_classes=13, num_patches=4, batch_size=8)
    bundle = ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: jm.apply({"params": p}, x),
        apply_taps=lambda p, x: jm.apply({"params": p}, x, taps=True),
        apply_probed=lambda p, x, probes: jm.apply({"params": p}, x,
                                                   probes=probes, taps=True),
        extras=cfg)

    x = np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # shared weights really are shared (no torch.no_grad: the LRP model
    # registers gradient hooks on attention inside forward)
    ref_logits = tm(xt).detach().numpy()
    got_logits = np.asarray(bundle.apply(params, jnp.asarray(x)))
    assert np.abs(got_logits - ref_logits).max() < 1e-4

    tgt = 7
    want = eg.LRP(tm).generate_LRP(
        xt, tgt, method="transformer_attribution", start_layer=0,
        device="cpu").detach().numpy()[0]
    got = np.asarray(transformer_attribution(bundle, x, tgt))
    scale = max(np.abs(want).max(), 1e-12)
    assert np.abs(got - want).max() < 1e-4 * scale


# ---------------------------------------------------------------------------
# LIME weighted ridge solve vs sklearn (the vendored lime's regressor is
# sklearn Ridge(alpha=1), lime/lime_base.py)
# ---------------------------------------------------------------------------

def test_lime_ridge_matches_sklearn():
    from sklearn.linear_model import Ridge

    from xai_tpu.methods.lime import _weighted_ridge
    rs = np.random.RandomState(0)
    X = rs.rand(200, 30)
    y = rs.rand(200)
    w = rs.rand(200) + 0.1
    coef, intercept = _weighted_ridge(X, y, w, alpha=1.0)
    sk = Ridge(alpha=1.0, fit_intercept=True)
    sk.fit(X, y, sample_weight=w)
    assert np.abs(np.asarray(coef) - sk.coef_).max() < 1e-8
    assert abs(float(intercept) - sk.intercept_) < 1e-8
