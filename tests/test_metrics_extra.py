"""PIC, sanity (SSIM/HOG), and segmentation metric tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from xai_tpu.metrics import pic as P
from xai_tpu.metrics import sanity as S
from xai_tpu.metrics import seg as SEG

from tiny_models import tiny_bundle

HW = 16


def test_create_blurred_image_interpolates():
    rs = np.random.RandomState(0)
    img = rs.rand(12, 12, 3).astype(np.float32)
    mask = np.zeros((12, 12), bool)
    mask[::4, ::4] = True
    out = P.create_blurred_image(img, mask)
    assert out.shape == img.shape
    # known pixels preserved
    assert np.allclose(out[::4, ::4], img[::4, ::4], atol=1e-6)
    assert np.isfinite(out).all()


def test_entropy_monotone_with_detail():
    rs = np.random.RandomState(1)
    flat = np.full((64, 64, 3), 128, np.uint8)
    noisy = rs.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    assert P.estimate_image_entropy(noisy) > P.estimate_image_entropy(flat)


def test_compute_pic_metric_runs():
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(2)
    img = rs.rand(HW, HW, 3).astype(np.float32)
    sal = rs.rand(HW, HW)
    mask = P.generate_random_mask(HW, HW, 0.05, np.random.RandomState(0))
    res = P.compute_pic_metric(b, img, sal, mask, method=0,
                               normalize_fn=lambda x: x * 2 - 1)
    if res != 0:  # degenerate skip is allowed, mirrors reference
        assert 0.0 <= res.auc <= 1.0
        assert res.curve_y[-1] == 1.0


def test_ssim_properties():
    rs = np.random.RandomState(3)
    a = rs.rand(64, 64, 3)
    assert abs(S.ssim(S.normalize_image(a), S.normalize_image(a)) - 1.0) \
        < 1e-9
    b = rs.rand(64, 64, 3)
    cross = S.ssim(S.normalize_image(a), S.normalize_image(b))
    assert cross < 0.9


def test_ssim_matches_formula_on_constant_shift():
    # identical structure, constant offset -> SSIM driven by luminance term
    a = np.tile(np.linspace(0, 1, 64), (64, 1))
    b = a * 1.0
    assert S.ssim(a, b) == pytest.approx(1.0, abs=1e-9)


def test_hog_descriptor_shape_and_invariance():
    rs = np.random.RandomState(4)
    img = rs.rand(224, 224, 3)
    h = S.hog(img)
    ncells = 224 // 16
    nblocks = ncells - 3 + 1
    assert h.shape == (nblocks * nblocks * 3 * 3 * 9,)
    # identical images -> identical descriptors
    assert np.allclose(S.hog(img), h)


def test_sanity_evaluate_self_similarity():
    rs = np.random.RandomState(5)
    attr = rs.rand(64, 64, 3)
    ssim_v, spr_v, hog_v = S.evaluate(attr, attr)
    assert ssim_v == pytest.approx(1.0, abs=1e-6)
    assert spr_v == pytest.approx(1.0, abs=1e-6)
    assert hog_v == pytest.approx(1.0, abs=1e-6)
    other = rs.rand(64, 64, 3)
    s2, p2, h2 = S.evaluate(attr, other)
    assert s2 < 0.9 and abs(p2) < 0.2


def test_randomize_params_changes_only_selected():
    import jax
    b = tiny_bundle(hw=HW)
    key = jax.random.PRNGKey(0)
    rand = S.randomize_params(b.params, key, ["c1"])
    assert not np.allclose(np.asarray(rand["c1"]["kernel"]),
                           np.asarray(b.params["c1"]["kernel"]))
    assert np.allclose(np.asarray(rand["c2"]["kernel"]),
                       np.asarray(b.params["c2"]["kernel"]))
    layers = S.top_level_layers(b.params)
    assert layers == ["c1", "c2", "fc"]
    casc = S.cascading_randomize(b.params, key, 1)
    assert not np.allclose(np.asarray(casc["c2"]["kernel"]),
                           np.asarray(b.params["c2"]["kernel"]))
    assert np.allclose(np.asarray(casc["fc"]["kernel"]),
                       np.asarray(b.params["fc"]["kernel"]))


def test_seg_metrics_perfect_prediction():
    rs = np.random.RandomState(6)
    gt = (rs.rand(32, 32) > 0.5).astype(int)
    sal = gt.astype(float) * 0.8 + 0.1  # perfectly separable
    correct, labeled, inter, union, ap, f1 = SEG.eval_batch(sal, gt)
    assert correct == labeled            # all fg pixels right
    assert inter[1] == union[1]          # perfect fg IoU
    assert ap[0] > 0.99
    assert f1[0] == pytest.approx(1.0)


def test_seg_metrics_random_prediction():
    rs = np.random.RandomState(7)
    gt = (rs.rand(32, 32) > 0.5).astype(int)
    sal = rs.rand(32, 32)
    correct, labeled, inter, union, ap, f1 = SEG.eval_batch(sal, gt)
    assert 0 <= correct <= labeled
    assert (inter <= union).all()
    assert 0.3 < ap[0] < 0.8


def test_compute_pic_metric_aic_mode():
    """method=1 (AIC): binary top-1 responses through the same pipeline."""
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(9)
    img = rs.rand(HW, HW, 3).astype(np.float32)
    sal = rs.rand(HW, HW)
    mask = P.generate_random_mask(HW, HW, 0.05, np.random.RandomState(1))
    res = P.compute_pic_metric(b, img, sal, mask, method=1,
                               normalize_fn=lambda x: x * 2 - 1)
    if res != 0:
        assert 0.0 <= res.auc <= 1.0
        assert set(np.unique(np.round(res.curve_y, 6))) <= \
            set(np.round(np.unique(res.curve_y), 6))
