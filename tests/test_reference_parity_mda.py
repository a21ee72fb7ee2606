"""Direct numeric parity for MDA — the paper's own method — vs the
reference's MDAFunctions.py (greedy insertion/deletion searches + QP curve
projection + MAS re-scoring).

The reference's deletion path hardcodes 224x224 buffers
(MDAFunctions.py:346,525), so this runs at full resolution.  The model is a
deterministic linear probe (logits = <x, K_c>) implemented identically in
torch and JAX: a random-init CNN's softmax barely reacts to masking (gap
~1e-4, which the reference's normalization divides by), while the linear
probe gives strongly segment-dependent responses — the comparison then
exercises the search/normalization/QP/MAS logic rather than conv parity
(covered elsewhere).  A 4x4 patch grid is passed as explicit `segments`
(sidestepping skimage slic).  cvxopt.solvers.qp is replaced by an
independent SLSQP solver in reference_loader, so the curve-projection
comparison pits our Dykstra projector against a genuinely different QP
implementation.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import reference_loader as rl
from xai_tpu.models.common import ModelBundle, ModelMeta
from xai_tpu.methods import mda as jmda

HW = 224
GRID = 4          # 4x4 = 16 segments of 56x56


class _LinTorch(torch.nn.Module):
    def __init__(self, K):
        super().__init__()
        self.register_buffer("K", torch.from_numpy(K))

    def forward(self, x):
        return torch.einsum("bchw,kchw->bk", x, self.K)


@pytest.fixture(scope="module")
def pair224():
    rs = np.random.RandomState(0)
    K = rs.randn(17, 3, HW, HW).astype(np.float32) * 2e-2
    tm = _LinTorch(K).eval()
    Kj = jnp.asarray(K)
    meta = ModelMeta(name="lin224", family="cnn", img_hw=HW,
                     num_classes=17, batch_size=8)
    bundle = ModelBundle(
        meta=meta, params={},
        apply=lambda p, x: jnp.einsum("bhwc,kchw->bk", x, Kj))
    return tm, bundle


@pytest.fixture(scope="module")
def fixtures224():
    rs = np.random.RandomState(3)
    x = (rs.rand(HW, HW, 3).astype(np.float32) - 0.5)
    prior = rs.rand(HW, HW, 3).astype(np.float32)
    block = HW // GRID
    seg = np.arange(GRID * GRID).reshape(GRID, GRID)
    segments = np.kron(seg, np.ones((block, block), dtype=np.int64))
    return x, prior, segments


def _blur_t(t):
    return t * 0.2


def _blur_j(xb):
    return xb * 0.2


def _ref_insertion(tm, x, prior, segments, cutoff=0.9):
    mda = rl.load_mda()
    n = int(segments.max()) + 1
    timg = torch.from_numpy(x.transpose(2, 0, 1))[None]
    return mda.find_insertion_patches(
        timg, torch.from_numpy(prior), torch.from_numpy(segments),
        _blur_t, n_searches=n, type=1, model=tm, device="cpu",
        img_hw=HW, max_batch_size=8, cutoff=cutoff)


def test_mda_insertion_search_matches_reference(pair224, fixtures224):
    """Order + returned MR: on early exit the raw response list ending in
    the cutoff value (:190-192); on full completion the monotone-normalized
    blur-prepended insertion curve original_MR (:265-291)."""
    tm, bundle = pair224
    x, prior, segments = fixtures224
    _, _, ref_segs, ref_mr = _ref_insertion(tm, x, prior, segments)
    picked, mr = jmda.find_insertion_patches(
        bundle, x, prior, segments, _blur_j, n_searches=GRID * GRID,
        cutoff=0.9)
    k = len(picked)
    assert k > 0
    ref_segs, ref_mr = np.asarray(ref_segs), np.asarray(ref_mr)
    assert list(ref_segs[:k]) == [int(v) for v in picked], \
        (ref_segs[:k], picked)
    # early exit: reference returns the full-length torch.empty buffer with
    # an UNINITIALIZED tail (:125) — only the defined prefix is comparable
    assert np.abs(ref_mr[:len(mr)] - np.asarray(mr)).max() < 1e-4


def test_mda_deletion_maps_match_reference(pair224, fixtures224):
    """Deletion at a 2x2 grid, where the comparison is numerically
    well-posed.  At finer grids the reference pipeline is chaotic-by-dust:
    zero-delta segments get QP-solver noise (~1e-17) as map values, the
    MAS re-scoring then orders those near-ties by np.argsort's unstable
    quicksort permutation — which depends on every other element — and the
    cummax normalization propagates the mid-segment ordering into the
    curve.  cvxopt (interior point) has the same dust, so even two runs of
    the reference against different solvers disagree by a few percent
    there.  With 4 segments every curve delta is solidly nonzero and the
    maps agree to ~1e-8."""
    mda = rl.load_mda()
    tm, bundle = pair224
    x, prior, _ = fixtures224
    segments = np.kron(np.arange(4).reshape(2, 2),
                       np.ones((HW // 2, HW // 2), dtype=np.int64))
    _, _, ref_segs, ref_mr = _ref_insertion(tm, x, prior, segments)
    # MDA's hand-off: keep insertion picks up to 90% recovery on the
    # returned curve (:614-617)
    ref_segs, mr = np.asarray(ref_segs), np.asarray(ref_mr)
    hit = np.where(mr >= 0.9)[0]
    end_index = int(hit[0]) if len(hit) else len(mr)
    begin = ref_segs[:end_index + 1]

    timg = torch.from_numpy(x.transpose(2, 0, 1))[None]
    out = mda.find_deletion_patches(
        timg, torch.from_numpy(segments), torch.from_numpy(prior),
        torch.from_numpy(begin.copy()), _blur_t, n_searches=4, model=tm,
        device="cpu", img_hw=HW, max_batch_size=8, kappa=0.005)
    ref0, _, ref5, _, ref10, _, ref_best = out

    got0, got5, got10 = jmda.find_deletion_patches(
        bundle, x, segments, prior, [int(v) for v in begin],
        _blur_j, n_searches=4, kappa=0.005)

    for name, ref_map, got in (("k0", ref0, got0), ("k5", ref5, got5),
                               ("k10", ref10, got10)):
        want = np.abs(np.asarray(ref_map).sum(2))     # driver's abs-sum
        got3 = 3.0 * np.asarray(got)                  # ours is ch-collapsed
        scale = max(want.max(), 1e-9)
        assert np.abs(got3 - want).max() / scale < 1e-4, \
            (name, np.abs(got3 - want).max() / scale)


# ---------------------------------------------------------------------------
# MASCalibrate: differentiable MAS + refine_attribution
# ---------------------------------------------------------------------------

def test_differentiable_mas_matches_reference(pair224, fixtures224):
    """MASCalibrate.MAS (:1095-1306): normalized response + density
    alignment penalty -> corrected AUC, both modes, double_loss form."""
    mc = rl.load_mas_calibrate()
    from xai_tpu.methods import mas_calibrate as jmc
    tm, bundle = pair224
    x, prior, _ = fixtures224
    timg = torch.from_numpy(x.transpose(2, 0, 1))[None]
    attr = torch.from_numpy(prior)      # [H, W, 3] positive map
    for mode, t in (("ins", 1), ("del", 0)):
        want_s, want_p = mc.MAS(timg, attr, tm, "cpu", total_steps=HW,
                                img_hw=HW, type=t, double_loss=1)
        got_s, got_p = jmc.mas_score(bundle, x, prior, mode)
        assert abs(float(want_s) - got_s) < 2e-4, (mode, want_s, got_s)
        assert abs(float(want_p) - got_p) < 2e-4, (mode, want_p, got_p)


def test_refine_attribution_matches_reference(pair224, fixtures224):
    """MASCalibrator.refine_attribution (:1333-1420): 3 Adam epochs on the
    density-alignment loss, fixed lr (sidestepping the heuristic, which is
    itself parity-tested via heuristic_lr in test_calibrate.py)."""
    mc = rl.load_mas_calibrate()
    from xai_tpu.methods import mas_calibrate as jmc
    tm, bundle = pair224
    x, prior, _ = fixtures224
    timg = torch.from_numpy(x.transpose(2, 0, 1))[None]
    cal = mc.MASCalibrator(tm, HW, "cpu")
    want = cal.refine_attribution(timg, prior.copy(), lr=0.01,
                                  smoothing=False, epochs=3)
    got = jmc.refine_attribution(bundle, x, prior, lr=0.01,
                                 smoothing=False, epochs=3)
    want = np.asarray(want)
    got = np.asarray(got)
    scale = max(np.abs(want).max(), 1e-9)
    assert np.abs(got - want).max() / scale < 5e-3, \
        np.abs(got - want).max() / scale


def test_calibrate_density_matches_reference(pair224, fixtures224):
    """MASCalibrate.calibrate_density (:985-1050): QP-project the raw
    response, rebuild the map from the projected derivative."""
    mc = rl.load_mas_calibrate()
    from xai_tpu.methods import mas_calibrate as jmc
    tm, bundle = pair224
    x, prior, _ = fixtures224
    timg = torch.from_numpy(x.transpose(2, 0, 1))[None]
    # total_steps=16 keeps the oracle QP at n=17, where SLSQP is exact
    for mode, t in (("del", 0), ("ins", 1)):
        want = mc.calibrate_density(timg, torch.from_numpy(prior), tm,
                                    "cpu", total_steps=16, img_hw=HW,
                                    type=t).detach().numpy()
        got = np.asarray(jmc.calibrate_density(bundle, x, prior,
                                               total_steps=16, mode=mode))
        scale = max(np.abs(want).max(), 1e-9)
        assert np.abs(got - want).max() / scale < 5e-3, \
            (mode, np.abs(got - want).max() / scale)


def test_remove_pixels_matches_reference(pair224, fixtures224):
    """MASCalibrate.remove_pixels (:1051-1094): zero the attribution tail
    where the response derivative is flat."""
    mc = rl.load_mas_calibrate()
    from xai_tpu.methods import mas_calibrate as jmc
    tm, bundle = pair224
    x, prior, _ = fixtures224
    timg = torch.from_numpy(x.transpose(2, 0, 1))[None]
    for mode, t in (("del", 0), ("ins", 1)):
        want = mc.remove_pixels(timg, torch.from_numpy(prior), tm, "cpu",
                                total_steps=HW, img_hw=HW,
                                type=t).detach().numpy()
        got = np.asarray(jmc.remove_pixels(bundle, x, prior,
                                           total_steps=HW, mode=mode))
        scale = max(np.abs(want).max(), 1e-9)
        assert np.abs(got - want).max() / scale < 1e-4, \
            (mode, np.abs(got - want).max() / scale)


# ---------------------------------------------------------------------------
# MAC (MACBuilder.py): MAF retrieval + iterative denoising
# ---------------------------------------------------------------------------

def test_mac_clean_attribution_matches_reference(pair224, fixtures224):
    """Denoise.clean_attribution (:269-362) with explicit segments (the
    felzenszwalb default is covered by our own segmentation tests): scores,
    iteration count, and the best map must match."""
    mcb = rl.load_util_module("util.attribution_methods.MACBuilder")
    from xai_tpu.methods import mac as jmac
    tm, bundle = pair224
    x, prior, segments = fixtures224
    timg = torch.from_numpy(x.transpose(2, 0, 1))[None]
    for mode in ("ins", "del"):
        den = mcb.Denoise(tm, HW, "cpu", substrate_fn=_blur_t, mode=mode,
                          segments=segments, cutoff=5)
        want_map, want_iters, want_sum = den.clean_attribution(
            timg, prior.copy(), iterations=3, max_batch_size=8)
        got_map, got_iters, got_sum = jmac.clean_attribution(
            bundle, x, x, prior, 3, mode=mode, blur_fn=_blur_j,
            segments=segments)
        assert want_sum == got_sum, (mode, want_sum, got_sum)
        assert int(want_iters) == int(got_iters), (mode, want_iters,
                                                   got_iters)
        want_map = np.asarray(want_map)
        scale = max(np.abs(want_map).max(), 1e-9)
        assert np.abs(np.asarray(got_map) - want_map).max() / scale < 1e-3, \
            (mode, np.abs(np.asarray(got_map) - want_map).max() / scale)
