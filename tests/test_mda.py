"""MDA greedy-search tests on a planted-signal linear model where the
optimal orders are known analytically."""
import numpy as np
import jax
import jax.numpy as jnp

from xai_tpu.methods.mda import (find_insertion_patches,
                                 find_deletion_patches, mda, mda_dense,
                                 _segment_saliency)
from xai_tpu.models.common import ModelBundle, ModelMeta

HW = 16


def _grid_segments(hw=HW, per_side=4):
    ids = np.arange(per_side ** 2).reshape(per_side, per_side)
    r = hw // per_side
    return np.repeat(np.repeat(ids, r, 0), r, 1)


def _planted_bundle(weights_2d):
    """Binary classifier whose class-1 logit is the weighted pixel sum."""
    W = jnp.asarray(weights_2d, jnp.float32)

    def apply(p, x):
        s = (x.mean(-1) * W).sum(axis=(1, 2))
        return jnp.stack([-s, s], axis=1)

    return ModelBundle(meta=ModelMeta(name="p", family="cnn", img_hw=HW,
                                      num_classes=2), params=None,
                       apply=apply)


def test_segment_saliency_means():
    seg = _grid_segments()
    sal = np.arange(HW * HW, dtype=float).reshape(HW, HW)
    out = _segment_saliency(sal, seg, 16)
    for i in range(16):
        assert np.isclose(out[i], sal[seg == i].mean())


def test_insertion_prefers_high_weight_segments():
    seg = _grid_segments()
    w = np.zeros((HW, HW), np.float32)
    w[seg == 5] = 0.02
    w[seg == 10] = 0.01
    b = _planted_bundle(w)
    x = jnp.ones((HW, HW, 3), jnp.float32)
    # informative prior: the subsearch window follows the prior ranking
    # (MDAFunctions.py:105-110), so signal segments must rank high in it
    prior = np.repeat(w[..., None], 3, axis=-1) + 0.001
    blur = lambda im: im * 0.0
    order, mr = find_insertion_patches(b, x, prior, seg, blur, 16,
                                       target=1, cutoff=1.0)
    # first two insertions should be the two signal segments
    assert set(order[:2]) == {5, 10}
    assert order[0] == 5


def test_deletion_produces_map_concentrated_on_signal():
    seg = _grid_segments()
    w = np.zeros((HW, HW), np.float32)
    w[seg == 3] = 0.03
    b = _planted_bundle(w)
    x = jnp.ones((HW, HW, 3), jnp.float32)
    prior = np.ones((HW, HW, 3), np.float32)
    blur = lambda im: im * 0.0
    m0, m5, m10 = find_deletion_patches(b, x, seg, prior, [3], blur, 16,
                                        target=1, mas_chunk=17)
    assert m0.shape == (HW, HW)
    assert np.isfinite(m0).all()
    # the signal segment carries the largest attribution
    seg3 = m0[seg == 3].mean()
    rest = m0[seg != 3].mean()
    assert seg3 > rest


def test_mda_end_to_end_runs():
    seg_w = np.zeros((HW, HW), np.float32)
    seg_w[:4, :4] = 0.02
    b = _planted_bundle(seg_w)
    rs = np.random.RandomState(0)
    trans = rs.rand(HW, HW, 3).astype(np.float32)
    x = jnp.asarray(trans * 2 - 1)
    prior = np.abs(rs.rand(HW, HW, 3)).astype(np.float32)
    blur = lambda im: im * 0.0
    out = mda(b, trans, x, prior, 16, blur, target=1)
    assert out.shape == (HW, HW)
    assert np.isfinite(out).all()


def test_mda_dense_end_to_end_runs():
    """MDA_dense (evaluateImageNetSeg.py:291-326): kappa=-1 dense rank map,
    bilinear smoothed; non-constant and finite on a planted model."""
    # strong planted signal: weak signals leave the re-scored deletion curve
    # flat, which zeroes BOTH maps via the dense/sparse.max() rescale (the
    # reference does the same at MASCalibrate.py:969)
    seg_w = np.zeros((HW, HW), np.float32)
    seg_w[:4, :4] = 0.5
    b = _planted_bundle(seg_w)
    rs = np.random.RandomState(1)
    trans = rs.rand(HW, HW, 3).astype(np.float32)
    trans[:4, :4] = 1.0
    x = jnp.asarray(trans * 2 - 1)
    prior = np.abs(rs.rand(HW, HW, 3)).astype(np.float32)
    blur = lambda im: im * 0.0
    out = mda_dense(b, trans, x, prior, 16, blur, target=1)
    assert out.shape == (HW, HW)
    assert np.isfinite(out).all()
    assert out.max() > out.min()  # a rank map, not a constant
