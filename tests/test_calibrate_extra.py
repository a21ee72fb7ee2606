"""Tests for the MASCalibrate research variants + recalibration samplers."""
import numpy as np
import jax
import jax.numpy as jnp

from xai_tpu.methods.mas_calibrate import (calibrate_density, mas_response,
                                           remove_pixels)
from xai_tpu.methods.recalibration import ig_sg, ig_uniform

from tiny_models import tiny_bundle, linear_bundle

HW = 16
_blur0 = lambda x: x * 0.0


def test_mas_response_monotone():
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(0)
    x = rs.randn(HW, HW, 3).astype(np.float32)
    attr = rs.rand(HW, HW, 3)
    r_del = mas_response(b, x, attr, "del", blur_fn=_blur0)
    r_ins = mas_response(b, x, attr, "ins", blur_fn=_blur0)
    assert (np.diff(r_del) <= 1e-9).all()
    assert (np.diff(r_ins) >= -1e-9).all()


def test_calibrate_density_map_sums_to_curve_drop():
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(1)
    x = rs.randn(HW, HW, 3).astype(np.float32)
    attr = rs.rand(HW, HW, 3)
    m = calibrate_density(b, x, attr, mode="del", blur_fn=_blur0)
    assert m.shape == (HW, HW, 3)
    assert np.isfinite(m).all()
    # per-pixel value is the FULL step delta (the reference's len() of a
    # [1, step_size] tensor is 1, MASCalibrate.py:1044 — no division), so
    # total per-channel mass = step_size * total response drop
    resp = mas_response(b, x, attr, "del", blur_fn=_blur0)
    from xai_tpu.native import project_curve
    resp = project_curve(np.asarray(resp, np.float64), "del")
    step_size = HW * HW // HW
    assert abs(m[..., 0].sum() - step_size * (resp[0] - resp[-1])) < 1e-5


def test_remove_pixels_zeroes_tail():
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(2)
    x = rs.randn(HW, HW, 3).astype(np.float32)
    attr = rs.rand(HW, HW, 3)
    out = remove_pixels(b, x, attr, mode="del", blur_fn=_blur0)
    assert out.shape == (HW, HW, 3)
    # output saliency mass never exceeds the input's
    assert out[..., 0].sum() <= np.abs(attr.sum(-1)).sum() + 1e-6


def test_ig_uniform_linear_model():
    """For a linear model, expected-IG over any reference bag equals
    W * (x - mean(ref)) exactly."""
    b = linear_bundle(hw=8)
    x = jnp.asarray(np.random.RandomState(3).randn(8, 8, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    attr = ig_uniform(b, x, 2, key, k=4, bg_size=5, chunk=10)
    refs = jax.random.uniform(key, (5, 8, 8, 3), jnp.float32, -1.0, 1.0)
    W = np.asarray(b.params)[:, 2].reshape(8, 8, 3)
    want = W * np.asarray(x[None] - refs).mean(axis=0)
    assert np.allclose(np.asarray(attr), want, atol=1e-5)


def test_ig_sg_runs():
    b = tiny_bundle(hw=HW)
    x = jnp.asarray(np.random.RandomState(4).randn(HW, HW, 3), jnp.float32)
    attr = ig_sg(b, x, 1, jax.random.PRNGKey(1), k=4, bg_size=4, chunk=8)
    assert attr.shape == (HW, HW, 3)
    assert np.isfinite(np.asarray(attr)).all()
