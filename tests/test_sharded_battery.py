"""Sharded battery on the 8-device CPU mesh: per-image results must match
the single-device battery exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xai_tpu.parallel.mesh import make_mesh
from xai_tpu.parallel.sharded_battery import sharded_battery_scores
from xai_tpu.metrics import run_battery
from xai_tpu.ops.blur import make_blur_fn

from tiny_models import tiny_bundle

HW = 16


def test_sharded_matches_single_device(cpu_devices):
    mesh = make_mesh(8, model_axis=1)
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(0)
    images = rs.randn(8, HW, HW, 3).astype(np.float32)
    sals = rs.rand(8, HW, HW).astype(np.float32)
    blur = make_blur_fn(5, 5.0)

    sharded = sharded_battery_scores(b, mesh, images, sals, blur, chunk=17)
    assert len(sharded) == 8
    for i in range(8):
        single = run_battery(b.apply, b.params, images[i], sals[i], blur,
                             chunk=17)
        for k in single:
            assert sharded[i][k] == pytest.approx(single[k], abs=2e-5), \
                (i, k, sharded[i][k], single[k])


def test_make_mesh_too_many_devices_errors_clearly(cpu_devices):
    # the round-1 failure mode: asking for a bigger mesh than the backend
    # exposes must raise a named error, not a bare numpy reshape ValueError
    import pytest
    with pytest.raises(ValueError, match="make_mesh.*16 devices.*exposes only 8"):
        make_mesh(16)
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(8, model_axis=3)


def test_sharded_pad_and_mask_any_batch(cpu_devices):
    """B=5 on an 8-device data axis: padded tail must be masked out and the
    returned scores must match the sequential battery per image, with
    explicit (non-argmax) targets threaded through."""
    mesh = make_mesh(8, model_axis=1)
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(1)
    images = rs.randn(5, HW, HW, 3).astype(np.float32)
    sals = rs.rand(5, HW, HW).astype(np.float32)
    targets = np.array([1, 3, 0, 7, 2])
    blur = make_blur_fn(5, 5.0)

    sharded = sharded_battery_scores(b, mesh, images, sals, blur, chunk=17,
                                     targets=targets)
    assert len(sharded) == 5
    for i in range(5):
        single = run_battery(b.apply, b.params, images[i], sals[i], blur,
                             chunk=17, target=int(targets[i]))
        for k in single:
            assert sharded[i][k] == pytest.approx(single[k], abs=2e-5), \
                (i, k, sharded[i][k], single[k])
