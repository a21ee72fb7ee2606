"""Pallas kernel tests (interpret mode on CPU) + separable-blur parity."""
import numpy as np
import jax.numpy as jnp

from xai_tpu.kernels.blur_pallas import separable_blur, pallas_blur
from xai_tpu.kernels.reveal import reveal_batch, pallas_reveal_batch
from xai_tpu.ops.blur import gaussian_blur
from xai_tpu.metrics.curves import pixel_flip_steps


def test_separable_blur_matches_dense():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    dense = gaussian_blur(x, 31, 31.0)
    sep = separable_blur(x, 31, 31.0)
    assert np.max(np.abs(np.asarray(dense) - np.asarray(sep))) < 1e-5


def test_pallas_blur_matches_dense_interpret():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(1, 32, 32, 3), jnp.float32)
    dense = gaussian_blur(x, 11, 5.0)
    pk = pallas_blur(x, 11, 5.0, interpret=True)
    assert np.max(np.abs(np.asarray(dense) - np.asarray(pk))) < 1e-5


def test_reveal_batch_forms_agree():
    rs = np.random.RandomState(2)
    start = jnp.asarray(rs.rand(16, 16, 3), jnp.float32)
    finish = jnp.zeros_like(start)
    sal = rs.rand(16, 16)
    flip = pixel_flip_steps(sal, 16).reshape(16, 16)
    steps = jnp.arange(0, 17, 4, dtype=jnp.int32)
    a = reveal_batch(start, finish, jnp.asarray(flip), steps)
    b = pallas_reveal_batch(start, finish, flip, steps, interpret=True)
    assert np.allclose(np.asarray(a), np.asarray(b))
    # step 0 = pure start; final step = all finish
    assert np.allclose(np.asarray(a[0]), np.asarray(start))
    assert np.allclose(np.asarray(a[-1]), np.asarray(finish))
