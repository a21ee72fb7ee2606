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


def test_pallas_quickshift_matches_xla_interpret():
    """Pallas stencil parents == XLA patches parents on a structured
    (tie-free) image; noise images can flip exact density ties (documented
    in quickshift_pallas.py) so the fixture is smooth gradient + jitter."""
    from xai_tpu.kernels.quickshift_pallas import quickshift_parents_pallas
    from xai_tpu.ops.quickshift_jax import _quickshift_device_b

    rs = np.random.RandomState(0)
    H, w, wd = 48, 6, 6
    yy, xx = np.mgrid[0:H, 0:H] / H
    img = np.stack([yy, xx, yy * xx], -1).astype(np.float32)
    img += 0.05 * rs.rand(H, H, 3).astype(np.float32)
    imgs = np.stack(
        [img, np.clip(img * 0.7 + 0.2 * rs.rand(H, H, 3), 0, 1)],
    ).astype(np.float32)
    inv2s2, maxd2 = np.float32(1 / 8.0), np.float32(100.0)
    ref = _quickshift_device_b(jnp.asarray(imgs), w, wd, jnp.float32(0.2),
                               inv2s2, maxd2)
    got = quickshift_parents_pallas(jnp.asarray(imgs), inv2s2, maxd2,
                                    jnp.float32(0.2), w=w, wd=wd,
                                    interpret=True)
    assert (np.asarray(ref) == np.asarray(got)).all()
