"""Surgery + M2IB tests (reuse the small CLIP fixtures)."""
import numpy as np
import jax
import jax.numpy as jnp

from xai_tpu.methods.clip_surgery import (surgery_map, clip_feature_surgery,
                                          get_similarity_map)
from xai_tpu.methods.clip_m2ib import vision_heatmap_iba

from test_clip import small_pair, clip_bundle  # noqa: F401  (fixtures)


def test_feature_surgery_removes_mean():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(1, 5, 8), jnp.float32)
    txt = jnp.asarray(rs.randn(3, 8), jnp.float32)
    sim = clip_feature_surgery(img, txt)
    assert sim.shape == (1, 5, 3)
    # redundant-mean removal: summing over classes of the weighted products
    # minus their mean is ~0 when weights are uniform; just check finiteness
    assert np.isfinite(np.asarray(sim)).all()
    smap = get_similarity_map(sim[:, 1:, :], 8)
    assert smap.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(smap)).all()


def test_surgery_map(clip_bundle):  # noqa: F811
    x = jnp.asarray(np.random.RandomState(1).randn(32, 32, 3), jnp.float32)
    txt = clip_bundle.extras["text_embeddings"][:4]
    m = surgery_map(clip_bundle, x, txt)
    assert m.shape == (32, 32)
    assert np.isfinite(m).all()
    assert m.min() >= -1e-6 and m.max() <= 1 + 1e-6  # minmax inside


def test_m2ib_vision_heatmap(clip_bundle):  # noqa: F811
    x = jnp.asarray(np.random.RandomState(2).randn(32, 32, 3), jnp.float32)
    txt = clip_bundle.extras["text_embeddings"][0]
    m = vision_heatmap_iba(clip_bundle, x, txt, vlayer=0, steps=3,
                           batch_size=4, key=jax.random.PRNGKey(0))
    assert m.shape == (32, 32)
    assert np.isfinite(m).all()
    assert abs(m.max() - 1.0) < 1e-5 and m.min() >= 0
