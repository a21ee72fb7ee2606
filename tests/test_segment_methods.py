"""Tests for segmentation-backed methods (LIME, XRAI), native superpixels,
curve projection, TIS, and ViT-CX."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xai_tpu import native
from xai_tpu.methods.lime import lime, _weighted_ridge
from xai_tpu.methods.xrai import xrai_full, _gain_density
from xai_tpu.methods.tis import tis, kmeans

from tiny_models import tiny_bundle

HW = 16


def _structured_img(hw=64):
    yy, xx = np.mgrid[0:hw, 0:hw] / hw
    img = np.stack([np.sin(yy * 6) * 0.5 + 0.5,
                    np.cos(xx * 5) * 0.5 + 0.5,
                    (yy + xx) / 2], -1)
    return img.astype(np.float32)


def test_native_superpixels_basic():
    img = _structured_img(64)
    lab = native.slic(img, 16, 10000.0)
    assert lab.shape == (64, 64)
    assert len(np.unique(lab)) >= 8
    labf = native.felzenszwalb(img, scale=0.5, sigma=0.8, min_size=20)
    assert len(np.unique(labf)) >= 2
    labq = native.quickshift(img, 0.2, 2.0, 8.0)
    assert len(np.unique(labq)) >= 2
    # label contiguity 0..K-1
    assert set(np.unique(labq)) == set(range(labq.max() + 1))


def test_project_curve_matches_qp_semantics():
    rs = np.random.RandomState(0)
    y = np.clip(np.minimum.accumulate(np.linspace(1, 0, 25)
                                      + rs.randn(25) * 0.05), 0, 1)
    x = native.project_curve(y, "del", 20000)
    d2 = x[:-2] - 2 * x[1:-1] + x[2:]
    assert x[0] == y[0] and x[-1] == y[-1]
    assert (d2 >= -2e-5).all()                  # convexity (del)
    assert (x >= -1e-9).all() and (x <= 1 + 1e-9).all()
    # ins mode: concavity
    y2 = np.clip(np.maximum.accumulate(np.linspace(0, 1, 25)
                                       + rs.randn(25) * 0.05), 0, 1)
    x2 = native.project_curve(y2, "ins", 20000)
    d2 = x2[:-2] - 2 * x2[1:-1] + x2[2:]
    assert (d2 <= 2e-5).all()


def test_weighted_ridge_matches_sklearn():
    from sklearn.linear_model import Ridge
    rs = np.random.RandomState(1)
    X = rs.randint(0, 2, (60, 7)).astype(float)
    y = rs.rand(60)
    w = rs.rand(60) + 0.1
    coef, intercept = _weighted_ridge(X, y, w, alpha=1.0)
    sk = Ridge(alpha=1.0, fit_intercept=True)
    sk.fit(X, y, sample_weight=w)
    assert np.allclose(coef, sk.coef_, atol=1e-8)
    assert abs(intercept - sk.intercept_) < 1e-8


def test_lime_planted_signal():
    """Model responds to sum of a corner region -> LIME should include it."""
    rs = np.random.RandomState(2)
    W = np.zeros((HW, HW, 3), np.float32)
    W[:6, :6] = 1.0

    from xai_tpu.models.common import ModelBundle, ModelMeta

    def apply(p, x):
        s = (x * jnp.asarray(W)).sum(axis=(1, 2, 3))
        return jnp.stack([s, -s], axis=1)

    b = ModelBundle(meta=ModelMeta(name="planted", family="cnn", img_hw=HW,
                                   num_classes=2), params=None, apply=apply)
    img = _structured_img(HW)
    mask = lime(b, img, jax.random.PRNGKey(0), num_samples=200, chunk=20)
    assert mask.shape == (HW, HW)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # the signal corner should be mostly selected
    assert mask[:6, :6].mean() > 0.5


def test_lime_return_coef_consistent_with_mask():
    """The return_coef output (golden-parity surface) must be the exact
    vector the mask selection derives from: re-running the lime tail
    (top-|coef| positive segments) on the returned coefficients must
    reproduce the returned mask."""
    from xai_tpu.methods.lime import lime_batch, lime_segments

    W = np.zeros((HW, HW, 3), np.float32)
    W[:6, :6] = 1.0

    from xai_tpu.models.common import ModelBundle, ModelMeta

    def apply(p, x):
        s = (x * jnp.asarray(W)).sum(axis=(1, 2, 3))
        return jnp.stack([s, -s], axis=1)

    b = ModelBundle(meta=ModelMeta(name="planted", family="cnn", img_hw=HW,
                                   num_classes=2), params=None, apply=apply)
    img = _structured_img(HW)
    masks, coef = lime_batch(b, img[None], [jax.random.PRNGKey(0)],
                             num_samples=200, chunk=20, return_coef=True)
    labels, nseg = lime_segments(img)
    c = np.asarray(coef[0])
    order = np.argsort(-np.abs(c))
    keep, chosen = 0, np.zeros(len(c), bool)
    for f in order:
        if c[f] > 0 and keep < 5:
            chosen[f] = True
            keep += 1
    assert np.array_equal(masks[0] > 0, chosen[labels])
    # plain call (no coef) is unchanged by the flag plumbing
    plain = lime_batch(b, img[None], [jax.random.PRNGKey(0)],
                       num_samples=200, chunk=20)
    assert np.array_equal(plain, masks)


def test_xrai_greedy_ranks_planted_region():
    rs = np.random.RandomState(3)
    attr = rs.rand(32, 32) * 0.1
    attr[8:16, 8:16] = 1.0                       # hot region
    segs = []
    for i in range(4):
        for j in range(4):
            m = np.zeros((32, 32), bool)
            m[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = True
            segs.append(m)
    out = xrai_full(attr, segs, min_pixel_diff=1)
    # hot segment gets the highest output value
    hot = out[8:16, 8:16].mean()
    assert hot == out.max()
    assert np.isfinite(out).all()


def test_kmeans_separates_clusters():
    rs = np.random.RandomState(4)
    a = rs.randn(30, 4) * 0.05 + np.array([1, 0, 0, 0])
    b = rs.randn(30, 4) * 0.05 + np.array([0, 1, 0, 0])
    pts = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    cents = kmeans(pts, jax.random.PRNGKey(0), 2, iters=20)
    c = np.asarray(cents)
    # one centroid near each cluster center
    d0 = min(np.linalg.norm(c - np.array([1, 0, 0, 0]), axis=1))
    d1 = min(np.linalg.norm(c - np.array([0, 1, 0, 0]), axis=1))
    assert d0 < 0.2 and d1 < 0.2


@pytest.fixture(scope="module")
def small_vit():
    from xai_tpu.models import vit as vitmod
    return vitmod.make_bundle("vit_base_patch8_224")


def test_tis_small_vit():
    from xai_tpu.models import vit as vitmod
    import xai_tpu.models.common as mc
    cfg = vitmod.ViTConfig(patch=8, embed_dim=32, depth=2, num_heads=4,
                           num_classes=7, img_hw=32)
    model = vitmod.VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    meta = mc.ModelMeta(name="tisvit", family="vit", img_hw=32, num_classes=7,
                        num_patches=4)
    b = mc.ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: model.apply({"params": p}, x),
        apply_taps=lambda p, x: model.apply({"params": p}, x, taps=True),
        apply_probed=lambda p, x, pr: model.apply({"params": p}, x,
                                                  probes=pr, taps=True),
        apply_tokens=lambda p, x, ti: model.apply({"params": p}, x,
                                                  token_indices=ti),
        extras=cfg)
    x = jnp.asarray(np.random.RandomState(5).randn(32, 32, 3), jnp.float32)
    sal = tis(b, x, n_masks=8, batch_size=4, key=jax.random.PRNGKey(1))
    assert sal.shape == (4, 4)
    a = np.asarray(sal)
    assert np.isfinite(a).all()
    assert a.min() >= 0 and abs(a.max() - 1.0) < 1e-5

    from xai_tpu.methods.vit_cx import vit_cx
    m = vit_cx(b, x, key=jax.random.PRNGKey(2))
    assert m.shape == (32, 32)
    assert np.isfinite(m).all()


def test_quickshift_device_matches_native():
    """The on-device quickshift (ops/quickshift_jax.py) reproduces the
    native C++ segmentation exactly (same density/parent semantics)."""
    import numpy as np
    from xai_tpu.native import quickshift
    from xai_tpu.ops.quickshift_jax import quickshift_device

    img = np.random.RandomState(3).rand(64, 64, 3).astype(np.float32)
    a = quickshift(img, 0.2, 4.0, 200.0)
    b = quickshift_device(img, 0.2, 4.0, 200.0)
    assert a.max() == b.max()
    # same partition up to label permutation
    pair = a.astype(np.int64) * (b.max() + 1) + b
    assert len(np.unique(pair)) == a.max() + 1


def test_parents_to_labels_matches_host_compaction():
    """The on-device sort-free compaction (pointer jumping + cumsum rank,
    used inside the fused LIME jit) is bit-identical to the host
    np.unique form for real quickshift parent maps and synthetic chains."""
    import jax.numpy as jnp

    from xai_tpu.ops.quickshift_jax import (_compact, _labels_from_parents,
                                            parents_to_labels_batch)

    rs = np.random.RandomState(0)
    cases = []
    # synthetic parent FORESTS (quickshift parents always point to a
    # strictly-higher-density pixel or to self, so the map is acyclic)
    for _ in range(3):
        n = 24 * 24
        parent = np.arange(n, dtype=np.int32)
        for i in range(n - 1):
            if rs.rand() < 0.8:
                parent[i] = rs.randint(i + 1, n)
        cases.append(parent.reshape(24, 24))
    # plus a REAL device-quickshift parent map
    from xai_tpu.ops.quickshift_jax import _parents_batch
    img = rs.rand(1, 24, 24, 3).astype(np.float32)
    real = np.asarray(_parents_batch(
        jnp.asarray(img), 6, 2, jnp.float32(0.2),
        jnp.float32(1.0 / (2.0 * 2.0 * 2.0)), jnp.float32(64.0)))[0]
    cases.append(real.astype(np.int32))
    for parent in cases:
        want = _compact(parent.reshape(-1), 24, 24)
        got, count = _labels_from_parents(jnp.asarray(parent.reshape(-1)))
        np.testing.assert_array_equal(np.asarray(got).reshape(24, 24), want)
        assert int(count) == want.max() + 1

    batch = np.stack([c for c in cases])
    labels, counts = parents_to_labels_batch(jnp.asarray(batch))
    for i, parent in enumerate(cases):
        want = _compact(parent.reshape(-1), 24, 24)
        np.testing.assert_array_equal(
            np.asarray(labels[i]).reshape(24, 24), want)
