"""Regression tests for the round-3 code-review findings over methods/.

Each test pins one fixed defect:
- shapley_sampling forwards its public ``baseline`` argument (it was
  silently ignored — zero baseline regardless of what the caller passed);
- lime accepts new-style typed PRNG keys (np.asarray on a typed-key list
  raised before _key_words could unwrap them);
- xrai_full degrades instead of KeyError-ing when a NaN base attribution
  makes every gain comparison False (the reference crashes here);
- tis clamps zero mask coverage so one dead token can't NaN-poison the
  whole map through the max-normalize (the reference NaNs here);
- the production batched idg/idgi/agi paths honor --attr_dtype;
- _CAST_CACHE is a bounded LRU (it used to pin every swept model's param
  trees for process lifetime).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_models import tiny_bundle


def test_shapley_baseline_is_forwarded():
    from xai_tpu.methods.ablation import shapley_sampling
    b = tiny_bundle(hw=16)
    x = np.random.RandomState(0).randn(16, 16, 3).astype(np.float32)
    k = jax.random.PRNGKey(0)
    a0 = np.asarray(shapley_sampling(b, x, 1, k, num_patches=4,
                                     n_samples=3, baseline=0.0, chunk=17))
    a5 = np.asarray(shapley_sampling(b, x, 1, k, num_patches=4,
                                     n_samples=3, baseline=0.5, chunk=17))
    assert np.isfinite(a0).all() and np.isfinite(a5).all()
    assert not np.allclose(a0, a5), \
        "non-zero baseline must change the attribution"


def test_shapley_default_baseline_unchanged():
    """The batch adapter calls _shapley_jit without a baseline — that path
    must still mean 'zero baseline' and match the public default."""
    from xai_tpu.methods import ablation as AB
    b = tiny_bundle(hw=16)
    x = jnp.asarray(np.random.RandomState(1).randn(16, 16, 3), jnp.float32)
    mask = AB.patch_mask(16, 4)
    n = 16
    perms = jax.vmap(lambda k: jax.random.permutation(k, n))(
        jax.random.split(jax.random.PRNGKey(0), 3))
    legacy = AB._shapley_jit(b.apply, b.params, x, mask, 1, perms, n, 17)
    public = AB.shapley_sampling(b, x, 1, jax.random.PRNGKey(0),
                                 num_patches=4, n_samples=3, chunk=17)
    np.testing.assert_allclose(np.asarray(legacy), np.asarray(public),
                               rtol=1e-6, atol=1e-7)


def test_lime_accepts_typed_prng_keys():
    from xai_tpu.methods.lime import lime
    b = tiny_bundle(hw=16)
    img = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32)
    m_old = lime(b, img, jax.random.PRNGKey(3), num_samples=32, chunk=16)
    m_new = lime(b, img, jax.random.key(3), num_samples=32, chunk=16)
    np.testing.assert_array_equal(m_old, m_new)


def test_xrai_nan_attr_degrades_not_crashes():
    from xai_tpu.methods.xrai import xrai_full
    attr = np.full((16, 16), np.nan)
    left = np.zeros((16, 16), bool)
    left[:, :8] = True
    out = xrai_full(attr, [left, ~left], min_pixel_diff=10)
    assert out.shape == (16, 16)          # used to KeyError: None


def test_tis_dead_token_stays_finite():
    from xai_tpu.models import vit as vitmod
    import xai_tpu.models.common as mc
    from xai_tpu.methods.tis import tis
    cfg = vitmod.ViTConfig(patch=8, embed_dim=32, depth=2, num_heads=4,
                           num_classes=7, img_hw=32)
    model = vitmod.VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    meta = mc.ModelMeta(name="tisvit", family="vit", img_hw=32,
                        num_classes=7, num_patches=4)
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
    # centroids that NEVER select token 0 into any top-50% set
    rs = np.random.RandomState(7)
    cents = rs.rand(4, 16).astype(np.float32)
    cents[:, 0] = -10.0
    sal = np.asarray(tis(b, x, n_masks=4, batch_size=4, centroids=cents))
    assert sal.shape == (4, 4)
    assert np.isfinite(sal).all()         # token 0 used to NaN the map
    assert sal.reshape(-1)[0] == sal.min()


@pytest.mark.parametrize("name", ["idg", "idgi", "agi"])
def test_batched_attr_dtype_reaches(name):
    """--attr_dtype bf16 must actually reach idg/idgi/agi (it was silently
    dropped: full-f32 sweeps behind a bf16-labelled run)."""
    from xai_tpu.methods import batch as BT
    b = tiny_bundle(hw=16)
    rs = np.random.RandomState(0)
    xs = rs.rand(2, 16, 16, 3).astype(np.float32)
    targets = np.array([1, 4])
    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(2)])
    got = BT.batch_attribution("cnn", name, b, xs, xs, targets, keys,
                               img_hw=16, steps=8, dtype=jnp.bfloat16)
    got = np.asarray(got)
    assert got.shape == (2, 16, 16)
    assert np.isfinite(got).all()


def test_adapter_cache_is_bounded_lru():
    from xai_tpu.methods import batch as BT
    BT._ADAPTER_CACHE.clear()
    anchors = [object() for _ in range(BT._ADAPTER_CACHE_CAP + 5)]
    for i, a in enumerate(anchors):
        BT._cached_vmapped(f"m{i}", a, (), lambda: (lambda p, x, t, k, e: x))
    assert len(BT._ADAPTER_CACHE) <= BT._ADAPTER_CACHE_CAP
    # freshest entry hits without re-invoking make
    sentinel = []
    fn1 = BT._cached_vmapped(f"m{len(anchors) - 1}", anchors[-1], (),
                             lambda: sentinel.append(1))
    assert fn1 is not None and not sentinel, "hit must not re-run make"
    # evicted oldest rebuilds cleanly
    fn0 = BT._cached_vmapped("m0", anchors[0], (),
                             lambda: (lambda p, x, t, k, e: x))
    assert fn0 is not None
    BT._ADAPTER_CACHE.clear()


def test_cast_cache_is_bounded_lru():
    from xai_tpu.methods import gradient as G
    bundles = [tiny_bundle(hw=8, seed=i) for i in range(G._CAST_CACHE_CAP + 4)]
    for bb in bundles:
        G._cast_params_cached(bb, jnp.bfloat16)
    assert len(G._CAST_CACHE) <= G._CAST_CACHE_CAP
    # the most recent entry still hits (identity, no recast)
    c1 = G._cast_params_cached(bundles[-1], jnp.bfloat16)
    c2 = G._cast_params_cached(bundles[-1], jnp.bfloat16)
    assert c1 is c2
    # the evicted oldest entry recasts without error
    c3 = G._cast_params_cached(bundles[0], jnp.bfloat16)
    assert jax.tree.leaves(c3)[0].dtype == jnp.bfloat16
