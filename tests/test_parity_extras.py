"""Tests for pgd_attack, xrai_fast, LRP variants, embeddings capture."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xai_tpu.methods.adversarial import pgd_attack
from xai_tpu.methods.xrai import xrai_fast, xrai_full
from xai_tpu.methods import vit_lrp as VL
from xai_tpu.metrics.classic import MASMetric

from tiny_models import tiny_bundle

HW = 16


def test_pgd_attack_ball_and_effect():
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, HW, HW, 3), jnp.float32)
    labels = jnp.asarray([1, 2])
    adv = pgd_attack(b.apply, b.params, x, labels, eps=0.1, iters=5)
    d = np.abs(np.asarray(adv - x))
    assert d.max() <= 0.1 + 1e-6
    assert np.asarray(adv).min() >= 0 and np.asarray(adv).max() <= 1
    # loss increased (attack ascends CE)
    def ce(imgs):
        lg = b.apply(b.params, imgs)
        lp = jax.nn.log_softmax(lg)
        return float(-jnp.take_along_axis(lp, labels[:, None], 1).mean())
    assert ce(adv) >= ce(x) - 1e-5


def test_xrai_fast_close_to_full_on_disjoint_segments():
    rs = np.random.RandomState(1)
    attr = rs.rand(32, 32)
    segs = []
    for i in range(4):
        for j in range(4):
            m = np.zeros((32, 32), bool)
            m[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = True
            segs.append(m)
    a = xrai_full(attr, segs, min_pixel_diff=1)
    b = xrai_fast(attr, segs, min_pixel_diff=1)
    # disjoint segments: both reduce to per-segment means
    assert np.allclose(a, b)


@pytest.fixture(scope="module")
def small_vit():
    from xai_tpu.models import vit as vitmod
    from xai_tpu.models.common import ModelBundle, ModelMeta
    cfg = vitmod.ViTConfig(patch=8, embed_dim=32, depth=2, num_heads=4,
                           num_classes=9, img_hw=32)
    model = vitmod.VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    meta = ModelMeta(name="v", family="vit", img_hw=32, num_classes=9,
                     num_patches=4)
    return ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: model.apply({"params": p}, x),
        apply_taps=lambda p, x: model.apply({"params": p}, x, taps=True),
        apply_probed=lambda p, x, pr: model.apply({"params": p}, x,
                                                  probes=pr, taps=True),
        extras=cfg)


def test_lrp_variants(small_vit):
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3),
                    jnp.float32)
    ro = VL.lrp_rollout(small_vit, x, 3)
    assert ro.shape == (4, 4) and np.isfinite(np.asarray(ro)).all()
    ll = VL.lrp_layer(small_vit, x, 3, layer=-1)
    assert ll.shape == (4, 4)
    la = VL.lrp_layer(small_vit, x, 3, layer=1, is_ablation=True)
    assert la.shape == (4, 4)
    full = VL.lrp_full(small_vit, x, 3)
    assert full.shape == (32, 32)
    assert np.isfinite(np.asarray(full)).all()
    assert float(jnp.abs(full).sum()) > 0


def test_mas_embeddings_capture(small_vit):
    rs = np.random.RandomState(3)
    x = rs.randn(32, 32, 3).astype(np.float32)
    sal = rs.rand(32, 32)
    m = MASMetric(small_vit, 32 * 32, "del", 32, lambda im: im * 0.0)
    embs, classes, resp, flip = m.single_run_embeddings(x, sal,
                                                        max_batch_size=11)
    assert embs.shape == (2, 33, 17, 32)       # [L, steps+1, N, D]
    assert classes.shape == (33,)
    assert resp.shape == (33,)
    assert np.isfinite(embs).all()


def test_hm_to_rgb_matches_reference():
    """render.hm_to_rgb (evaluations/utils/render.py:153-216), the heatmap
    colorizer the reference's HDF5 results reader uses."""
    import numpy as np
    from tests import reference_loader as rl
    from xai_tpu.utils.visualization import hm_to_rgb
    ref = rl.load_ref("XAI_Survey/evaluations/utils/render.py",
                      "_ref_render")
    R = np.random.RandomState(0).randn(14, 14)
    for cmap in ("seismic", "bwr"):
        want = ref.hm_to_rgb(R.copy(), scaling=3, sigma=1, cmap=cmap)
        got = hm_to_rgb(R.copy(), scaling=3, sigma=1, cmap=cmap)
        assert np.abs(want - got).max() == 0.0

def test_hm_to_rgb_canny_outline():
    """The outline path the reference documents (X/sigma params,
    render.py:153-216; the canny draw is commented out upstream, the
    documented ``rgb *= ~edges`` semantics are implemented natively):
    edges of X become black pixels, flat regions are untouched."""
    import numpy as np
    from xai_tpu.utils.render import canny
    from xai_tpu.utils.visualization import hm_to_rgb

    X = np.zeros((28, 28))
    X[8:20, 8:20] = 1.0                       # sharp square -> clean edges
    edges = canny(X, sigma=1.0)
    assert edges.any()
    # edges live near the square boundary, not in the flat corners
    assert not edges[:4, :4].any() and not edges[-4:, -4:].any()
    yy, xx = np.nonzero(edges)
    assert yy.min() >= 5 and yy.max() <= 22

    R = np.random.RandomState(0).randn(28, 28)
    plain = hm_to_rgb(R.copy(), scaling=1)
    outlined = hm_to_rgb(R.copy(), X=X, scaling=1, sigma=1.0)
    e1 = canny(X, sigma=1.0)
    assert np.all(outlined[e1] == 0.0)        # outline pixels are black
    assert np.allclose(outlined[~e1], plain[~e1])  # others untouched

    # constant template: no edges, bit-identical output
    same = hm_to_rgb(R.copy(), X=np.zeros((28, 28)), scaling=1)
    assert np.abs(same - plain).max() == 0.0
