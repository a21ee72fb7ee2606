"""Batched multi-image attribution == stacked single-image attribution.

Covers methods/batch.py (the production --image_batch path): every batched
implementation must reproduce the per-image fused path bit-for-bit (same
PRNG keys) up to float reassociation from the different chunk layouts.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xai_tpu.methods import ablation as AB
from xai_tpu.methods import batch as BT
from xai_tpu.methods import gradient as G
from xai_tpu.methods import guided as GD
from xai_tpu.methods.agi import agi as agi_single
from xai_tpu.methods.gig import guided_ig
from xai_tpu.methods.gradient import to_saliency
from xai_tpu.ops.resize import resize_bilinear

from tiny_models import tiny_bundle

HW = 16
B = 3
STEPS = 8


@pytest.fixture(scope="module")
def cnn_setup():
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(0)
    xs = rs.randn(B, HW, HW, 3).astype(np.float32)
    targets = np.array([1, 4, 7])
    keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(0), i))
                     for i in range(B)])
    return b, xs, targets, keys


def _batch(b, xs, targets, keys, name, **kw):
    return BT.batch_attribution("cnn", name, b, xs, xs, targets, keys,
                                img_hw=HW, steps=STEPS, **kw)


def test_grad_family_batch(cnn_setup):
    b, xs, targets, keys = cnn_setup
    for name, single in [
        ("grad", lambda x, t, k: to_saliency(G.grad(b, x, t))),
        ("inp_x_grad", lambda x, t, k: to_saliency(G.inp_x_grad(b, x, t))),
        ("ig", lambda x, t, k: to_saliency(
            G.ig(b, x, t, STEPS, 1.0, 0.0))),
        ("lig", lambda x, t, k: to_saliency(
            G.ig(b, x, t, STEPS, 0.9, 0.0))),
        ("idg", lambda x, t, k: to_saliency(
            G.idg(b, x, t, STEPS, 0.0))),
        ("idgi", lambda x, t, k: to_saliency(
            G.idgi(b, x, t, STEPS, 0.0))),
    ]:
        got = _batch(b, xs, targets, keys, name)
        assert got.shape == (B, HW, HW), name
        for i in range(B):
            want = np.asarray(single(xs[i], int(targets[i]), keys[i]))
            np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=2e-3,
                                       err_msg=name)


def test_sg_batch_matches_single(cnn_setup):
    b, xs, targets, keys = cnn_setup
    got = _batch(b, xs, targets, keys, "sg")
    for i in range(B):
        want = to_saliency(G.smooth_grad(
            b, xs[i], int(targets[i]), jnp.asarray(keys[i]), "IG", STEPS,
            0.0))
        np.testing.assert_allclose(got[i], np.asarray(want), atol=2e-4,
                                   rtol=2e-3)


def test_guided_and_cam_batch(cnn_setup):
    b, xs, targets, keys = cnn_setup
    singles = {
        "gbp": lambda x, t, k: to_saliency(GD.guided_backprop(b, x, t)),
        "gc": lambda x, t, k: to_saliency(
            GD.grad_cam(b, x, t, img_hw=HW)),
        "ggc": lambda x, t, k: to_saliency(
            GD.guided_grad_cam(b, x, t, img_hw=HW)),
    }
    for name, single in singles.items():
        got = _batch(b, xs, targets, keys, name)
        for i in range(B):
            want = np.asarray(single(xs[i], int(targets[i]), keys[i]))
            np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=2e-3,
                                       err_msg=name)


def test_gs_batch_matches_single(cnn_setup):
    b, xs, targets, keys = cnn_setup
    got = _batch(b, xs, targets, keys, "gs")
    from xai_tpu.methods.ablation import gradient_shap
    for i in range(B):
        want = to_saliency(gradient_shap(b, xs[i], int(targets[i]),
                                         jnp.asarray(keys[i])))
        np.testing.assert_allclose(got[i], np.asarray(want), atol=2e-4,
                                   rtol=2e-3)


def test_mask_methods_batch(cnn_setup):
    b, xs, targets, keys = cnn_setup
    opts = {"num_patches": 4, "occ_window": 8, "occ_stride": 4,
            "shap_samples": 5}

    def du(a):
        return np.asarray(BT._down_up(jnp.asarray(a), HW, 4))

    got = _batch(b, xs, targets, keys, "fa", opts=opts)
    for i in range(B):
        want = to_saliency(du(AB.feature_ablation(
            b, xs[i], int(targets[i]), num_patches=4, chunk=16)))
        np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=2e-3)

    got = _batch(b, xs, targets, keys, "occ", opts=opts)
    for i in range(B):
        want = to_saliency(du(AB.occlusion(
            b, xs[i], int(targets[i]), window=8, stride=4, chunk=9)))
        np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=2e-3)

    got = _batch(b, xs, targets, keys, "shap", opts=opts)
    for i in range(B):
        want = to_saliency(AB.shapley_sampling(
            b, xs[i], int(targets[i]), jnp.asarray(keys[i]), num_patches=4,
            n_samples=5, chunk=16))
        np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=2e-3)


def test_gig_batch_matches_single(cnn_setup):
    b, xs, targets, keys = cnn_setup
    got = _batch(b, xs, targets, keys, "gig")
    for i in range(B):
        want = np.abs(guided_ig(b, xs[i], int(targets[i]),
                                steps=STEPS).sum(-1))
        np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=2e-3)


def test_agi_batch_matches_single(cnn_setup):
    b, _, _, keys = cnn_setup
    rs = np.random.RandomState(1)
    imgs01 = rs.rand(B, HW, HW, 3).astype(np.float32)
    got = BT.batch_attribution("cnn", "agi", b, imgs01, imgs01,
                               np.zeros(B, int), keys, img_hw=HW)
    for i in range(B):
        want = np.abs(agi_single(b, imgs01[i]))
        np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=2e-3)


def test_lime_batch_matches_single(cnn_setup):
    from xai_tpu.methods.lime import lime
    b, _, _, keys = cnn_setup
    rs = np.random.RandomState(2)
    imgs01 = rs.rand(B, HW, HW, 3).astype(np.float32)
    got = BT.batch_attribution("cnn", "lime", b, imgs01, imgs01,
                               np.zeros(B, int), keys, img_hw=HW)
    for i in range(B):
        want = 3.0 * lime(b, imgs01[i], keys[i])
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_no_batch_impl_returns_none(cnn_setup):
    b, xs, targets, keys = cnn_setup
    assert BT.batch_attribution("cnn", "mda", b, xs, xs, targets,
                                keys) is None
    assert not BT.has_batch_impl("cnn", "xrai")
    assert BT.has_batch_impl("cnn", "ig")
    assert BT.has_batch_impl("cnn", "lime")
    assert BT.has_batch_impl("vit", "rollout")
    assert BT.has_batch_impl("clip", "eclip")


# ---------------------------------------------------------------------------
# ViT explainers
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vit_setup():
    from xai_tpu.models import vit as vitmod
    from xai_tpu.models.common import jit_bundle, ModelMeta

    cfg = vitmod.ViTConfig(patch=8, embed_dim=32, depth=2, num_heads=4,
                           mlp_ratio=2.0, num_classes=16, img_hw=32)
    model = vitmod.VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    meta = ModelMeta(name="tinyvit", family="vit", img_hw=32,
                     num_classes=16, num_patches=4, batch_size=8)
    b = jit_bundle(
        meta=meta, params=params,
        apply=lambda p, x: model.apply({"params": p}, x),
        apply_taps=lambda p, x: model.apply({"params": p}, x, taps=True),
        apply_probed=lambda p, x, pr: model.apply({"params": p}, x,
                                                  probes=pr, taps=True),
        extras=cfg)
    rs = np.random.RandomState(2)
    xs = rs.randn(B, 32, 32, 3).astype(np.float32)
    targets = np.array([3, 0, 11])
    keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(1), i))
                     for i in range(B)])
    return b, xs, targets, keys


VIT_NAMES = ["attn", "grad", "cam_attn", "n_rollout", "rollout", "t_attn",
             "attn_ig", "attn_attr", "bi_attn", "InFlow", "t_attr"]


@pytest.mark.parametrize("name", VIT_NAMES)
def test_vit_batch_matches_single(vit_setup, name):
    from xai_tpu.methods import vit_explain as VE
    from xai_tpu.methods.vit_lrp import transformer_attribution

    b, xs, targets, keys = vit_setup
    singles = {
        "attn": lambda x, t: VE.raw_attn(b, x),
        "grad": lambda x, t: VE.attn_grad(b, x, t),
        "cam_attn": lambda x, t: VE.cam_attn(b, x, t),
        "n_rollout": lambda x, t: VE.naive_rollout(b, x),
        "rollout": lambda x, t: VE.rollout(b, x),
        "t_attn": lambda x, t: VE.transition_attention(b, x, t),
        "attn_ig": lambda x, t: VE.attn_ig(b, x, t),
        "attn_attr": lambda x, t: VE.attn_attr(b, x, t),
        "bi_attn": lambda x, t: VE.bidirectional(b, x, t),
        "InFlow": lambda x, t: VE.rave(b, x, t),
        "t_attr": lambda x, t: transformer_attribution(b, x, t),
    }
    got = BT.batch_attribution("vit", name, b, xs, xs, targets, keys,
                               img_hw=32)
    assert got.shape == (B, 32, 32)
    for i in range(B):
        patch = singles[name](xs[i], int(targets[i]))
        want = np.abs(np.asarray(resize_bilinear(patch, (32, 32))))
        np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=2e-3,
                                   err_msg=name)


# ---------------------------------------------------------------------------
# CLIP dense explainers
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clip_setup():
    from xai_tpu.models import clip as clipmod
    from xai_tpu.models.common import ModelBundle, ModelMeta

    cfg = clipmod.CLIPConfig(patch=8, vision_width=32, vision_layers=2,
                             vision_heads=4, embed_dim=16, text_width=16,
                             text_heads=2, text_layers=2, vocab_size=50,
                             context_length=12, img_hw=32)
    jm = clipmod.CLIP(cfg)
    params = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                     jnp.zeros((1, 12), jnp.int32))["params"]
    te = jax.random.normal(jax.random.PRNGKey(3), (10, cfg.embed_dim))
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    meta = ModelMeta(name="smallclip", family="clip", img_hw=32,
                     num_patches=4, num_classes=10)

    def encode_image(p, x):
        return jm.apply({"params": p}, x,
                        method=clipmod.CLIP.encode_image)[:, 0]

    b = ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: encode_image(p, x) @ te.T / 0.1,
        apply_taps=jax.jit(lambda p, x: jm.apply(
            {"params": p}, x, taps=True, method=clipmod.CLIP.encode_image)),
        extras={"cfg": cfg, "model": jm, "text_embeddings": te,
                "encode_image": encode_image})
    rs = np.random.RandomState(4)
    xs = rs.randn(B, 32, 32, 3).astype(np.float32)
    targets = np.array([0, 5, 9])
    txt = np.asarray(te)[targets]
    toks = np.array([[1, 5, 9, 49, 0, 0, 0, 0, 0, 0, 0, 0],
                     [3, 7, 49, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                     [2, 4, 6, 8, 49, 0, 0, 0, 0, 0, 0, 0]], np.int32)
    keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(2), i))
                     for i in range(B)])
    extras = {"txt_emb": txt, "text_tokens": toks}
    return b, xs, targets, keys, extras


CLIP_NAMES = ["eclip", "eclip_nograd", "eclip_wo", "maskclip", "selfattn",
              "grad_cam", "game", "rollout", "lrp"]


@pytest.mark.parametrize("name", CLIP_NAMES)
def test_clip_batch_matches_single(clip_setup, name):
    from xai_tpu.methods import clip_explain as CE

    b, xs, targets, keys, extras = clip_setup
    singles = {
        "eclip": lambda x, txt, tok: CE.grad_eclip(b, x, txt),
        "eclip_nograd": lambda x, txt, tok: CE.grad_eclip(
            b, x, txt, withgrad=False),
        "eclip_wo": lambda x, txt, tok: CE.grad_eclip(
            b, x, txt, withksim=False),
        "maskclip": lambda x, txt, tok: CE.mask_clip(b, x, txt),
        "selfattn": lambda x, txt, tok: CE.self_attn(b, x),
        "grad_cam": lambda x, txt, tok: CE.clip_grad_cam(b, x, txt),
        "game": lambda x, txt, tok: CE.game(b, x, tok[None]),
        "rollout": lambda x, txt, tok: CE.clip_rollout(b, x, tok[None]),
        "lrp": lambda x, txt, tok: CE.clip_lrp(b, x, tok[None])[1],
    }
    got = BT.batch_attribution("clip", name, b, xs, xs, targets, keys,
                               extras=extras, img_hw=32)
    assert got.shape == (B, 32, 32)
    for i in range(B):
        patch = singles[name](xs[i], extras["txt_emb"][i],
                              extras["text_tokens"][i])
        want = np.abs(np.asarray(resize_bilinear(jnp.asarray(patch),
                                                 (32, 32))))
        np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=2e-3,
                                   err_msg=name)


def test_bf16_batch_rank_stable(cnn_setup):
    """bf16 sweep keeps the saliency ordering essentially intact on the
    tiny model (the production operating point contract)."""
    b, xs, targets, keys = cnn_setup
    f32 = _batch(b, xs, targets, keys, "ig")
    bf16 = _batch(b, xs, targets, keys, "ig", dtype=jnp.bfloat16)
    from scipy.stats import spearmanr
    for i in range(B):
        rho = spearmanr(f32[i].ravel(), bf16[i].ravel()).statistic
        assert rho > 0.98, rho


def test_bf16_tolerances_recorded():
    """Per-method bf16-vs-f32 contracts for the production bf16 paths:
    rank correlation of the saliency orderings (what every ranked-reveal
    metric consumes) must stay above the bounds recorded here."""
    from scipy.stats import spearmanr

    from xai_tpu.methods.lime import lime
    from xai_tpu.methods.vit_cx import vit_cx

    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(9)
    xs = rs.randn(2, HW, HW, 3).astype(np.float32)
    targets = np.array([2, 5])
    keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(7),
                                                   i)) for i in range(2)])
    bounds = {}
    for name in ("ig", "lig", "sg"):
        f32 = _batch(b, xs, targets, keys, name)
        b16 = _batch(b, xs, targets, keys, name, dtype=jnp.bfloat16)
        rho = min(spearmanr(f32[i].ravel(), b16[i].ravel()).statistic
                  for i in range(2))
        bounds[name] = rho
        assert rho > 0.98, (name, rho)

    # LIME bf16: the output is a binary top-segment mask — require the
    # masks to agree on >=80% of pixels (probs noise can flip marginal
    # segment ranks on a random tiny model)
    img01 = rs.rand(HW, HW, 3).astype(np.float32)
    m32 = lime(b, img01, jax.random.PRNGKey(1), num_samples=200)
    m16 = lime(b, img01, jax.random.PRNGKey(1), num_samples=200,
               dtype=jnp.bfloat16)
    assert (m32 == m16).mean() > 0.8

    # ViT-CX bf16 on a tiny ViT
    from xai_tpu.models import vit as vitmod
    from xai_tpu.models.common import jit_bundle, ModelMeta
    cfg = vitmod.ViTConfig(patch=8, embed_dim=32, depth=2, num_heads=4,
                           mlp_ratio=2.0, num_classes=16, img_hw=32)
    model = vitmod.VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    vb = jit_bundle(
        meta=ModelMeta(name="tv", family="vit", img_hw=32, num_classes=16,
                       num_patches=4, batch_size=8),
        params=params,
        apply=lambda p, x: model.apply({"params": p}, x),
        apply_taps=lambda p, x: model.apply({"params": p}, x, taps=True),
        extras=cfg)
    xv = rs.randn(32, 32, 3).astype(np.float32)
    v32 = vit_cx(vb, xv, 3, key=jax.random.PRNGKey(2))
    v16 = vit_cx(vb, xv, 3, key=jax.random.PRNGKey(2),
                 dtype=jnp.bfloat16)
    rho = spearmanr(v32.ravel(), v16.ravel()).statistic
    assert rho > 0.9, rho

    # generic vmapped adapters under dtype=bf16 (ViT explainer example)
    vb2 = dataclasses.replace(vb, apply_probed=lambda p, x, pr: model.apply(
        {"params": p}, x, probes=pr, taps=True))
    xsv = rs.randn(2, 32, 32, 3).astype(np.float32)
    tv = np.array([1, 9])
    kv = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(5), i))
                   for i in range(2)])
    r32 = BT.batch_attribution("vit", "rollout", vb2, xsv, xsv, tv, kv,
                               img_hw=32)
    r16 = BT.batch_attribution("vit", "rollout", vb2, xsv, xsv, tv, kv,
                               img_hw=32, dtype=jnp.bfloat16)
    for i in range(2):
        rho = spearmanr(r32[i].ravel(), r16[i].ravel()).statistic
        assert rho > 0.95, rho


def test_vit_cx_batch_matches_single(vit_setup):
    """vit_cx_batch == per-image vit_cx when each image is fed the same
    noise slice the batch draw produces (clustering is bit-identical: the
    triangle-packed similarity download carries the exact same values)."""
    from xai_tpu.methods.vit_cx import vit_cx, vit_cx_batch

    b, _, _, _ = vit_setup
    rs = np.random.RandomState(4)
    xs = rs.randn(3, 32, 32, 3).astype(np.float32)
    key = jax.random.PRNGKey(21)

    got = vit_cx_batch(b, xs, key=key)
    assert got.shape == (3, 32, 32)

    # reproduce the batch path's noise draw; tiny ViT: D=32 masks -> every
    # image's cluster count K <= 32 -> one shared Kp=64 bucket
    Kp = 64
    noise = np.asarray(jax.random.normal(key, (3, Kp, 32, 32, 3)) * 0.1)
    for i in range(3):
        m1, tri, probs0 = __import__(
            "xai_tpu.methods.vit_cx", fromlist=["x"])._masks_and_sim_jit(
                b.apply_taps, b.params, jnp.asarray(xs[i])[None], 32)
        from xai_tpu.methods.vit_cx import _cluster_host
        labels = _cluster_host(np.asarray(tri), m1.shape[0], 0.1)
        K = int(labels.max()) + 1
        want = vit_cx(b, xs[i], noise=noise[i, :K])
        np.testing.assert_allclose(got[i], want, atol=5e-5, rtol=1e-4)


def test_vit_cx_cluster_matches_sklearn():
    """_cluster_host (scipy linkage + transliterated _hc_cut) must be
    label-for-label identical to the reference's sklearn call, including
    on tie-rich matrices (quantized distances)."""
    from sklearn.cluster import AgglomerativeClustering

    from xai_tpu.methods.vit_cx import _cluster_host

    rs = np.random.RandomState(0)
    for trial in range(8):
        D = 100 if trial < 4 else 300
        m = rs.rand(D, D).astype(np.float32)
        if trial % 2:
            m = np.round(m * 8) / 8          # force merge-distance ties
        sym = (m + m.T) / 2
        iu, ju = np.triu_indices(D, k=1)
        sim = 1.0 - sym                       # _cluster_host takes sims
        tri = sim[iu, ju]
        thr = 0.1 if trial % 3 else 0.4
        dist = sym.copy()
        np.fill_diagonal(dist, 0.0)
        want = AgglomerativeClustering(
            n_clusters=None, distance_threshold=thr,
            metric="precomputed", linkage="complete").fit(dist).labels_
        got = _cluster_host(tri, D, thr)
        np.testing.assert_array_equal(got, want)


def test_vit_cx_registry_batch_matches_sequential(vit_setup):
    """The production --image_batch wiring: batch_attribution('vit',
    'VIT_CX') with per-image keys == the sequential registry entry
    (3 * |vit_cx|) bit-for-bit up to float tolerance (same noise draws,
    shared Kp bucket on the tiny model)."""
    from xai_tpu.methods.vit_cx import vit_cx

    b, _, _, _ = vit_setup
    rs = np.random.RandomState(11)
    xs = rs.randn(3, 32, 32, 3).astype(np.float32)
    targets = np.array([2, 7, 11])
    keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(3),
                                                   i)) for i in range(3)])
    got = BT.batch_attribution("vit", "VIT_CX", b, xs, xs, targets, keys,
                               img_hw=32)
    assert got.shape == (3, 32, 32)
    for i in range(3):
        want = 3.0 * np.abs(vit_cx(b, xs[i], int(targets[i]),
                                   key=jnp.asarray(keys[i], jnp.uint32)))
        np.testing.assert_allclose(got[i], want, atol=5e-5, rtol=1e-4)


def test_clip_m2ib_batch_matches_single(clip_setup):
    """Batched M2IB (vmapped IBA scan) == sequential vision_heatmap_iba:
    same noise streams (split(key, steps)), same Adam trajectory."""
    from xai_tpu.methods.clip_m2ib import vision_heatmap_iba

    b, xs, targets, keys, extras = clip_setup
    got = BT.batch_attribution("clip", "m2ib", b, xs, xs, targets, keys,
                               extras=extras, img_hw=32,
                               opts={"m2ib_vlayer": 0})
    assert got.shape == (B, 32, 32)
    for i in range(B):
        want = np.abs(vision_heatmap_iba(
            b, xs[i], extras["txt_emb"][i], vlayer=0, out_hw=32,
            key=jnp.asarray(keys[i], jnp.uint32)))
        np.testing.assert_allclose(got[i], want, atol=5e-5, rtol=1e-4)


def test_clip_surgery_batch_matches_sequential(clip_setup):
    """Batched surgery builds each image's text table (target first +
    other classes) on device exactly as the sequential registry entry."""
    from xai_tpu.registry import AttrContext
    from xai_tpu.registry_clip import _surgery_entry

    b, xs, targets, keys, extras = clip_setup
    got = BT.batch_attribution("clip", "surgery", b, xs, xs, targets, keys,
                               extras=extras, img_hw=32)
    assert got.shape == (B, 32, 32)
    for i in range(B):
        ctx = AttrContext(bundle=b, x=jnp.asarray(xs[i]), trans_img=xs[i],
                          target=int(targets[i]),
                          key=jnp.asarray(keys[i], jnp.uint32), img_hw=32,
                          extras={})
        want = _surgery_entry(ctx)
        np.testing.assert_allclose(got[i], want, atol=5e-5, rtol=1e-4)
