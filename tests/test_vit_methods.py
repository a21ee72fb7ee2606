"""ViT explainer tests: numpy oracles for the rollout algebra, conservation
properties for the LRP rules, end-to-end shape/finiteness on a small ViT."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xai_tpu.models import vit as vitmod
from xai_tpu.methods import vit_explain as VE
from xai_tpu.methods import vit_lrp as VL


@pytest.fixture(scope="module")
def small_vit():
    cfg = vitmod.ViTConfig(patch=8, embed_dim=32, depth=3, num_heads=4,
                           num_classes=13, img_hw=32)
    model = vitmod.VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    from xai_tpu.models.common import ModelBundle, ModelMeta
    meta = ModelMeta(name="smallvit", family="vit", img_hw=32,
                     num_classes=13, num_patches=4, batch_size=8,
                     mean=(0.5,) * 3, std=(0.5,) * 3)

    def apply(p, x):
        return model.apply({"params": p}, x)

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True)

    def apply_probed(p, x, probes):
        return model.apply({"params": p}, x, probes=probes, taps=True)

    return ModelBundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, apply_probed=apply_probed,
                       extras=cfg)


@pytest.fixture(scope="module")
def x32():
    return jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                       jnp.float32)


def test_attn_grads_match_direct_jacobian(small_vit, x32):
    """Probe gradients == finite-difference of logit w.r.t. attention."""
    taps, grads = VE.collect(small_vit, x32, 5)
    assert grads.shape == taps["attn"].shape
    # directional finite difference along a random direction in block 1 attn
    rs = np.random.RandomState(1)
    direction = jnp.asarray(rs.randn(*taps["attn"][1].shape), jnp.float32)
    eps = 1e-3
    probes = vitmod.zero_probes(small_vit.extras, 1)

    def f(t):
        pr = dict(probes)
        pr["attn"] = probes["attn"].at[1].set(t * direction)
        logits, _ = small_vit.apply_probed(small_vit.params, x32, pr)
        return logits[0, 5]

    fd = (f(eps) - f(-eps)) / (2 * eps)
    want = float((grads[1] * direction).sum())
    assert abs(float(fd) - want) < 5e-3 * max(1, abs(want))


def _np_rollout_residual(mats):
    n = mats.shape[-1]
    aug = mats + np.eye(n)
    aug = aug / aug.sum(-1, keepdims=True)
    joint = aug[0]
    for i in range(1, len(aug)):
        joint = aug[i] @ joint
    return joint


def test_rollout_matches_numpy_oracle(small_vit, x32):
    _, taps = small_vit.apply_taps(small_vit.params, x32)
    mats = np.asarray(taps["attn"].mean(axis=2))    # [L, B, N, N]
    want = _np_rollout_residual(mats[:, 0])
    got = np.asarray(VE.rollout_residual(jnp.asarray(mats))[0])
    assert np.allclose(got, want, atol=1e-5)
    # naive
    joint = mats[0, 0]
    for i in range(1, len(mats)):
        joint = mats[i, 0] @ joint
    got_n = np.asarray(VE.rollout_naive(jnp.asarray(mats))[0])
    assert np.allclose(got_n, joint, atol=1e-5)


def test_bidirectional_matches_numpy_oracle(small_vit, x32):
    """The R-accumulation formula vs a direct numpy transliteration of
    ViT_explanation_generator.py:429-441 on identical taps/grads."""
    target = 3
    taps, grads = VE.collect(small_vit, x32, target)
    attn = np.asarray(taps["attn"])
    g = np.asarray(grads)
    L, B, H, N, _ = attn.shape
    start_layer = 2
    R = np.eye(N)[None]
    for nb in range(L):
        if nb < start_layer - 1:
            continue
        cam = attn[nb].reshape(-1, N, N)
        gr = g[nb].reshape(-1, N, N)
        Ih = np.abs(np.matmul(cam.transpose(0, 2, 1), gr)).mean(axis=(1, 2))
        Ih = Ih / Ih.sum()
        cam_w = (Ih @ cam.reshape(H, -1)).reshape(N, N)
        R = R + np.matmul(cam_w[None], R)
    cams = VE._head_weighted_cams(taps, grads, start_layer)
    Rj = jnp.eye(N)[None]
    for cam in cams:
        if cam is None:
            continue
        Rj = Rj + jnp.einsum("nm,bmk->bnk", cam, Rj)
    assert np.allclose(np.asarray(Rj), R, atol=1e-4)


def test_linear_rp_conservation():
    """alpha1beta0 Linear rule conserves total relevance for positive X, W."""
    rs = np.random.RandomState(2)
    X = jnp.asarray(np.abs(rs.randn(4, 6)), jnp.float32)
    K = jnp.asarray(np.abs(rs.randn(6, 5)), jnp.float32)
    R = jnp.asarray(np.abs(rs.randn(4, 5)), jnp.float32)
    R_in = VL._linear_rp(R, X, K)
    assert abs(float(R_in.sum()) - float(R.sum())) < 1e-4


def test_add_rp_conserves_total():
    rs = np.random.RandomState(3)
    X0 = jnp.asarray(np.abs(rs.randn(2, 7)), jnp.float32)
    X1 = jnp.asarray(np.abs(rs.randn(2, 7)), jnp.float32)
    R = jnp.asarray(np.abs(rs.randn(2, 7)), jnp.float32)
    a, b = VL._add_rp(R, X0, X1)
    assert abs(float(a.sum() + b.sum()) - float(R.sum())) < 1e-4


def test_transformer_attribution_runs(small_vit, x32):
    m = VL.transformer_attribution(small_vit, x32, 2)
    assert m.shape == (4, 4)
    arr = np.asarray(m)
    assert np.isfinite(arr).all()
    assert (arr >= 0).all()          # clamp(0) + nonneg rollout
    assert arr.sum() > 0


@pytest.mark.parametrize("fn_name", [
    "raw_attn", "naive_rollout", "rollout", "inflow_rollout"])
def test_gradfree_explainers_shapes(small_vit, x32, fn_name):
    fn = getattr(VE, fn_name)
    m = fn(small_vit, x32)
    assert m.shape == (4, 4)
    assert np.isfinite(np.asarray(m)).all()


@pytest.mark.parametrize("fn_name,kwargs", [
    ("attn_grad", {}), ("cam_attn", {}),
    ("transition_attention", {"steps": 4}),
    ("attn_ig", {"steps": 4}), ("attn_attr", {}),
    ("bidirectional", {"steps": 4, "start_layer": 2}),
    ("rave", {}),
])
def test_grad_explainers_shapes(small_vit, x32, fn_name, kwargs):
    fn = getattr(VE, fn_name)
    m = fn(small_vit, x32, 1, **kwargs)
    assert m.shape == (4, 4)
    assert np.isfinite(np.asarray(m)).all()
