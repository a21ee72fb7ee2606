"""CNN perturbation/guided method tests vs closed forms and torch oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from xai_tpu.methods import ablation as A
from xai_tpu.methods import guided as GD
from xai_tpu.methods import rise as R
from xai_tpu.methods.agi import agi
from xai_tpu.methods.gig import guided_ig

from tiny_models import tiny_bundle, linear_bundle

HW = 16


def test_guided_relu_rule_matches_torch():
    """Guided BP on a 1-layer relu net == torch with the classic hook rule."""
    rs = np.random.RandomState(0)
    W = rs.randn(12, 8).astype(np.float32)
    x0 = rs.randn(8).astype(np.float32)
    V = rs.randn(12, 3).astype(np.float32)

    def japply(p, x):
        h = GD.guided_relu(x @ jnp.asarray(W.T))
        return h @ jnp.asarray(V)

    g = jax.grad(lambda x: japply(None, x)[1])(jnp.asarray(x0))

    xt = torch.tensor(x0, requires_grad=True)
    h = F.relu(xt @ torch.tensor(W.T))
    # classic guided rule applied manually: dh = relu_grad clamped to g>0
    out = h @ torch.tensor(V)
    go = torch.autograd.grad(out[1], h)[0]
    guided = (go.clamp(min=0) * (h > 0))
    want = guided @ torch.tensor(W)
    assert np.allclose(np.asarray(g), want.numpy(), atol=1e-5)


def test_guided_backprop_runs():
    b = tiny_bundle(hw=HW)
    x = jnp.asarray(np.random.RandomState(1).randn(HW, HW, 3), jnp.float32)
    g = GD.guided_backprop(b, x, 2)
    assert g.shape == (HW, HW, 3)
    assert np.isfinite(np.asarray(g)).all()


def test_gradcam_matches_manual():
    b = tiny_bundle(hw=HW)
    x = jnp.asarray(np.random.RandomState(2).randn(HW, HW, 3), jnp.float32)
    t = 1
    cam = GD._layer_gradcam(b.apply_probed, b.params, x, t, "layer4")
    # manual: for TinyCNN, logits = mean_spatial(A) @ Wfc + b, so
    # dlogit/dA = Wfc[:, t] / (h*w); weights = that; cam = relu(sum w_k A_k)
    _, taps = b.apply_taps(b.params, x[None])
    act = np.asarray(taps["layer4"][0])
    wfc = np.asarray(b.params["fc"]["kernel"])[:, t]
    h, w, _ = act.shape
    weights = wfc / (h * w)
    want = np.maximum((act * weights).sum(-1), 0)
    assert np.allclose(np.asarray(cam), want, atol=1e-5)


def test_guided_gradcam_shape():
    b = tiny_bundle(hw=HW)
    x = jnp.asarray(np.random.RandomState(3).randn(HW, HW, 3), jnp.float32)
    g = GD.guided_grad_cam(b, x, 0, img_hw=HW)
    assert g.shape == (HW, HW, 3)


def test_gradient_shap_linear():
    """For a linear model, E[grad * (x - b)] == W ⊙ (x - E[b_used])-ish;
    with stdev 0 the grad is constant W, so attr = W ⊙ mean(x - baseline)."""
    b = linear_bundle()
    x = jnp.asarray(np.random.RandomState(4).randn(8, 8, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    baselines = jnp.zeros((1, 8, 8, 3))
    attr = A.gradient_shap(b, x, 2, key, baselines=baselines, n_samples=7)
    W = np.asarray(b.params)[:, 2].reshape(8, 8, 3)
    assert np.allclose(np.asarray(attr), W * np.asarray(x), atol=1e-5)


def test_feature_ablation_linear_exact():
    """Linear model: ablating group g changes logit by exactly
    sum_{i in g} W_i x_i."""
    b = linear_bundle(hw=8)
    x = jnp.asarray(np.random.RandomState(5).randn(8, 8, 3), jnp.float32)
    t = 1
    attr = A.feature_ablation(b, x, t, num_patches=4, chunk=16)
    W = np.asarray(b.params)[:, t].reshape(8, 8, 3)
    contrib = (W * np.asarray(x)).sum(-1)          # [8, 8] pixel contribution
    mask = np.asarray(A.patch_mask(8, 4))
    want = np.zeros((8, 8))
    for g in range(16):
        want[mask == g] = contrib[mask == g].sum()
    got = np.asarray(attr)[..., 0]
    assert np.allclose(got, want, atol=1e-4)


def test_occlusion_linear():
    b = linear_bundle(hw=8)
    x = jnp.asarray(np.random.RandomState(6).randn(8, 8, 3), jnp.float32)
    t = 0
    attr = A.occlusion(b, x, t, window=4, stride=2, chunk=9)
    W = np.asarray(b.params)[:, t].reshape(8, 8, 3)
    contrib = (W * np.asarray(x)).sum(-1)
    # manual overlap-averaged diffs
    n_pos = (8 - 4) // 2 + 1
    tot = np.zeros((8, 8))
    cnt = np.zeros((8, 8))
    for i in range(n_pos):
        for j in range(n_pos):
            m = np.zeros((8, 8), bool)
            m[i * 2:i * 2 + 4, j * 2:j * 2 + 4] = True
            diff = contrib[m].sum()
            tot[m] += diff
            cnt[m] += 1
    want = tot / cnt
    assert np.allclose(np.asarray(attr)[..., 0], want, atol=1e-4)


def test_shapley_linear_exact():
    """For a linear model every permutation's marginal equals the group's
    own contribution, so sampling is exact."""
    b = linear_bundle(hw=8)
    x = jnp.asarray(np.random.RandomState(7).randn(8, 8, 3), jnp.float32)
    t = 3
    attr = A.shapley_sampling(b, x, t, jax.random.PRNGKey(1), num_patches=4,
                              n_samples=2, chunk=17)
    W = np.asarray(b.params)[:, t].reshape(8, 8, 3)
    contrib = (W * np.asarray(x)).sum(-1)
    mask = np.asarray(A.patch_mask(8, 4))
    want = np.zeros((8, 8))
    for g in range(16):
        want[mask == g] = contrib[mask == g].sum()
    assert np.allclose(np.asarray(attr)[..., 0], want, atol=1e-4)


def test_rise_deterministic_and_shape():
    b = tiny_bundle(hw=HW)
    x = jnp.asarray(np.random.RandomState(8).randn(HW, HW, 3), jnp.float32)
    k = jax.random.PRNGKey(5)
    s1 = R.rise(b, x, 0, k, n_masks=64, s=4, chunk=16)
    s2 = R.rise(b, x, 0, k, n_masks=64, s=4, chunk=16)
    assert s1.shape == (HW, HW)
    assert np.allclose(np.asarray(s1), np.asarray(s2))


def test_agi_runs():
    b = tiny_bundle(hw=HW)
    img = np.random.RandomState(9).rand(HW, HW, 3).astype(np.float32)
    sal = agi(b, img, topk=2, max_iter=3)
    assert sal.shape == (HW, HW)
    assert np.isfinite(sal).all()
    assert sal.min() >= 0 and sal.max() <= 1


def test_guided_ig_completeness_ish():
    """With max_dist=1.0 fraction=0.5 the path still ends at x, so the total
    attribution approximates softmax(x) - softmax(baseline)."""
    b = tiny_bundle(hw=HW)
    x = np.random.RandomState(10).randn(HW, HW, 3).astype(np.float32)
    t = 0
    attr = guided_ig(b, x, t, steps=30)
    fx = float(jax.nn.softmax(b.apply(b.params, jnp.asarray(x)[None])[0])[t])
    f0 = float(jax.nn.softmax(b.apply(b.params,
                                      jnp.zeros((1, HW, HW, 3)))[0])[t])
    assert abs(attr.sum() - (fx - f0)) < 0.1 * max(abs(fx - f0), 0.05)
