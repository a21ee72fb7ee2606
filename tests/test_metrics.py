"""Metric engine vs a direct numpy transliteration of the reference's
ranked-reveal loop + normalizations (MASTestFunctions/RISE/AIC/PNP/MONO)."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import spearmanr

from xai_tpu.metrics import curves as C
from xai_tpu.ops.stats import auc, spearman

from tiny_models import tiny_bundle


HW = 16


def _oracle_reveal(apply_fn, params, start, finish, saliency, step_size,
                   descending=True):
    """Transliteration of the reference reveal loop (per-pixel, CHW-agnostic):
    flip `step_size` pixels per step in saliency order, record softmax
    responses. start/finish: [H, W, C] numpy."""
    hw = start.shape[0] * start.shape[1]
    n_steps = (hw + step_size - 1) // step_size
    flat_sal = saliency.reshape(1, hw)
    order = np.flip(np.argsort(flat_sal, axis=1), axis=-1)[0] if descending \
        else np.argsort(flat_sal, axis=1)[0]
    cur = start.reshape(hw, -1).copy()
    fin = finish.reshape(hw, -1)
    probs = []

    def response(img_flat):
        x = jnp.asarray(img_flat.reshape(start.shape))[None]
        return np.asarray(jax.nn.softmax(apply_fn(params, x)[0]))

    probs.append(response(cur))
    for s in range(n_steps):
        coords = order[step_size * s: step_size * (s + 1)]
        cur[coords] = fin[coords]
        probs.append(response(cur))
    return np.stack(probs)  # [n_steps+1, num_classes]


def test_pixel_flip_steps_matches_order():
    rs = np.random.RandomState(0)
    sal = rs.rand(HW, HW)
    flip = C.pixel_flip_steps(sal, HW)
    # pixel with the highest saliency flips at step 1
    assert flip[np.argmax(sal.reshape(-1))] == 1
    assert flip.max() == HW and flip.min() == 1
    # counts per step == step_size
    assert (np.bincount(flip)[1:] == HW).all()


def test_reveal_curves_match_oracle():
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(1)
    x = rs.randn(HW, HW, 3).astype(np.float32)
    sal = rs.rand(HW, HW).astype(np.float32)
    zeros = np.zeros_like(x)
    target = int(np.argmax(np.asarray(b.apply(b.params, jnp.asarray(x)[None]))))

    flip = C.pixel_flip_steps(sal, HW)
    got = C.reveal_curves(b.apply, b.params, x, zeros, flip, HW, target,
                          chunk=17, original_img=x)
    oracle = _oracle_reveal(b.apply, b.params, x, zeros, sal, HW)
    assert np.allclose(got.target_prob, oracle[:, target], atol=1e-5)
    want_top1 = (np.argmax(oracle, axis=1) == target).astype(float)
    assert np.allclose(got.top1_is_target, want_top1)
    ent = -(oracle * np.log2(np.clip(oracle, 1e-12, 1))).sum(1)
    assert np.allclose(got.entropy, ent, atol=1e-4)


def test_monotone_normalize_matches_reference():
    rs = np.random.RandomState(2)
    resp = rs.rand(17)
    orig, base = 0.9, 0.05

    def ref_norm(mode):
        out = resp.copy()
        mn, mx = 1.0, 0.0
        for i in range(len(out)):
            v = np.clip((out[i] - base) / abs(orig - base), 0.0, 1.0)
            if mode == "del":
                mn = min(mn, v)
                out[i] = mn
            else:
                mx = max(mx, v)
                out[i] = mx
        return out

    assert np.allclose(C.monotone_normalize(resp, orig, base, "del"),
                       ref_norm("del"))
    assert np.allclose(C.monotone_normalize(resp, orig, base, "ins"),
                       ref_norm("ins"))


def test_density_response_matches_reference():
    rs = np.random.RandomState(3)
    sal = rs.rand(HW, HW)
    step = HW
    n_steps = HW
    flip = C.pixel_flip_steps(sal, step)
    # reference: cumulative attr of flipped coords / total (MASTest:245-263)
    flat = sal.reshape(-1)
    order = np.flip(np.argsort(flat.reshape(1, -1), axis=1), axis=-1)[0]
    total = flat.sum()
    dens_del = [1.0]
    dens_ins = [0.0]
    acc_d, acc_i = 1.0, 0.0
    for s in range(n_steps):
        coords = order[step * s: step * (s + 1)]
        cnt = flat[coords].sum()
        acc_d -= cnt / total
        acc_i += cnt / total
        dens_del.append(acc_d)
        dens_ins.append(acc_i)
    assert np.allclose(C.density_response(sal, flip, n_steps, "del"),
                       dens_del, atol=1e-6)
    assert np.allclose(C.density_response(sal, flip, n_steps, "ins"),
                       dens_ins, atol=1e-6)


def test_mas_scores_matches_reference():
    rs = np.random.RandomState(4)
    norm = np.sort(rs.rand(17))[::-1]
    dens = np.linspace(1, 0, 17)
    pen = np.abs(norm - dens)
    corr = np.clip(norm + pen, 0, 1)
    want = (corr - corr.min()) / (corr.max() - corr.min())
    assert np.allclose(C.mas_scores(norm, dens, "del"), want)
    # NaN fallback ramps
    flat = np.full(17, 0.3)
    out = C.mas_scores(flat, flat, "del")
    assert np.allclose(out, np.linspace(1, 0, 17))
    out = C.mas_scores(flat, flat, "ins")
    assert np.allclose(out, np.linspace(0, 1, 17))


def test_auc_and_spearman_match_scipy():
    rs = np.random.RandomState(5)
    arr = rs.rand(33)
    want = (arr.sum() - arr[0] / 2 - arr[-1] / 2) / (arr.shape[0] - 1)
    assert abs(float(auc(arr)) - want) < 1e-6
    a, b2 = rs.rand(40), rs.rand(40)
    assert abs(float(spearman(a, b2)) - spearmanr(a, b2).correlation) < 1e-6
    # with ties
    a_t = np.round(a, 1)
    b_t = np.round(b2, 1)
    assert abs(float(spearman(a_t, b_t)) -
               spearmanr(a_t, b_t).correlation) < 1e-6


def test_run_battery_smoke():
    from xai_tpu.ops.blur import make_blur_fn
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(6)
    x = rs.randn(HW, HW, 3).astype(np.float32)
    sal = rs.rand(HW, HW).astype(np.float32)
    scores = C.run_battery(b.apply, b.params, x, sal,
                           make_blur_fn(klen=5, nsig=5.0), chunk=17)
    assert set(scores) == {"MAS_ins", "MAS_del", "RISE_ins", "RISE_del",
                           "AIC_ins", "AIC_del", "LERF_res", "MORF_res",
                           "MONO_pos", "MONO_neg"}
    for k, v in scores.items():
        assert np.isfinite(v), (k, v)


def test_run_battery_explicit_nonargmax_target():
    """An explicit target that is NOT the model's argmax must yield finite
    scores: the AIC curves anchor on the clean-image top-1 indicator read
    off the curve endpoints (a hard-coded original=1.0 used to distort
    this case); the NaN-ramp fallback covers degenerate flat curves."""
    import jax.numpy as jnp

    from xai_tpu.ops.blur import make_blur_fn

    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(6)
    x = rs.randn(HW, HW, 3).astype(np.float32)
    sal = rs.rand(HW, HW).astype(np.float32)
    argmax_t = int(jnp.argmax(b.apply(b.params, jnp.asarray(x)[None])[0]))
    wrong_t = (argmax_t + 3) % 16
    scores = C.run_battery(b.apply, b.params, x, sal,
                           make_blur_fn(klen=5, nsig=5.0), chunk=17,
                           target=wrong_t)
    for k, v in scores.items():
        assert np.isfinite(v), (k, v)
