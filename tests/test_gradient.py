"""Gradient-path method tests: closed forms, completeness, reference-logic
oracles (numpy transliterations of saliencyMethods.py semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xai_tpu.methods import gradient as G

from tiny_models import tiny_bundle, linear_bundle


def test_grad_linear_exact():
    b = linear_bundle()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 8, 3), jnp.float32)
    g = G.grad(b, x, 2)
    W = np.asarray(b.params)[:, 2].reshape(8, 8, 3)
    assert np.allclose(np.asarray(g), W, atol=1e-6)


def test_ig_linear_closed_form():
    """For linear f and zero baseline, IG == W ⊙ x exactly (any steps)."""
    b = linear_bundle()
    x = jnp.asarray(np.random.RandomState(1).randn(8, 8, 3), jnp.float32)
    attr = G.ig(b, x, 1, steps=10, chunk=5)
    W = np.asarray(b.params)[:, 1].reshape(8, 8, 3)
    assert np.allclose(np.asarray(attr), W * np.asarray(x), atol=1e-5)


def test_ig_completeness():
    """sum(IG) ≈ f(x) - f(baseline) for smooth f with enough steps."""
    b = tiny_bundle()
    x = jnp.asarray(np.random.RandomState(2).randn(16, 16, 3), jnp.float32)
    t = 3
    attr = G.ig(b, x, t, steps=300, chunk=50)
    fx = float(b.apply(b.params, x[None])[0, t])
    f0 = float(b.apply(b.params, jnp.zeros_like(x)[None])[0, t])
    total = float(jnp.sum(attr))
    assert abs(total - (fx - f0)) < 2e-2 * max(1.0, abs(fx - f0))


def _reference_lig(grads, logits, alpha_star, diff):
    """numpy transliteration of saliencyMethods.py:48-70."""
    cutoff = logits.max() * alpha_star
    idx = np.where(logits > cutoff)[0]
    cutoff_step = idx[0] if len(idx) else 1
    if cutoff_step == 0:
        cutoff_step = 1
    return grads[:cutoff_step].mean(axis=0) * diff


def test_lig_matches_reference_logic():
    b = tiny_bundle()
    x = jnp.asarray(np.random.RandomState(3).randn(16, 16, 3), jnp.float32)
    t = 0
    steps = 20
    # raw grads+logits from the same machinery
    baseline = jnp.zeros_like(x)
    alphas = jnp.linspace(0, 1, steps).reshape(steps, 1, 1, 1)
    imgs = baseline[None] + alphas * (x - baseline)[None]
    grads, logits = G._grads_and_logits(b.apply, b.params, imgs, t, 10)
    want = _reference_lig(np.asarray(grads), np.asarray(logits), 0.9,
                          np.asarray(x))
    got = G.ig(b, x, t, steps=steps, alpha_star=0.9, chunk=10)
    assert np.allclose(np.asarray(got), want, atol=1e-5)


def _reference_alpha_parameters(slopes, steps, step_size):
    """numpy transliteration of getAlphaParameters
    (saliencyMethods.py:264-314)."""
    s01 = (slopes - slopes.min()) / (slopes.max() - slopes.min())
    s01[0] = 0
    ssum = s01 / s01.sum()
    pf = ssum * steps
    pi = pf.astype(int)
    remaining = steps - pi.sum()
    nz = np.where(pi != 0)[0]
    pf2 = pf.copy()
    pf2[nz] = -1
    hi_lo = np.flip(np.argsort(pf2))
    pi[hi_lo[:remaining]] = 1
    alphas = np.zeros(steps)
    sub = np.zeros(steps)
    ai, av = 0, 0.0
    for n in pi:
        if n == 0:
            continue
        alphas[ai:ai + n] = np.linspace(av, av + step_size, n + 1)[:n]
        sub[ai:ai + n] = step_size / n
        ai += n
        av += step_size
    return alphas, sub


def test_idg_alpha_redistribution_matches_reference():
    rs = np.random.RandomState(4)
    steps = 50
    slopes = np.abs(rs.randn(steps)).astype(np.float32)
    slopes[0] = 0
    step_size = 1.0 / (steps - 1)
    want_a, want_s = _reference_alpha_parameters(slopes.copy(), steps,
                                                 step_size)
    got_a, got_s = G._alpha_parameters(jnp.asarray(slopes), steps, step_size)
    assert np.allclose(np.asarray(got_a), want_a, atol=1e-5)
    assert np.allclose(np.asarray(got_s), want_s, atol=1e-5)


def test_idg_runs_and_is_finite():
    b = tiny_bundle()
    x = jnp.asarray(np.random.RandomState(5).randn(16, 16, 3), jnp.float32)
    attr = G.idg(b, x, 1, steps=20, chunk=10)
    assert np.isfinite(np.asarray(attr)).all()
    assert float(jnp.abs(attr).sum()) > 0


def _reference_idgi(grads, logits):
    out = np.zeros_like(grads[0])
    for i in range(len(grads) - 1):
        d = logits[i + 1] - logits[i]
        ep = grads[i] ** 2
        out += ep * d / ep.sum()
    return out


def test_idgi_matches_reference_logic():
    b = tiny_bundle()
    x = jnp.asarray(np.random.RandomState(6).randn(16, 16, 3), jnp.float32)
    t = 2
    steps = 20
    base = jnp.full_like(x, 0.1)
    alphas = jnp.linspace(0, 1, steps).reshape(steps, 1, 1, 1)
    imgs = base[None] + alphas * (x - base)[None]
    grads, logits = G._grads_and_logits(b.apply, b.params, imgs, t, 10)
    want = _reference_idgi(np.asarray(grads), np.asarray(logits))
    got = G.idgi(b, x, t, steps=steps, baseline=0.1, chunk=10)
    assert np.allclose(np.asarray(got), want, atol=1e-5)


def test_smoothgrad_deterministic():
    b = tiny_bundle()
    x = jnp.asarray(np.random.RandomState(7).randn(16, 16, 3), jnp.float32)
    k = jax.random.PRNGKey(42)
    a1 = G.smooth_grad(b, x, 0, k, "IG", steps=10, samples=3)
    a2 = G.smooth_grad(b, x, 0, k, "IG", steps=10, samples=3)
    assert np.allclose(np.asarray(a1), np.asarray(a2))
    # reference quirk: all channels identical (channel-0 broadcast)
    a = np.asarray(a1)
    assert np.allclose(a[..., 0], a[..., 1])


def test_smoothgrad_sweep_matches_per_sample_loop():
    """The folded samples*steps device sweep must reproduce the per-sample
    IG/LIG loop it replaced (saliencyMethods.py:184-205 semantics)."""
    b = tiny_bundle()
    x = jnp.asarray(np.random.RandomState(3).randn(16, 16, 3), jnp.float32)
    key = jax.random.PRNGKey(5)
    samples, steps, t = 4, 10, 2
    stdev = 0.15 * (x.max() - x.min())
    noises = stdev * jax.random.normal(key, (samples,) + x.shape, x.dtype)

    for attribution, alpha_star in [("IG", 1.0), ("LIG", 0.9)]:
        total = jnp.zeros_like(x)
        for i in range(samples):
            a = G.ig(b, x + noises[i], t, steps, alpha_star, 0.0, chunk=5)
            total = total + jnp.broadcast_to(a[..., 0:1], a.shape)
        want = np.asarray(total / samples)
        got = np.asarray(G.smooth_grad(b, x, t, key, attribution,
                                       steps=steps, samples=samples))
        assert np.abs(got - want).max() < 1e-5, attribution


def test_ig_batch_matches_per_image():
    """ig_batch (one dispatch, vmapped sweeps) == per-image ig with zero
    baseline, for every image in the batch."""
    from xai_tpu.methods.gradient import ig, ig_batch
    b = tiny_bundle(hw=32)
    xb = jax.random.normal(jax.random.PRNGKey(4), (3, 32, 32, 3)) * 0.5
    targets = [1, 4, 2]
    batched = np.asarray(ig_batch(b, xb, targets, steps=8, chunk=4))
    for i in range(3):
        single = np.asarray(ig(b, xb[i], targets[i], steps=8, chunk=4))
        assert np.abs(batched[i] - single).max() < 1e-5
