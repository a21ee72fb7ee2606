"""Perturbation-based captum-equivalents: GradientShap, FeatureAblation,
Occlusion, ShapleyValueSampling — all as batched on-device sweeps.

Reference usage: evaluatePerturbation.py:164-176 (gs / fa / occ) and
imagenet_seg_eval.py:160 (ShapleyValueSampling over a 14x14 patch mask).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def patch_mask(img_hw: int = 224, num_patches: int = 14) -> jnp.ndarray:
    """[H, W] int mask of num_patches^2 square patch ids — the driver's
    feature mask (evaluatePerturbation.py:94-97)."""
    ids = jnp.arange(num_patches ** 2).reshape(num_patches, num_patches)
    rep = img_hw // num_patches
    return jnp.repeat(jnp.repeat(ids, rep, axis=0), rep, axis=1)


# ---------------------------------------------------------------------------
# GradientShap (captum defaults: n_samples=5, stdevs=0.0)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 5))
def _gradient_shap(apply_fn, params, x, baselines, target, n_samples, key,
                   alphas=None, base_idx=None):
    nb = baselines.shape[0]
    k1, k2 = jax.random.split(key)
    b_idx = (jax.random.randint(k1, (n_samples,), 0, nb)
             if base_idx is None else jnp.asarray(base_idx))
    if alphas is None:
        alphas = jax.random.uniform(k2, (n_samples,))
    else:
        alphas = jnp.asarray(alphas)
    base = baselines[b_idx]
    pts = base + alphas.reshape(-1, 1, 1, 1) * (x[None] - base)

    def score_sum(xb):
        return apply_fn(params, xb)[:, target].sum()

    grads = jax.grad(score_sum)(pts)
    return (grads * (x[None] - base)).mean(axis=0)


def gradient_shap(bundle, x, target, key, baselines=None,
                  n_samples: int = 5, alphas=None,
                  base_idx=None) -> jnp.ndarray:
    """captum GradientShap with a single random-normal baseline
    (evaluatePerturbation.py:164-167).

    ``alphas``/``base_idx`` inject captum's internal rand draws for the
    golden-parity protocol (captum gradient_shap.py samples one uniform
    rand_coefficient per sample)."""
    x = jnp.asarray(x)
    if baselines is None:
        key, bk = jax.random.split(key)
        baselines = jax.random.normal(bk, (1,) + x.shape, x.dtype)
    else:
        baselines = jnp.asarray(baselines)
    if alphas is not None:
        n_samples = int(np.shape(alphas)[0])
    return _gradient_shap(bundle.apply, bundle.params, x, baselines, target,
                          n_samples, key, alphas=alphas, base_idx=base_idx)


# ---------------------------------------------------------------------------
# FeatureAblation over a patch mask
# ---------------------------------------------------------------------------

def feature_ablation(bundle, x, target, num_patches: int = 14,
                     baseline: float = 0.0, chunk: int = 49) -> jnp.ndarray:
    """captum FeatureAblation: per patch group, attribution =
    f(x) - f(x with group ablated to baseline), broadcast over the group."""
    x = jnp.asarray(x)
    hw = x.shape[0]
    mask = patch_mask(hw, num_patches)
    n = num_patches ** 2
    while n % chunk:
        chunk -= 1
    return _fa_jit(bundle.apply, bundle.params, x, mask, target, n, chunk,
                   baseline)


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _fa_jit(apply_fn, params, x, mask, target, n_groups, chunk, baseline):
    orig = apply_fn(params, x[None])[0, target]

    def one_chunk(gids):
        def ablate(g):
            m = (mask == g)[..., None]
            return jnp.where(m, baseline, x)
        xb = jax.vmap(ablate)(gids)
        return apply_fn(params, xb)[:, target]

    gids = jnp.arange(n_groups, dtype=jnp.int32).reshape(-1, chunk)
    scores = jax.lax.map(one_chunk, gids).reshape(n_groups)
    diffs = orig - scores                       # [n_groups]
    return diffs[mask][..., None] * jnp.ones((1, 1, 3), x.dtype)


# ---------------------------------------------------------------------------
# Occlusion (sliding window, overlap-averaged — captum use_weights=True)
# ---------------------------------------------------------------------------

def occlusion(bundle, x, target, window: int = 64, stride: int = 32,
              baseline: float = 0.0, chunk: int = 36) -> jnp.ndarray:
    """captum Occlusion with sliding_window_shapes=(3,64,64), strides=32
    (evaluatePerturbation.py:174-176)."""
    x = jnp.asarray(x)
    hw = x.shape[0]
    n_pos = (hw - window) // stride + 1
    n = n_pos * n_pos
    while n % chunk:
        chunk -= 1
    return _occ_jit(bundle.apply, bundle.params, x, target, hw, n_pos,
                    window, stride, chunk, baseline)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8))
def _occ_jit(apply_fn, params, x, target, hw, n_pos, window, stride, chunk,
             baseline):
    orig = apply_fn(params, x[None])[0, target]
    rr = jnp.arange(hw)

    def win_mask(pos):
        i, j = pos // n_pos, pos % n_pos
        r0, c0 = i * stride, j * stride
        rm = (rr >= r0) & (rr < r0 + window)
        cm = (rr >= c0) & (rr < c0 + window)
        return (rm[:, None] & cm[None, :])

    def one_chunk(ps):
        def occl(p):
            m = win_mask(p)[..., None]
            return jnp.where(m, baseline, x)
        xb = jax.vmap(occl)(ps)
        return apply_fn(params, xb)[:, target]

    n = n_pos * n_pos
    ps = jnp.arange(n, dtype=jnp.int32).reshape(-1, chunk)
    scores = jax.lax.map(one_chunk, ps).reshape(n)
    diffs = orig - scores

    # accumulate diff into covered pixels; average by coverage count
    def accumulate(carry, p):
        tot, cnt = carry
        m = win_mask(p).astype(x.dtype)
        return (tot + m * diffs[p], cnt + m), None

    (tot, cnt), _ = jax.lax.scan(accumulate,
                                 (jnp.zeros((hw, hw), x.dtype),
                                  jnp.zeros((hw, hw), x.dtype)),
                                 jnp.arange(n))
    avg = tot / jnp.maximum(cnt, 1.0)
    return avg[..., None] * jnp.ones((1, 1, 3), x.dtype)


# ---------------------------------------------------------------------------
# Shapley Value Sampling over patch groups
# ---------------------------------------------------------------------------

def shapley_sampling(bundle, x, target, key, num_patches: int = 14,
                     n_samples: int = 25, baseline: float = 0.0,
                     chunk: int = 49, perms=None) -> jnp.ndarray:
    """captum ShapleyValueSampling: random permutations of patch groups;
    marginal contribution of each group when added to the coalition.

    ``perms`` ([n_samples, num_patches**2] int) injects captum's internal
    torch.randperm draws for the golden-parity protocol."""
    x = jnp.asarray(x)
    hw = x.shape[0]
    mask = patch_mask(hw, num_patches)
    n = num_patches ** 2
    if perms is None:
        perms = jax.vmap(lambda k: jax.random.permutation(k, n))(
            jax.random.split(key, n_samples))
    else:
        perms = jnp.asarray(perms)
    base = jnp.broadcast_to(jnp.asarray(baseline, x.dtype), x.shape)
    return _shapley_jit(bundle.apply, bundle.params, x, mask, target, perms,
                        n, chunk, base)


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def _shapley_jit(apply_fn, params, x, mask, target, perms, n_groups, chunk,
                 baseline=None):
    if baseline is None:
        baseline = jnp.zeros_like(x)

    def one_perm(perm):
        # group -> position in permutation; coalition at step s = first s
        pos = jnp.empty_like(perm).at[perm].set(jnp.arange(n_groups))
        pix_pos = pos[mask]                        # [H, W]

        def img_at(s):
            m = (pix_pos < s)[..., None]
            return jnp.where(m, x, baseline)

        steps = jnp.arange(n_groups + 1, dtype=jnp.int32)
        pad = (-(n_groups + 1)) % chunk
        steps = jnp.concatenate([steps, jnp.zeros(pad, jnp.int32)])

        def one_chunk(sc):
            xb = jax.vmap(img_at)(sc)
            return apply_fn(params, xb)[:, target]

        scores = jax.lax.map(one_chunk,
                             steps.reshape(-1, chunk)).reshape(-1)
        scores = scores[:n_groups + 1]
        marginal = scores[1:] - scores[:-1]        # contribution of perm[s]
        return marginal[pos]                       # per group

    contribs = jax.lax.map(one_perm, perms)        # [S, n_groups]
    group_attr = contribs.mean(axis=0)
    return group_attr[mask][..., None] * jnp.ones((1, 1, 3), x.dtype)
