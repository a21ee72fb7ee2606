"""ViT attention explainers: raw attn, attn-grad, cam-attn, naive/residual
rollout, transition attention (t_attn), attention-IG, attn_attr,
bidirectional (bi_attn), and InFlow/RAVE.

Reference: util/attribution_methods/VIT_LRP/ViT_explanation_generator.py
(Baselines class).  The hook-based capture becomes ONE probed forward
returning (logits, taps) with attention gradients from jax.grad on the
additive probes (models/vit.py).  All rollouts are einsum chains over the
stacked [L, B, H, N, N] taps — fully jitted; the 20-step attention-IG is a
vmapped batch of probed backwards.

All functions return the patch-grid map [P, P] (CLS-row, no resize — the
registry upsamples) for batch-1 inputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import vit as vitmod


# ---------------------------------------------------------------------------
# collection: one probed forward+backward
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1))
def _collect(apply_probed, cfg, params, x, target):
    """(taps, attn_grads): attention maps + d logit[target]/d attn per block."""
    probes = vitmod.zero_probes(cfg, batch=x.shape[0])

    def score(pr):
        logits, taps = apply_probed(params, x, pr)
        return logits[0, target], taps

    grads, taps = jax.grad(score, has_aux=True)(probes)
    return taps, grads["attn"]


def collect(bundle, x, target):
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    return _collect(bundle.apply_probed, bundle.extras, bundle.params, x,
                    target)


@functools.partial(jax.jit, static_argnums=(0,))
def _taps_jit(apply_taps, params, x):
    return apply_taps(params, x)


def _taps(bundle, x):
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    return _taps_jit(bundle.apply_taps, bundle.params, x)


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def _attn_ig_grads(apply_probed, cfg, params, x, target, steps):
    """Sum over alpha in linspace(0,1,steps) of d logit[target]/d attn of the
    LAST block at input x*alpha (ViT_explanation_generator.py:329-341)."""
    probes = vitmod.zero_probes(cfg, batch=x.shape[0])

    def grad_at(alpha):
        def score(pr):
            logits, _ = apply_probed(params, x * alpha, pr)
            return logits[0, target]
        g = jax.grad(score)(probes)
        return g["attn"][-1]

    alphas = jnp.linspace(0.0, 1.0, steps)
    return jax.lax.map(grad_at, alphas).sum(axis=0)


# ---------------------------------------------------------------------------
# rollout primitives (compute_rollout_* / compute_RAVE)
# ---------------------------------------------------------------------------

def rollout_naive(mats, start_layer: int = 0):
    """[L, B, N, N] -> product M_{L-1} @ ... @ M_start (:13-22)."""
    joint = mats[start_layer]
    for i in range(start_layer + 1, mats.shape[0]):
        joint = jnp.einsum("bij,bjk->bik", mats[i], joint)
    return joint


def rollout_residual(mats, start_layer: int = 0):
    """0.5A + 0.5I residual modeling: add I, row-normalize, chain (:26-45)."""
    n = mats.shape[-1]
    aug = mats + jnp.eye(n)
    aug = aug / aug.sum(axis=-1, keepdims=True)
    return rollout_naive(aug, start_layer)


def rave_matrices(attns, bias1, bias2, ablate: int = 0):
    """compute_RAVE augmentation (:48-82).

    attns: [L, B, N, N]; bias1/bias2: [L, 2, N] normalized (input, main)
    L2-norm ratios per residual connection."""
    L, B, N, _ = attns.shape
    eye = jnp.eye(N)[None, None]
    diag = lambda v: jax.vmap(jnp.diag)(v)[:, None]  # [L, N] -> [L, 1, N, N]
    m1 = attns * bias1[:, 1].reshape(L, 1, 1, N) + eye * diag(bias1[:, 0])
    if ablate == 1:
        aug = m1
    else:
        ratio = bias2[:, 1] / bias2[:, 0]                       # [L, N]
        ratio = ratio / jnp.abs(ratio).sum(axis=-1, keepdims=True)
        m2 = diag(ratio) * diag(bias2[:, 1]) + eye * diag(bias2[:, 0])
        aug = jnp.einsum("lbij,lbjk->lbik", m1, m2)
    aug = aug / aug.sum(axis=-1, keepdims=True)
    return aug


def _resid_biases(taps):
    """Per-block normalized L2-norm ratios of (input, attn_out) and
    (input+attn, mlp) — the InFlow residual biases (:221-233).
    Returns (bias1, bias2): [L, 2, N]."""
    def norms(a, b):
        na = jnp.linalg.norm(a, ord=2, axis=-1)     # [L, B, N] -> norm over D
        nb = jnp.linalg.norm(b, ord=2, axis=-1)
        s = jnp.stack([na, nb], axis=1)             # [L, 2, B, N]
        s = s / jnp.abs(s).sum(axis=1, keepdims=True)
        return s[:, :, 0]                           # batch 1 -> [L, 2, N]

    b1 = norms(taps["block_in"], taps["attn_out"])
    b2 = norms(taps["input_plus_attn"], taps["mlp_val"])
    return b1, b2


def _cls_patch_grid(row, tokens: int):
    p = int((tokens - 1) ** 0.5)
    return row[1:].reshape(p, p)


# ---------------------------------------------------------------------------
# the explainers (ViT_explanation_generator.Baselines)
# ---------------------------------------------------------------------------

def raw_attn(bundle, x, layer: int = -1):
    """generate_raw_attn (:140-145): last-block head-mean CLS row."""
    return _raw_attn_jit(bundle.apply_taps, layer, bundle.params, _4d(x))


def _4d(x):
    x = jnp.asarray(x)
    return x[None] if x.ndim == 3 else x


@functools.partial(jax.jit, static_argnums=(0, 1))
def _raw_attn_jit(apply_taps, layer, params, x):
    _, taps = apply_taps(params, x)
    attn = taps["attn"][layer].mean(axis=1)[0, 0]
    return _cls_patch_grid(attn, attn.shape[-1])


def attn_grad(bundle, x, target, layer: int = -1):
    """generate_grad (:147-158): head-mean attn gradient CLS row, clamp 0."""
    return _attn_grad_jit(bundle.apply_probed, bundle.extras, layer,
                          bundle.params, _4d(x), target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _attn_grad_jit(apply_probed, cfg, layer, params, x, target):
    _, grads = _collect(apply_probed, cfg, params, x, target)
    g = grads[layer].mean(axis=1)[0, 0]
    return jnp.clip(_cls_patch_grid(g, g.shape[-1]), 0)


def cam_attn(bundle, x, target, layer: int = -1):
    """generate_cam_attn (:161-178): Grad-CAM on last-block attention."""
    return _cam_attn_jit(bundle.apply_probed, bundle.extras, layer,
                         bundle.params, _4d(x), target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _cam_attn_jit(apply_probed, cfg, layer, params, x, target):
    taps, grads = _collect(apply_probed, cfg, params, x, target)
    cam = taps["attn"][layer][0, :, 0, 1:]          # [H, P*P]
    g = grads[layer][0, :, 0, 1:]
    m = jnp.clip((cam * g).mean(axis=0), 0)
    m = (m - m.min()) / (m.max() - m.min())
    p = int(m.shape[-1] ** 0.5)
    return m.reshape(p, p)


def naive_rollout(bundle, x, start_layer: int = 0):
    """generate_naive_rollout (:180-193)."""
    return _rollout_jit(bundle.apply_taps, start_layer, False,
                        bundle.params, _4d(x))


def rollout(bundle, x, start_layer: int = 0):
    """generate_rollout (:195-239, InFlow=False)."""
    return _rollout_jit(bundle.apply_taps, start_layer, True,
                        bundle.params, _4d(x))


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _rollout_jit(apply_taps, start_layer, residual, params, x):
    _, taps = apply_taps(params, x)
    mats = taps["attn"].mean(axis=2)                # [L, B, N, N]
    ro = (rollout_residual if residual else rollout_naive)(
        mats, start_layer)[0, 0]
    return _cls_patch_grid(ro, ro.shape[-1])


def inflow_rollout(bundle, x):
    """generate_rollout(InFlow=True): RAVE with plain head-mean attention."""
    return _inflow_rollout_jit(bundle.apply_taps, bundle.params, _4d(x))


@functools.partial(jax.jit, static_argnums=(0,))
def _inflow_rollout_jit(apply_taps, params, x):
    _, taps = apply_taps(params, x)
    mats = taps["attn"].mean(axis=2)
    b1, b2 = _resid_biases(taps)
    aug = rave_matrices(mats, b1, b2)
    ro = rollout_naive(aug)[0, 0]
    return _cls_patch_grid(ro, ro.shape[-1])


def transition_attention(bundle, x, target, start_layer: int = 0,
                         steps: int = 20):
    """generate_transition_attention_maps (:307-356).  Returns the `final`
    (states * W_state) map the driver uses (evaluatePerturbation.py:223)."""
    return _transition_jit(bundle.apply_probed, bundle.extras, start_layer,
                           steps, bundle.params, _4d(x), target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _transition_jit(apply_probed, cfg, start_layer, steps, params, x,
                    target):
    taps, _ = _collect(apply_probed, cfg, params, x, target)
    attn_mean = taps["attn"].mean(axis=2)           # [L, B, N, N]
    L, B, N, _ = attn_mean.shape

    states = attn_mean[-1][:, 0, :].reshape(B, 1, N)
    for i in range(start_layer, L)[::-1]:
        a = attn_mean[i]
        # reference einsum 'biw,bwh->h' == states @ attn for B == 1
        states = (jnp.einsum("biw,bwh->h", states, a).reshape(B, 1, N)
                  + states)

    total = _attn_ig_grads(apply_probed, cfg, params, x, target, steps)
    w_state = jnp.clip(total / steps, 0).mean(axis=1)[:, 0, :].reshape(B, 1, N)
    final = states * w_state
    return _cls_patch_grid(final[0, 0], N)


def attn_ig(bundle, x, target, steps: int = 20):
    """Baselines.IG (:358-386): IG of last-block attention grads alone."""
    return _attn_ig_jit(bundle.apply_probed, bundle.extras, steps,
                        bundle.params, _4d(x), target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _attn_ig_jit(apply_probed, cfg, steps, params, x, target):
    total = _attn_ig_grads(apply_probed, cfg, params, x, target, steps)
    w = jnp.clip(total / steps, 0).mean(axis=1)[0, 0]
    return _cls_patch_grid(w, w.shape[-1])


def attn_attr(bundle, x, target, start_layer: int = 0):
    """attn_attr (:390-416): residual-free rollout of blocks < L-1 weighted
    by last-block positive attention grads."""
    return _attn_attr_jit(bundle.apply_probed, bundle.extras, start_layer,
                          bundle.params, _4d(x), target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _attn_attr_jit(apply_probed, cfg, start_layer, params, x, target):
    taps, grads = _collect(apply_probed, cfg, params, x, target)
    attn_mean = taps["attn"].mean(axis=2)
    L, B, N, _ = attn_mean.shape
    states = attn_mean[-1][:, 0, :].reshape(B, 1, N)
    for i in range(start_layer, L - 1)[::-1]:
        states = jnp.einsum("bin,bnm->bim", states, attn_mean[i]) + states
    w = jnp.clip(grads[-1], 0).mean(axis=1)[:, 0, :].reshape(B, 1, N)
    final = states * w
    return _cls_patch_grid(final[0, 0], N)


def _head_weighted_cams(taps, grads, start_layer: int):
    """Per-block head-importance-weighted attention: Ih = mean|A^T G| over
    (N, N), cam = sum_h Ih_h A_h (bidirectional :434-441)."""
    attn = taps["attn"]                              # [L, B, H, N, N]
    L, B, H, N, _ = attn.shape
    cams = []
    for nb in range(L):
        if nb < start_layer - 1:
            cams.append(None)
            continue
        a = attn[nb].reshape(-1, N, N)               # [H, N, N] (B=1)
        g = grads[nb].reshape(-1, N, N)
        ih = jnp.abs(jnp.einsum("hij,hjk->hik", a.transpose(0, 2, 1),
                                g)).mean(axis=(-1, -2))
        ih = ih / ih.sum()
        cams.append(jnp.einsum("h,hnm->nm", ih, a))
    return cams


def bidirectional(bundle, x, target, steps: int = 20, start_layer: int = 4):
    """bidirectional / bi_attn (:419-505): head-importance rollout
    R = I + sum cam@R over blocks >= start_layer-1, times 20-step IG of
    last-block attention grads."""
    return _bidirectional_jit(bundle.apply_probed, bundle.extras, steps,
                              start_layer, bundle.params, _4d(x), target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _bidirectional_jit(apply_probed, cfg, steps, start_layer, params, x,
                       target):
    taps, grads = _collect(apply_probed, cfg, params, x, target)
    L, B, H, N, _ = taps["attn"].shape
    cams = _head_weighted_cams(taps, grads, start_layer)
    R = jnp.eye(N)[None]
    for cam in cams:
        if cam is None:
            continue
        R = R + jnp.einsum("nm,bmk->bnk", cam, R)

    total = _attn_ig_grads(apply_probed, cfg, params, x, target, steps)
    w = jnp.clip(total / steps, 0).mean(axis=1).reshape(B, N, N)
    attr = w * R
    return _cls_patch_grid(attr[0, 0], N)


def rave(bundle, x, target, withgrad: bool = True, ablate: int = 0,
         stop_layer: int = 12):
    """generate_RAVE / InFlow (:241-304): per-block head-importance max
    attention, optionally weighted by the bottom-up gradient (gradient of the
    block's own classification probs w.r.t. its attention), RAVE residual
    rollout."""
    return _rave_jit(bundle.apply_probed, bundle.extras, withgrad, ablate,
                     stop_layer, bundle.params, _4d(x), target)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _rave_jit(apply_probed, cfg, withgrad, ablate, stop_layer, params, x,
              target):
    taps, grads = _collect(apply_probed, cfg, params, x, target)
    attn = taps["attn"]                              # [L, B, H, N, N]
    L, B, H, N, _ = attn.shape
    n_used = min(stop_layer + 1, L)

    if withgrad:
        bu = _bottom_up_attn_grads(apply_probed, cfg, params, x, target)

    layer_maps = []
    for i in range(n_used):
        a = attn[i].reshape(-1, N, N)
        g = grads[i].reshape(-1, N, N)
        ih = jnp.abs(jnp.einsum("hij,hjk->hik", a.transpose(0, 2, 1),
                                g)).mean(axis=(-1, -2))
        ih = ih / ih.sum()
        max_heads = (attn[i] * ih.reshape(1, H, 1, 1)).max(axis=1)  # [B,N,N]
        if withgrad:
            grad_i = bu[i][0]                        # [H, N, N]
            max_heads = jnp.clip(grad_i.mean(axis=0, keepdims=True)
                                 * max_heads, 0)
        layer_maps.append(max_heads)

    mats = jnp.stack(layer_maps)                     # [L', B, N, N]
    b1, b2 = _resid_biases(taps)
    aug = rave_matrices(mats, b1[:n_used], b2[:n_used], ablate)
    ro = rollout_naive(aug)[0, 0]
    return _cls_patch_grid(ro, ro.shape[-1])


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bottom_up_attn_grads(apply_probed, cfg, params, x, target):
    """d blockprobs_i[target] / d attn_i for every block i
    (ViT_new_timm.py:483-495 + generate_RAVE :278-281): the gradient of the
    final norm+head applied to block i's output, taken w.r.t. block i's own
    attention.  One vmapped backward over the block index."""
    probes = vitmod.zero_probes(cfg, batch=x.shape[0])

    def prob_i(pr, i):
        _, taps = apply_probed(params, x, pr)
        probs = vitmod.block_probs(params, taps["block_out"])
        return probs[i, 0, target]

    def grad_i(i):
        g = jax.grad(prob_i)(probes, i)
        return g["attn"][i]                          # [B, H, N, N]

    return jax.lax.map(grad_i, jnp.arange(cfg.depth))
