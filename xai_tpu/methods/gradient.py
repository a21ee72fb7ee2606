"""Gradient-path attributions: grad, input×grad, IG, LIG, IDG, IDGI, SmoothGrad.

Reference: util/attribution_methods/saliencyMethods.py (the highest-value
file per SURVEY §2.1).  TPU design: a single jitted chunked fwd+VJP sweep
over the interpolation axis (``lax.map`` of a batched value_and_grad);
the LIG cutoff is an argmax over the logit trace; IDG's two-pass alpha
redistribution is vectorized integer logic on device.  No host loops.

All functions take a ModelBundle and a normalized [H, W, C] input (NHWC,
single image) and return the per-channel attribution [H, W, C]; reduce with
:func:`to_saliency` (the driver's ``np.abs(np.sum(..., axis=0))``,
evaluatePerturbation.py:181).
"""
from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np


def to_saliency(attr) -> np.ndarray:
    """[H, W, C] signed attribution -> [H, W] |sum over channels|."""
    return np.abs(np.asarray(attr).sum(axis=-1))


# ---------------------------------------------------------------------------
# batched score+grad sweep over interpolation images
# ---------------------------------------------------------------------------

def _grads_and_logits(apply_fn, params, images, target, chunk):
    """images: [S, H, W, C] -> (grads [S, H, W, C], logits [S]) via chunked
    batched VJP (saliencyMethods.py:40-46 / 209-215, minus the host loop)."""
    S = images.shape[0]
    assert S % chunk == 0, (S, chunk)

    def scores_sum(xb):
        logits = apply_fn(params, xb)
        s = logits[:, target]
        return s.sum(), s

    def one_chunk(xb):
        (_, s), g = jax.value_and_grad(scores_sum, has_aux=True)(xb)
        return g, s

    grads, logits = jax.lax.map(
        one_chunk, images.reshape((S // chunk, chunk) + images.shape[1:]))
    return (grads.reshape(images.shape), logits.reshape(S))


def _logits_only(apply_fn, params, images, target, chunk):
    S = images.shape[0]

    def one_chunk(xb):
        return apply_fn(params, xb)[:, target]

    logits = jax.lax.map(
        one_chunk, images.reshape((S // chunk, chunk) + images.shape[1:]))
    return logits.reshape(S)


# ---------------------------------------------------------------------------
# plain gradient / input x gradient
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def _grad_device(apply_fn, params, x, target):
    def score(xi):
        return apply_fn(params, xi[None])[0, target]
    return jax.grad(score)(x)


def grad(bundle, x, target) -> jnp.ndarray:
    """d logit[target] / d input (saliencyMethods.py:7-11)."""
    return _grad_device(bundle.apply, bundle.params, jnp.asarray(x),
                        target)


def inp_x_grad(bundle, x, target) -> jnp.ndarray:
    x = jnp.asarray(x)
    return x * grad(bundle, x, target)


# ---------------------------------------------------------------------------
# IG / LIG (saliencyMethods.py:13-72)
# ---------------------------------------------------------------------------

_CAST_CACHE: "OrderedDict" = collections.OrderedDict()
_CAST_CACHE_CAP = 8     # (params, dtype) pairs; eviction only re-pays a cast


def _cast_params_cached(bundle, dtype):
    """Low-precision copy of a bundle's params, cast ONCE per (params,
    dtype) — a per-call tree_map over ResNet-50's 25M params costs more
    than the bf16 sweep saves.

    The cache entry holds the ORIGINAL params alongside the cast copy:
    keying by ``id()`` alone is unsafe because a garbage-collected params
    dict can hand its CPython id to a different model's params (a real
    hazard in multi-model sweeps), which would silently attribute with the
    wrong weights.  Holding the reference pins the id AND lets us verify
    identity on every hit.  The cache is a small LRU: unbounded growth
    would pin every swept model's full f32 + bf16 trees in HBM forever."""
    key = (id(bundle.params), jnp.dtype(dtype).name)
    hit = _CAST_CACHE.get(key)
    if hit is not None and hit[0] is bundle.params:
        _CAST_CACHE.move_to_end(key)
        return hit[1]
    cast = jax.tree.map(
        lambda l: l.astype(dtype) if jnp.issubdtype(l.dtype,
                                                    jnp.floating) else l,
        bundle.params)
    _CAST_CACHE[key] = (bundle.params, cast)
    _CAST_CACHE.move_to_end(key)
    while len(_CAST_CACHE) > _CAST_CACHE_CAP:
        _CAST_CACHE.popitem(last=False)
    return cast


# ---------------------------------------------------------------------------
# shared flattened fwd+VJP sweep core — the ONE implementation of the
# "fold the image axis into the chunked interpolation sweep" pattern; both
# ig_batch (bench path) and methods.batch (production --image_batch path)
# build on these so a numerical fix lands in every batched IG-family method
# ---------------------------------------------------------------------------


def _flat_grads(apply_fn, params, imgs, tgts, chunk):
    """d logit[tgt]/d img for a flat [N, ...] image stack, scanned in
    ``chunk``-sized device batches.  Returns (grads f32, logits f32)."""
    n = imgs.shape[0]
    imgs_c = imgs.reshape((n // chunk, chunk) + imgs.shape[1:])
    tgt_c = tgts.reshape(n // chunk, chunk)

    def scores_sum(xb, tb):
        logits = apply_fn(params, xb).astype(jnp.float32)
        s = jnp.take_along_axis(logits, tb[:, None], axis=1)[:, 0]
        return s.sum(), s

    def one(args):
        xb, tb = args
        (_, s), g = jax.value_and_grad(scores_sum, has_aux=True)(xb, tb)
        return g, s

    g, s = jax.lax.map(one, (imgs_c, tgt_c))
    return (g.reshape(imgs.shape).astype(jnp.float32),
            s.reshape(n).astype(jnp.float32))


def _flat_logits(apply_fn, params, imgs, tgts, chunk):
    n = imgs.shape[0]
    imgs_c = imgs.reshape((n // chunk, chunk) + imgs.shape[1:])
    tgt_c = tgts.reshape(n // chunk, chunk)

    def one(args):
        xb, tb = args
        logits = apply_fn(params, xb).astype(jnp.float32)
        return jnp.take_along_axis(logits, tb[:, None], axis=1)[:, 0]

    return jax.lax.map(one, (imgs_c, tgt_c)).reshape(n)


def _fit_chunk(n, chunk):
    chunk = min(chunk, n)
    while n % chunk:
        chunk -= 1
    return chunk


def ig(bundle, x, target, steps: int = 50, alpha_star: float = 1.0,
       baseline=0.0, chunk: int = None, dtype=None) -> jnp.ndarray:
    """Integrated Gradients; ``alpha_star < 1`` gives LIG (LeftIG): truncate
    the Riemann sum at the first step whose logit exceeds
    alpha_star * max_logit (saliencyMethods.py:48-67).

    ``dtype=jnp.bfloat16`` runs the fwd+VJP sweep in bf16 (4x the f32 MXU
    peak on v5e); the Riemann mean and the (x - baseline) product stay f32.
    Saliency orderings are rank-stable to bf16 in practice; keep the f32
    default when bit-level parity with the torch reference matters."""
    x = jnp.asarray(x)
    chunk = chunk or min(bundle.meta.batch_size, steps)
    while steps % chunk:
        chunk -= 1
    baseline = jnp.broadcast_to(jnp.asarray(baseline, dtype=x.dtype), x.shape)
    if dtype is not None:
        params = _cast_params_cached(bundle, dtype)
        grads, logits, diff = _ig_jit(bundle.apply, params, x.astype(dtype),
                                      baseline.astype(dtype), steps, target,
                                      chunk)
        grads = grads.astype(jnp.float32)
        logits = logits.astype(jnp.float32)
        diff = (x - baseline)
    else:
        grads, logits, diff = _ig_jit(bundle.apply, bundle.params, x,
                                      baseline, steps, target, chunk)
    if alpha_star >= 1.0:
        mean_grads = grads.mean(axis=0)
    else:
        cutoff = jnp.max(logits) * alpha_star
        above = logits > cutoff
        first = jnp.argmax(above)           # 0 if none True
        cutoff_step = jnp.where(jnp.any(above), first, 1)
        cutoff_step = jnp.maximum(cutoff_step, 1)
        w = (jnp.arange(steps) < cutoff_step).astype(grads.dtype)
        mean_grads = jnp.einsum("s,shwc->hwc", w, grads) / cutoff_step
    return mean_grads * diff


@functools.partial(jax.jit, static_argnums=(0, 4, 6))
def _ig_jit(apply_fn, params, x, baseline, steps, target, chunk):
    # f32 alphas, images cast to the sweep dtype — the f32 broadcast used
    # to silently promote the bf16 fwd+VJP back to f32
    alphas = jnp.linspace(0.0, 1.0, steps).reshape(steps, 1, 1, 1)
    diff = x - baseline
    images = (baseline[None] + alphas * diff[None]).astype(x.dtype)
    grads, logits = _grads_and_logits(apply_fn, params, images, target, chunk)
    return grads, logits, diff




def lig(bundle, x, target, steps: int = 50, baseline=0.0,
        alpha_star: float = 0.9, chunk: int = None) -> jnp.ndarray:
    return ig(bundle, x, target, steps, alpha_star, baseline, chunk)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _ig_batch_jit(apply_fn, params, xs, targets, steps, chunk):
    """Mean-of-grads per image, [B, H, W, C] — the caller applies the
    f32 x-product.  Thin wrapper over the shared _flat_grads sweep core."""
    B = xs.shape[0]
    alphas = jnp.linspace(0.0, 1.0, steps).astype(xs.dtype)
    imgs = (alphas.reshape(1, steps, 1, 1, 1) *
            xs[:, None]).reshape((B * steps,) + xs.shape[1:])
    tgt = jnp.repeat(targets, steps)
    grads, _ = _flat_grads(apply_fn, params, imgs, tgt, chunk)
    return grads.reshape((B, steps) + xs.shape[1:]).mean(axis=1)


def ig_batch(bundle, xs, targets, steps: int = 50,
             chunk: int = 100, dtype=None) -> jnp.ndarray:
    """Throughput-oriented IG over a BATCH of images (zero baseline): folds
    the image and interpolation axes together so the chip runs larger
    batches.  xs: [B, H, W, C]; targets: [B] int.  Returns [B, H, W, C].

    Per-image dispatches leave the chip idle between launches; batching
    fills those bubbles (+~25% f32 on one v5e chip), and
    ``dtype=jnp.bfloat16`` runs the fwd+VJP sweep on the bf16 MXU path for
    ~2x more (61 vs 31 attr/s measured at batch 4, ResNet-50 IG-50).  The
    Riemann mean and the x-product stay f32."""
    xs = jnp.asarray(xs)
    n = xs.shape[0] * steps
    while n % chunk:
        chunk -= 1
    tb = jnp.asarray(targets, jnp.int32)
    if dtype is not None:
        params = _cast_params_cached(bundle, dtype)
        mean_grads = _ig_batch_jit(bundle.apply, params, xs.astype(dtype),
                                   tb, steps, chunk)
        return mean_grads * xs
    return _ig_batch_jit(bundle.apply, bundle.params, xs, tb, steps,
                         chunk) * xs


# ---------------------------------------------------------------------------
# IDG (saliencyMethods.py:74-136, 226-314)
# ---------------------------------------------------------------------------

def _alpha_parameters(slopes, steps: int, step_size):
    """Vectorized getAlphaParameters (saliencyMethods.py:264-314).

    Redistributes the `steps` sample budget proportionally to normalized
    slope; note the reference quirk that zero-sample segments do NOT advance
    the alpha window (the `continue` at :302 skips the start_value update),
    so nonzero segments occupy consecutive windows — reproduced here via the
    nonzero-rank cumsum.
    """
    smin, smax = slopes.min(), slopes.max()
    s01 = (slopes - smin) / (smax - smin)
    s01 = s01.at[0].set(0.0)
    ssum = s01 / s01.sum()

    placements_f = ssum * steps
    placements = placements_f.astype(jnp.int32)
    remaining = steps - placements.sum()

    # fill leftover slots at the largest truncated fractions among the
    # segments that truncated to zero (reference marks nonzeros as -1 then
    # takes the top `remaining` of the rest, :281-287)
    marked = jnp.where(placements != 0, -1.0, placements_f)
    order = jnp.flip(jnp.argsort(marked))          # hi -> lo
    rank = jnp.empty_like(order).at[order].set(jnp.arange(steps))
    placements = placements + (rank < remaining).astype(jnp.int32)

    # segment window index = rank among nonzero segments
    nz = placements > 0
    win = jnp.cumsum(nz.astype(jnp.int32)) - 1      # valid where nz

    # per-sample-slot segment id
    cum = jnp.cumsum(placements)
    slots = jnp.arange(steps)
    seg = jnp.searchsorted(cum, slots, side="right")
    seg_start = cum[seg] - placements[seg]
    within = slots - seg_start
    n_seg = placements[seg]
    # reference builds linspace(v, v+step, n+1)[:n]  => v + within*step/n
    alphas = win[seg] * step_size + within * (step_size / n_seg)
    substep = step_size / n_seg
    return alphas, substep


@functools.partial(jax.jit, static_argnums=(0, 4, 6))
def _idg_jit(apply_fn, params, x, baseline, steps, target, chunk):
    diff = x - baseline
    # pilot pass: logit slopes on uniform alphas (getSlopes, :226-260)
    uni = jnp.linspace(0.0, 1.0, steps).reshape(steps, 1, 1, 1)
    pilot_logits = _logits_only(apply_fn, params,
                                baseline[None] + uni * diff[None], target,
                                chunk)
    step_size = 1.0 / (steps - 1)
    slopes = jnp.concatenate(
        [jnp.zeros(1), (pilot_logits[1:] - pilot_logits[:-1]) / step_size])

    alphas, substep = _alpha_parameters(slopes, steps, step_size)

    images = baseline[None] + alphas.reshape(steps, 1, 1, 1) * diff[None]
    grads, logits = _grads_and_logits(apply_fn, params, images, target, chunk)

    # per-step logit slope over the NEW alpha spacing (:117-124)
    d_alpha = alphas[1:] - alphas[:-1]
    new_slopes = jnp.concatenate(
        [jnp.zeros(1), (logits[1:] - logits[:-1]) / d_alpha])
    weighted = grads * new_slopes.reshape(steps, 1, 1, 1)
    weighted = weighted * substep.reshape(steps, 1, 1, 1)
    return weighted.mean(axis=0) * diff


def idg(bundle, x, target, steps: int = 50, baseline=0.0,
        chunk: int = None) -> jnp.ndarray:
    """Importance-Directed Gradients (saliencyMethods.py:74-136)."""
    x = jnp.asarray(x)
    chunk = chunk or min(bundle.meta.batch_size, steps)
    while steps % chunk:
        chunk -= 1
    baseline = jnp.broadcast_to(jnp.asarray(baseline, dtype=x.dtype), x.shape)
    return _idg_jit(bundle.apply, bundle.params, x, baseline, steps, target,
                    chunk)


# ---------------------------------------------------------------------------
# IDGI (saliencyMethods.py:139-181)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 4, 6))
def _idgi_jit(apply_fn, params, x, baseline, steps, target, chunk):
    alphas = jnp.linspace(0.0, 1.0, steps).reshape(steps, 1, 1, 1)
    diff = x - baseline
    images = (baseline[None] + alphas * diff[None]).astype(x.dtype)
    grads, logits = _grads_and_logits(apply_fn, params, images, target, chunk)
    d = logits[1:] - logits[:-1]                     # [steps-1]
    g2 = grads[:-1] ** 2                             # [steps-1, H, W, C]
    denom = g2.sum(axis=(1, 2, 3), keepdims=True)
    # zero-gradient steps (e.g. a dead-ReLU zero baseline) are 0/0 in the
    # reference and poison the whole map with NaN; treat them as
    # zero-contribution steps instead
    term = jnp.where(denom > 0, g2 * d.reshape(-1, 1, 1, 1) / denom, 0.0)
    return term.sum(axis=0)


def idgi(bundle, x, target, steps: int = 50, baseline=0.0,
         chunk: int = None) -> jnp.ndarray:
    x = jnp.asarray(x)
    chunk = chunk or min(bundle.meta.batch_size, steps)
    while steps % chunk:
        chunk -= 1
    baseline = jnp.broadcast_to(jnp.asarray(baseline, dtype=x.dtype), x.shape)
    return _idgi_jit(bundle.apply, bundle.params, x, baseline, steps, target,
                     chunk)


# ---------------------------------------------------------------------------
# SmoothGrad ensemble (saliencyMethods.py:184-205)
# ---------------------------------------------------------------------------

def smooth_grad(bundle, x, target, key, attribution: str = "IG",
                steps: int = 50, baseline=0.0, samples: int = 25,
                sigma_spread: float = 0.15,
                reference_quirk: bool = True, dtype=None,
                noises=None) -> jnp.ndarray:
    """Gaussian-noise ensemble around IG/LIG/IDG; sigma = spread*(max-min).

    TPU path: IG and LIG fold the noise-sample axis into the interpolation
    sweep — ONE chunked ``lax.map`` fwd+VJP over samples*steps images
    instead of `samples` separate device dispatches (the round-1 Python
    loop).  IDG keeps the per-sample loop (its alpha-redistribution pass is
    per-sample logic in _idg_jit).

    ``reference_quirk``: the reference's ``total_gradients[i], _, _ = IG(...)``
    (saliencyMethods.py:196-200) tuple-unpacks the [3,H,W] attribution over
    its channel dim, keeping only channel 0 and broadcasting it back to all 3
    channels.  Kept behind a flag for exact parity; set False for the
    intended all-channel mean.
    """
    x = jnp.asarray(x)
    if noises is None:
        stdev = sigma_spread * (x.max() - x.min())
        noises = stdev * jax.random.normal(key, (samples,) + x.shape,
                                           x.dtype)
    else:
        # injected ABSOLUTE noise samples (golden-parity protocol: the
        # reference's torch.normal draws, saliencyMethods.py:191)
        noises = jnp.asarray(noises, x.dtype)
        samples = int(noises.shape[0])

    if attribution in ("IG", "LIG"):
        alpha_star = 1.0 if attribution == "IG" else 0.9
        bline = jnp.broadcast_to(jnp.asarray(baseline, x.dtype), x.shape)
        chunk = min(bundle.meta.batch_size, steps)
        while (samples * steps) % chunk:
            chunk -= 1
        if dtype is not None:
            # bf16 sweep (see ig_batch): grads return f32 via scores_sum's
            # f32 cast; the noise/interp/mean math stays f32-exact enough
            # because only the fwd+VJP runs low-precision
            params = _cast_params_cached(bundle, dtype)
            per_sample = _sg_sweep_jit(bundle.apply, params,
                                       x.astype(dtype),
                                       noises.astype(dtype),
                                       bline.astype(dtype), steps, samples,
                                       chunk, target, alpha_star)
            per_sample = per_sample.astype(jnp.float32)
        else:
            per_sample = _sg_sweep_jit(bundle.apply, bundle.params, x,
                                       noises, bline, steps, samples,
                                       chunk, target, alpha_star)
        if reference_quirk:
            per_sample = jnp.broadcast_to(per_sample[..., 0:1],
                                          per_sample.shape)
        return per_sample.mean(axis=0)

    if attribution != "IDG":
        raise ValueError(attribution)
    total = jnp.zeros_like(x)
    for i in range(samples):
        a = idg(bundle, x + noises[i], target, steps, baseline,
                chunk=max(1, int(steps / 4)))
        if reference_quirk:
            a = jnp.broadcast_to(a[..., 0:1], a.shape)
        total = total + a
    return total / samples


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 9))
def _sg_sweep_jit(apply_fn, params, x, noises, baseline, steps, samples,
                  chunk, target, alpha_star):
    # target is TRACED (it varies per image; a static target would recompile
    # the whole samples*steps sweep for every class)
    # interpolate in f32 but hand the model images in the sweep dtype: the
    # f32 alpha broadcast silently promoted the whole fwd+VJP back to f32,
    # turning dtype=bf16 into a no-op
    alphas = jnp.linspace(0.0, 1.0, steps).reshape(1, steps, 1, 1, 1)
    xi = x[None] + noises                               # [S, H, W, C]
    diff = xi - baseline[None]
    images = (baseline[None, None] + alphas * diff[:, None]).reshape(
        (samples * steps,) + x.shape).astype(x.dtype)
    grads, logits = _grads_and_logits(apply_fn, params, images, target,
                                      chunk)
    # Riemann mean + x-product in f32 regardless of the sweep dtype
    grads = grads.astype(jnp.float32).reshape((samples, steps) + x.shape)
    logits = logits.astype(jnp.float32)
    diff = diff.astype(jnp.float32)
    if alpha_star >= 1.0:
        mean_grads = grads.mean(axis=1)                 # [S, H, W, C]
    else:
        logits = logits.reshape(samples, steps)

        def one_cutoff(lg):
            cutoff = jnp.max(lg) * alpha_star
            above = lg > cutoff
            first = jnp.argmax(above)
            step = jnp.where(jnp.any(above), first, 1)
            return jnp.maximum(step, 1)

        cut = jax.vmap(one_cutoff)(logits)              # [S]
        w = (jnp.arange(steps)[None] < cut[:, None]).astype(grads.dtype)
        mean_grads = jnp.einsum("st,sthwc->shwc", w, grads) / \
            cut[:, None, None, None].astype(grads.dtype)
    return mean_grads * diff
