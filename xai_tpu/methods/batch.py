"""Batched multi-image attribution — the production fused path.

Round 2 proved the throughput thesis on IG (``gradient.ig_batch``: image +
interpolation axes folded into one dispatch, +33% f32 / 2x bf16), but only
``bench.py`` used it.  This module generalizes the pattern to EVERY
single-dispatch method so the drivers can attribute ``--image_batch`` images
per device call (reference loop shape: evaluatePerturbation.py:520-599, one
image at a time):

- the IG family (ig/lig/idg/idgi/sg) flattens the image axis into the
  chunked interpolation sweep — one ``lax.map`` fwd+VJP over ``B*steps``
  (or ``B*samples*steps``) images, per-image cutoffs/redistribution
  vectorized with ``vmap``;
- every other single-jit method (grad, gbp/gc/ggc, gs/fa/occ/shap, guided
  IG, AGI, all ViT explainers, all CLIP dense explainers) wraps its
  existing fused core in ``jit(vmap(...))`` — the per-image cores are pure
  traceable functions, so batching is one transform, not a rewrite;
- LIME batches through its own fully-fused pipeline (lime_batch), ViT-CX
  through vit_cx_batch (host clustering fed by one batched download), and
  M2IB/surgery through vmapped adapters; only the host-side combinatorial
  methods (XRAI, MDA, TIS's per-image KMeans, RISE's 2000-mask footprint)
  keep the per-image path — ``batch_attribution`` returns None and the
  caller falls back.

Outputs are FINAL [B, H, W] saliencies (same post-processing as the
single-image registry entries: abs-channel-sum, patch upsample, 14x14
down/up for fa/occ), so the driver's metric battery consumes them directly.
"""
from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ablation as AB
from . import gradient as G
from . import guided as GD
from .agi import _agi_attack, _jit_napply, _make_norm_apply
from .gig import _gig_device
# the flattened fwd+VJP sweep core lives in gradient.py so the bench path
# (gradient.ig_batch) and this production path share ONE implementation
from .gradient import _fit_chunk, _flat_grads, _flat_logits
from ..ops.resize import resize_bilinear, resize_nearest_exact


# ---------------------------------------------------------------------------
# IG family: ig / lig (saliencyMethods.py:13-72, batched)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7))
def _ig_family_jit(apply_fn, params, xs_sweep, xs_f32, targets, steps,
                   chunk, alpha_star):
    """Zero-baseline IG/LIG over a batch: [B, H, W] saliency."""
    B = xs_sweep.shape[0]
    alphas = jnp.linspace(0.0, 1.0, steps).astype(xs_sweep.dtype)
    imgs = (alphas.reshape(1, steps, 1, 1, 1) *
            xs_sweep[:, None]).reshape((B * steps,) + xs_sweep.shape[1:])
    tgt = jnp.repeat(targets, steps)
    grads, logits = _flat_grads(apply_fn, params, imgs, tgt, chunk)
    grads = grads.reshape((B, steps) + xs_sweep.shape[1:])
    if alpha_star >= 1.0:
        mean_grads = grads.mean(axis=1)
    else:
        logits = logits.reshape(B, steps)

        def one_cut(lg):
            cutoff = jnp.max(lg) * alpha_star
            above = lg > cutoff
            first = jnp.argmax(above)
            return jnp.maximum(jnp.where(jnp.any(above), first, 1), 1)

        cut = jax.vmap(one_cut)(logits)
        w = (jnp.arange(steps)[None] < cut[:, None]).astype(jnp.float32)
        mean_grads = jnp.einsum("bs,bshwc->bhwc", w, grads) / \
            cut[:, None, None, None].astype(jnp.float32)
    return jnp.abs((mean_grads * xs_f32).sum(-1))


def ig_lig_batch(bundle, xs, targets, steps=50, alpha_star=1.0, dtype=None,
                 chunk=100):
    xs = jnp.asarray(xs, jnp.float32)
    chunk = _fit_chunk(xs.shape[0] * steps, chunk)
    tb = jnp.asarray(targets, jnp.int32)
    if dtype is not None:
        params = G._cast_params_cached(bundle, dtype)
        return _ig_family_jit(bundle.apply, params, xs.astype(dtype), xs,
                              tb, steps, chunk, alpha_star)
    return _ig_family_jit(bundle.apply, bundle.params, xs, xs, tb, steps,
                          chunk, alpha_star)


# ---------------------------------------------------------------------------
# IDG (saliencyMethods.py:74-136) / IDGI (:139-181), batched
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _idg_batch_jit(apply_fn, params, xs_sweep, xs_f32, targets, steps,
                   chunk):
    """All alpha/slope/weight math stays f32; only the model sweeps run in
    ``xs_sweep.dtype`` (the images are built f32 then cast — an f32 alpha
    broadcast onto bf16 images silently promotes the whole sweep)."""
    B = xs_f32.shape[0]
    tgt = jnp.repeat(targets, steps)
    uni = jnp.linspace(0.0, 1.0, steps)
    pilot_imgs = (uni.reshape(1, steps, 1, 1, 1) * xs_f32[:, None]).reshape(
        (B * steps,) + xs_f32.shape[1:]).astype(xs_sweep.dtype)
    pilot = _flat_logits(apply_fn, params, pilot_imgs, tgt,
                         chunk).reshape(B, steps)
    step_size = 1.0 / (steps - 1)
    slopes = jnp.concatenate(
        [jnp.zeros((B, 1)), (pilot[:, 1:] - pilot[:, :-1]) / step_size],
        axis=1)
    alphas, substep = jax.vmap(
        lambda s: G._alpha_parameters(s, steps, step_size))(slopes)
    imgs = (alphas[:, :, None, None, None] * xs_f32[:, None]).reshape(
        (B * steps,) + xs_f32.shape[1:]).astype(xs_sweep.dtype)
    grads, logits = _flat_grads(apply_fn, params, imgs, tgt, chunk)
    grads = grads.reshape((B, steps) + xs_f32.shape[1:])
    logits = logits.reshape(B, steps)
    d_alpha = alphas[:, 1:] - alphas[:, :-1]
    new_slopes = jnp.concatenate(
        [jnp.zeros((B, 1)), (logits[:, 1:] - logits[:, :-1]) / d_alpha],
        axis=1)
    weighted = grads * (new_slopes * substep)[:, :, None, None, None]
    return jnp.abs((weighted.mean(axis=1) * xs_f32).sum(-1))


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _idgi_batch_jit(apply_fn, params, xs_sweep, xs_f32, targets, steps,
                    chunk):
    B = xs_f32.shape[0]
    alphas = jnp.linspace(0.0, 1.0, steps)
    imgs = (alphas.reshape(1, steps, 1, 1, 1) * xs_f32[:, None]).reshape(
        (B * steps,) + xs_f32.shape[1:]).astype(xs_sweep.dtype)
    tgt = jnp.repeat(targets, steps)
    grads, logits = _flat_grads(apply_fn, params, imgs, tgt, chunk)
    grads = grads.reshape((B, steps) + xs_f32.shape[1:])
    logits = logits.reshape(B, steps)
    d = logits[:, 1:] - logits[:, :-1]
    g2 = grads[:, :-1] ** 2
    denom = g2.sum(axis=(2, 3, 4), keepdims=True)
    term = jnp.where(denom > 0,
                     g2 * d[:, :, None, None, None] / denom, 0.0)
    return jnp.abs(term.sum(axis=1).sum(-1))


def idg_batch(bundle, xs, targets, steps=50, dtype=None, chunk=100):
    xs = jnp.asarray(xs, jnp.float32)
    chunk = _fit_chunk(xs.shape[0] * steps, chunk)
    tb = jnp.asarray(targets, jnp.int32)
    params, xsw = bundle.params, xs
    if dtype is not None:
        params = G._cast_params_cached(bundle, dtype)
        xsw = xs.astype(dtype)
    return _idg_batch_jit(bundle.apply, params, xsw, xs, tb, steps, chunk)


def idgi_batch(bundle, xs, targets, steps=50, dtype=None, chunk=100):
    xs = jnp.asarray(xs, jnp.float32)
    chunk = _fit_chunk(xs.shape[0] * steps, chunk)
    tb = jnp.asarray(targets, jnp.int32)
    params, xsw = bundle.params, xs
    if dtype is not None:
        params = G._cast_params_cached(bundle, dtype)
        xsw = xs.astype(dtype)
    return _idgi_batch_jit(bundle.apply, params, xsw, xs, tb, steps, chunk)


# ---------------------------------------------------------------------------
# SmoothGrad (saliencyMethods.py:184-205), batched: B*samples*steps sweep
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 9, 10))
def _sg_batch_jit(apply_fn, params, xs_sweep, xs_f32, keys, steps, samples,
                  chunk, targets, alpha_star, quirk):
    B = xs_f32.shape[0]
    img_shape = xs_f32.shape[1:]

    def noise_one(k, x):
        stdev = 0.15 * (x.max() - x.min())
        return stdev * jax.random.normal(k, (samples,) + img_shape,
                                         jnp.float32)

    noises = jax.vmap(noise_one)(keys, xs_f32)          # [B, S, H, W, C]
    xi = xs_f32[:, None] + noises                       # diff vs 0 baseline
    alphas = jnp.linspace(0.0, 1.0, steps).reshape(1, 1, steps, 1, 1, 1)
    imgs = (alphas * xi[:, :, None]).reshape(
        (B * samples * steps,) + img_shape).astype(xs_sweep.dtype)
    tgt = jnp.repeat(targets, samples * steps)
    grads, logits = _flat_grads(apply_fn, params, imgs, tgt, chunk)
    grads = grads.reshape((B, samples, steps) + img_shape)
    if alpha_star >= 1.0:
        mean_grads = grads.mean(axis=2)                 # [B, S, H, W, C]
    else:
        lg = logits.reshape(B, samples, steps)

        def one_cut(l):
            cutoff = jnp.max(l) * alpha_star
            above = l > cutoff
            first = jnp.argmax(above)
            return jnp.maximum(jnp.where(jnp.any(above), first, 1), 1)

        cut = jax.vmap(jax.vmap(one_cut))(lg)           # [B, S]
        w = (jnp.arange(steps)[None, None] < cut[..., None]).astype(
            jnp.float32)
        mean_grads = jnp.einsum("bst,bsthwc->bshwc", w, grads) / \
            cut[..., None, None, None].astype(jnp.float32)
    per_sample = mean_grads * xi                        # [B, S, H, W, C]
    if quirk:
        # reference tuple-unpack keeps channel 0 broadcast over channels
        per_sample = jnp.broadcast_to(per_sample[..., 0:1], per_sample.shape)
    return jnp.abs(per_sample.mean(axis=1).sum(-1))


def sg_batch(bundle, xs, targets, keys, steps=50, samples=25,
             alpha_star=1.0, dtype=None, chunk=None, quirk=True):
    xs = jnp.asarray(xs, jnp.float32)
    chunk = _fit_chunk(xs.shape[0] * samples * steps,
                       chunk or min(bundle.meta.batch_size, steps))
    tb = jnp.asarray(targets, jnp.int32)
    keys = jnp.asarray(keys)
    if dtype is not None:
        params = G._cast_params_cached(bundle, dtype)
        return _sg_batch_jit(bundle.apply, params, xs.astype(dtype), xs,
                             keys, steps, samples, chunk, tb, alpha_star,
                             quirk)
    return _sg_batch_jit(bundle.apply, bundle.params, xs, xs, keys, steps,
                         samples, chunk, tb, alpha_star, quirk)


# ---------------------------------------------------------------------------
# AGI: vmapped PGD attack + per-image host percentile clip (AGI.py:83-139)
# ---------------------------------------------------------------------------

def agi_batch(bundle, trans_imgs, epsilon=0.05, topk=1, max_iter=20,
              dtype=None, as_numpy=True):
    """Driver config: attack classes range(0, 999, 1000//topk); percentile
    [80, 99] clip per image.  trans_imgs: [B, H, W, 3] in [0, 1].

    ``dtype=bf16`` runs the PGD attack sweep (forwards + both softmax VJPs,
    the delta accumulation) in bf16; the INITIAL prediction — which pins
    both the skipped-target set and the ``-grad_label`` label class — is
    always computed in f32, and the percentile post-processing is always
    f32.  sign() makes FGSM steps robust to the quantization, but the
    attack trajectory CAN still diverge from f32 where a per-step
    early-exit argmax flips — bf16 here is a throughput operating point,
    not a bit-parity one (PARITY.md)."""
    xs = jnp.asarray(trans_imgs, jnp.float32)
    napply = _make_norm_apply(bundle.apply, tuple(bundle.meta.mean),
                              tuple(bundle.meta.std))
    params, xsw = bundle.params, xs
    # f32 initial argmax even under bf16: a flipped init_pred would change
    # WHICH classes are attacked, not just arithmetic precision (ADVICE r3)
    init_preds = jnp.argmax(_jit_napply(napply)(bundle.params, xs), axis=-1)
    if dtype is not None:
        params = G._cast_params_cached(bundle, dtype)
        xsw = xs.astype(dtype)
    selected = list(range(0, 999, int(1000 / topk)))

    total = _agi_batch_jit(napply, params, xsw, init_preds,
                           tuple(selected), max_iter, epsilon)
    # percentile post stays on device (downloading the [B, H, W, 3] raw
    # deltas was 3x the bytes of the final maps at ~8 MB/s tunnel BW)
    from .agi import _agi_post
    post = _agi_post(total.astype(jnp.float32))
    if not as_numpy:
        return jnp.abs(post)
    return np.abs(np.asarray(post))


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _agi_batch_jit(napply, params, xs, init_preds, selected, max_iter,
                   epsilon):
    def one(x, ip):
        step_grad = jnp.zeros_like(x)
        for t in selected:
            delta = _agi_attack(napply, params, x, ip, t, max_iter, epsilon)
            # reference skips attacking the image's own predicted class
            step_grad = step_grad + jnp.where(ip == t, 0.0, delta)
        return step_grad

    return jax.vmap(one)(xs, init_preds)


# ---------------------------------------------------------------------------
# generic vmapped per-image adapters
# ---------------------------------------------------------------------------

_ADAPTER_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_ADAPTER_CACHE_CAP = 128  # ≥ ~46 methods x 2 live models (an interleaved
                          # two-model sweep's working set); LRU eviction
                          # only re-pays a trace, never corrupts


def _cached_vmapped(name, anchor, extra_key, make):
    """jit(vmap(adapter)) cached per (name, anchor id, statics); the anchor
    object is held and identity-verified (id reuse after GC would otherwise
    serve a stale trace — the _CAST_CACHE lesson).  ``make`` runs ONLY on a
    cache miss: adapter construction may itself dispatch eager device work
    (fa/shap build their patch masks), which used to run on every flush.
    Bounded LRU: an unbounded map would pin every swept model's traces (and
    through the anchor, its params) for process lifetime."""
    key = (name, id(anchor), extra_key)
    hit = _ADAPTER_CACHE.get(key)
    if hit is not None and hit[0] is anchor:
        _ADAPTER_CACHE.move_to_end(key)
        return hit[1]
    adapter = make()
    if adapter is None:
        return None
    fn = jax.jit(jax.vmap(adapter, in_axes=(None, 0, 0, 0, 0)))
    _ADAPTER_CACHE[key] = (anchor, fn)
    _ADAPTER_CACHE.move_to_end(key)
    while len(_ADAPTER_CACHE) > _ADAPTER_CACHE_CAP:
        _ADAPTER_CACHE.popitem(last=False)
    return fn


def _down_up(attr_hwc, img_hw, num_patches=14):
    chw = jnp.transpose(attr_hwc, (2, 0, 1))
    down = resize_nearest_exact(chw, (num_patches, num_patches))
    up = resize_bilinear(down, (img_hw, img_hw))
    return jnp.transpose(up, (1, 2, 0))


def _abs_sum(a):
    return jnp.abs(a.sum(-1))


# production driver constants (evaluatePerturbation.py:94-97, 164-176);
# overridable via batch_attribution(opts=...) so tests can run tiny shapes
_DEFAULT_OPTS = {
    "num_patches": 14,        # fa/shap patch grid
    "occ_window": 64, "occ_stride": 32,
    "shap_samples": 25,
    "gc_layer": "layer4",
    "m2ib_vlayer": 9,         # bottleneck insertion block (iba.py vlayer)
}


def _cnn_adapter(name, bundle, img_hw, steps, opts):
    """Traceable per-image fn (params, x, target, key, extra) -> [H, W]."""
    apply_fn = bundle.apply

    def in_grad(p, x, t):
        return jax.grad(lambda xi: apply_fn(p, xi[None])[0, t])(x)

    if name == "grad":
        return lambda p, x, t, k, e: _abs_sum(in_grad(p, x, t))
    if name == "inp_x_grad":
        return lambda p, x, t, k, e: _abs_sum(x * in_grad(p, x, t))
    if name == "gbp":
        gapply = GD._guided_apply(bundle)
        return lambda p, x, t, k, e: _abs_sum(
            jax.grad(lambda xi: gapply(p, xi[None])[0, t])(x))
    if name in ("gc", "ggc"):
        ap = bundle.apply_probed
        layer = opts["gc_layer"]

        def gc_fn(p, x, t, k, e):
            cam = GD._layer_gradcam(ap, p, x, t, layer, True)
            return 3.0 * jnp.abs(resize_bilinear(cam, (img_hw, img_hw)))

        if name == "gc":
            return gc_fn
        gapply = GD._guided_apply(bundle)

        def ggc_fn(p, x, t, k, e):
            cam = GD._layer_gradcam(ap, p, x, t, layer, True)
            up = resize_nearest_exact(cam, (img_hw, img_hw))
            gbp = jax.grad(lambda xi: gapply(p, xi[None])[0, t])(x)
            return _abs_sum(gbp * up[..., None])

        return ggc_fn
    if name == "gs":
        def gs_fn(p, x, t, k, e):
            k2, bk = jax.random.split(k)
            baselines = jax.random.normal(bk, (1,) + x.shape, x.dtype)
            return _abs_sum(AB._gradient_shap(apply_fn, p, x, baselines, t,
                                              5, k2))

        return gs_fn
    np_ = opts["num_patches"]
    if name == "fa":
        mask = AB.patch_mask(img_hw, np_)
        n = np_ * np_
        chunk = _fit_chunk(n, 49)
        return lambda p, x, t, k, e: _abs_sum(_down_up(
            AB._fa_jit(apply_fn, p, x, mask, t, n, chunk, 0.0), img_hw,
            np_))
    if name == "occ":
        win, stride = opts["occ_window"], opts["occ_stride"]
        n_pos = (img_hw - win) // stride + 1
        chunk = _fit_chunk(n_pos * n_pos, 36)
        return lambda p, x, t, k, e: _abs_sum(_down_up(
            AB._occ_jit(apply_fn, p, x, t, img_hw, n_pos, win, stride,
                        chunk, 0.0), img_hw, np_))
    if name == "shap":
        mask = AB.patch_mask(img_hw, np_)
        n = np_ * np_
        # _shapley_jit pads the n+1 coalition steps to a chunk multiple
        # internally — divisor-fitting here was harmful: n+1 = 197 is
        # prime, so it degenerated the sweep to chunk=1 (197 scan steps
        # of batch-1 forwards instead of 5 of batch-49)
        chunk = min(49, n + 1)
        n_samp = opts["shap_samples"]

        def shap_fn(p, x, t, k, e):
            perms = jax.vmap(lambda kk: jax.random.permutation(kk, n))(
                jax.random.split(k, n_samp))
            return _abs_sum(AB._shapley_jit(apply_fn, p, x, mask, t, perms,
                                            n, chunk))

        return shap_fn
    if name == "gig":
        def gig_fn(p, x, t, k, e):
            x32 = x.astype(jnp.float32)
            return _abs_sum(_gig_device(apply_fn, p, x32, steps, 0.5, 1.0,
                                        jnp.zeros_like(x32), t))

        return gig_fn
    return None


def _vit_adapter(name, bundle, img_hw, steps, opts):
    from . import vit_explain as VE
    from . import vit_lrp as VL

    ap, at, cfg = bundle.apply_probed, bundle.apply_taps, bundle.extras
    up = lambda m: jnp.abs(resize_bilinear(m, (img_hw, img_hw)))
    table = {
        "attn": lambda p, x, t, k, e: up(
            VE._raw_attn_jit(at, -1, p, x[None])),
        "grad": lambda p, x, t, k, e: up(
            VE._attn_grad_jit(ap, cfg, -1, p, x[None], t)),
        "cam_attn": lambda p, x, t, k, e: up(
            VE._cam_attn_jit(ap, cfg, -1, p, x[None], t)),
        "n_rollout": lambda p, x, t, k, e: up(
            VE._rollout_jit(at, 0, False, p, x[None])),
        "rollout": lambda p, x, t, k, e: up(
            VE._rollout_jit(at, 0, True, p, x[None])),
        "t_attn": lambda p, x, t, k, e: up(
            VE._transition_jit(ap, cfg, 0, 20, p, x[None], t)),
        "attn_ig": lambda p, x, t, k, e: up(
            VE._attn_ig_jit(ap, cfg, 20, p, x[None], t)),
        "attn_attr": lambda p, x, t, k, e: up(
            VE._attn_attr_jit(ap, cfg, 0, p, x[None], t)),
        "bi_attn": lambda p, x, t, k, e: up(
            VE._bidirectional_jit(ap, cfg, 20, 4, p, x[None], t)),
        "InFlow": lambda p, x, t, k, e: up(
            VE._rave_jit(ap, cfg, True, 0, 12, p, x[None], t)),
        "t_attr": lambda p, x, t, k, e: up(
            VL._t_attr_jit(ap, cfg, 0, p, x[None], t)),
    }
    return table.get(name)


# which batched extra array each CLIP method consumes
CLIP_EXTRA_KIND = {
    "eclip": "txt", "eclip_nograd": "txt", "eclip_wo": "txt",
    "maskclip": "txt", "grad_cam": "txt", "selfattn": "none",
    "game": "tok", "rollout": "tok", "lrp": "tok", "m2ib": "txt",
    "surgery": "none",
}


def _clip_adapter(name, bundle, img_hw, steps, opts):
    from . import clip_explain as CE

    model = bundle.extras["model"]
    cfg = bundle.extras["cfg"]
    at = bundle.apply_taps
    up = lambda m: jnp.abs(resize_bilinear(m, (img_hw, img_hw)))
    table = {
        "eclip": lambda p, x, t, k, e: up(CE._grad_eclip_jit(
            model, cfg, True, True, p, x[None], e[None])),
        "eclip_nograd": lambda p, x, t, k, e: up(CE._grad_eclip_jit(
            model, cfg, True, False, p, x[None], e[None])),
        "eclip_wo": lambda p, x, t, k, e: up(CE._grad_eclip_jit(
            model, cfg, False, True, p, x[None], e[None])),
        "maskclip": lambda p, x, t, k, e: up(CE._mask_clip_jit(
            model, cfg, p, x[None], e[None])),
        "selfattn": lambda p, x, t, k, e: up(CE._self_attn_jit(
            model, cfg, p, x[None])),
        "grad_cam": lambda p, x, t, k, e: up(CE._clip_grad_cam_jit(
            model, cfg, p, x[None], e[None])),
        "game": lambda p, x, t, k, e: up(CE._game_jit(
            model, cfg, cfg.vision_layers - 1, p, x[None], e[None])),
        "lrp": lambda p, x, t, k, e: up(CE._clip_lrp_jit(
            model, cfg, 0, 0, p, x[None], e[None])[1]),
    }
    if name == "surgery":
        from .clip_surgery import _surgery_map_jit
        txt_table = jnp.asarray(bundle.extras["text_embeddings"])
        n_txt = int(min(60, txt_table.shape[0]))

        def surg_fn(p, x, t, k, e):
            # per-image text table: target caption first + the other
            # first-(n_txt-1) class texts, exactly as the sequential
            # registry entry builds it (registry_clip._surgery_entry)
            j = jnp.arange(n_txt - 1)
            others = jnp.where(j < t, j, j + 1)
            txt = jnp.concatenate([txt_table[t][None], txt_table[others]])
            return jnp.abs(_surgery_map_jit.__wrapped__(
                model, cfg, p, x[None], txt))

        return surg_fn
    if name == "m2ib":
        from .clip_m2ib import _iba_jit
        vlayer = opts["m2ib_vlayer"]

        def m2ib_fn(p, x, t, k, e):
            # EXACTLY the sequential vision_heatmap_iba defaults (vlayer 9,
            # 10 steps, bottleneck batch 10, beta 0.1, lr 1.0) and the same
            # per-image noise stream (split(key, steps) -> per-step draws),
            # so batched == sequential per image; minmax + abs as the
            # registry entry applies (registry_clip._m2ib_entry)
            h_shape = (cfg.tokens, cfg.vision_width)
            step_keys = jax.random.split(k, 10)
            noises = jax.vmap(lambda kk: jax.random.normal(
                kk, (10,) + h_shape))(step_keys)
            m = _iba_jit.__wrapped__(model, cfg, vlayer, 10, 0.1, 1.0,
                                     img_hw, p, x[None], e[None], noises)
            return jnp.abs((m - m.min()) / (m.max() - m.min()))

        return m2ib_fn
    if name == "rollout":
        def ro_fn(p, x, t, k, e):
            _, taps = at(p, x[None])
            a = taps["attn"][-1].mean(axis=1)
            n = a.shape[-1]
            aug = a + jnp.eye(n)
            aug = aug / aug.sum(-1, keepdims=True)
            g = cfg.grid
            return up(aug[0, 0, 1:].reshape(g, g))

        return ro_fn
    return table.get(name)


_ADAPTERS = {"cnn": _cnn_adapter, "vit": _vit_adapter, "clip": _clip_adapter}


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

BATCH_NAMES = {
    "cnn": ("ig", "lig", "idg", "idgi", "sg", "agi", "grad", "inp_x_grad",
            "gbp", "gc", "ggc", "gs", "fa", "occ", "shap", "gig", "lime"),
    "vit": ("attn", "grad", "cam_attn", "n_rollout", "rollout", "t_attn",
            "attn_ig", "attn_attr", "bi_attn", "InFlow", "t_attr",
            "VIT_CX"),
    "clip": tuple(CLIP_EXTRA_KIND),
}


def has_batch_impl(family: str, name: str) -> bool:
    return name in BATCH_NAMES.get(family, ())


def batch_attribution(family, name, bundle, xs, trans_imgs, targets, keys,
                      extras=None, img_hw=224, steps=50, dtype=None,
                      opts=None, as_numpy=True):
    """[B, H, W] final saliencies in one (or a few) fused dispatches.

    Returns None when the method has no batched implementation — the caller
    loops the single-image path.  ``extras`` (CLIP): {"txt_emb": [B, E],
    "text_tokens": [B, L]} stacked per-image rows.  ``opts`` overrides the
    production method constants (_DEFAULT_OPTS) for small-shape tests.

    ``as_numpy=False`` (generic jit(vmap) adapter path only) returns the
    device array instead of downloading: the r5 clip_cost_probe measured
    the [B, 224, 224] map download as 70-90% of the e2e batch time on the
    dev tunnel (~25 MB/s device->host) while device compute is 8-15x
    faster — callers that feed the maps straight back to device work (the
    metric battery) can skip the round trip.
    """
    xs = jnp.asarray(xs)
    targets = np.asarray(targets)
    B = xs.shape[0]
    opts = {**_DEFAULT_OPTS, **(opts or {})}

    # IG-family custom fused sweeps
    if family == "cnn":
        if name == "ig":
            return np.asarray(ig_lig_batch(bundle, xs, targets, steps, 1.0,
                                           dtype))
        if name == "lig":
            return np.asarray(ig_lig_batch(bundle, xs, targets, steps, 0.9,
                                           dtype))
        if name == "idg":
            chunk = min(bundle.meta.batch_size * 2, 100)
            return np.asarray(idg_batch(bundle, xs, targets, steps, dtype,
                                        chunk))
        if name == "idgi":
            chunk = min(bundle.meta.batch_size * 2, 100)
            return np.asarray(idgi_batch(bundle, xs, targets, steps, dtype,
                                         chunk))
        if name == "sg":
            return np.asarray(sg_batch(bundle, xs, targets,
                                       jnp.asarray(keys), steps,
                                       dtype=dtype))
        if name == "agi":
            return agi_batch(bundle, trans_imgs, dtype=dtype,
                             as_numpy=as_numpy)
        if name == "lime":
            from .lime import lime_batch
            # registry parity: model on the UNNORMALIZED image, mask * 3.0
            # (the driver's abs-sum over the 3 identical channels)
            return 3.0 * lime_batch(bundle, np.asarray(trans_imgs), keys,
                                    dtype=dtype)

    if family == "vit" and name == "VIT_CX":
        from .vit_cx import vit_cx_batch
        # registry parity: 3 * |map| (driver abs-sums the 3-channel
        # broadcast); per-image keys reproduce the sequential noise draws
        return 3.0 * np.abs(vit_cx_batch(
            bundle, xs, np.asarray(targets, np.int32), keys=keys,
            dtype=dtype))

    make_adapter = _ADAPTERS.get(family)
    if make_adapter is None:
        return None

    anchor = bundle.apply
    fn = _cached_vmapped(
        (family, name), anchor,
        (img_hw, steps) + tuple(sorted(opts.items())),
        lambda: make_adapter(name, bundle, img_hw, steps, opts))
    if fn is None:
        return None
    if family == "clip":
        kind = CLIP_EXTRA_KIND[name]
        if kind == "txt":
            extra = jnp.asarray(extras["txt_emb"])
        elif kind == "tok":
            extra = jnp.asarray(extras["text_tokens"])
        else:
            extra = jnp.zeros((B, 1))
    else:
        extra = jnp.zeros((B, 1))
    params = bundle.params
    if dtype is not None:
        # generic low-precision sweep: the adapters' matmul/conv work runs
        # on the bf16 MXU path; patch upsamples and abs-sums ride along and
        # the result is cast back (rank stability covered by
        # test_batch_attr.test_bf16_tolerances_recorded)
        params = G._cast_params_cached(bundle, dtype)
        xs = xs.astype(dtype)
        if extra.dtype in (jnp.float32, jnp.float64):
            extra = extra.astype(dtype)
    out = fn(params, xs, jnp.asarray(targets, jnp.int32),
             jnp.asarray(keys), extra)
    if not as_numpy:
        return out.astype(jnp.float32) if out.dtype != jnp.float32 else out
    return np.asarray(out).astype(np.float32)
