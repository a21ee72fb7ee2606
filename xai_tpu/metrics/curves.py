"""The unified on-device ranked-reveal curve engine.

Every perturbation metric in the reference (MAS / RISE / AIC / MoRF-LeRF /
Monotonicity — util/test_methods/*) shares one inner loop: rank pixels by
saliency, progressively swap `step_size` pixels per step from a start image
to a finish image, and record the model's softmax response at each step.
The reference runs that loop on host with a device round-trip per step
(MASTestFunctions.py:245-281 — the #1 perf bug per SURVEY §3.1), and runs it
8 times per image (once per metric object).

TPU-native design:
- the reveal schedule is a per-pixel int ("the step at which this pixel
  flips"), so the image at step s is ``where(flip_step <= s, finish, start)``
  — computed on the fly inside the jitted loop, fused by XLA with the model's
  first conv; zero host round-trips;
- all steps are evaluated as one ``lax.map`` of vmapped forwards (chunked to
  bound HBM);
- ONE pass returns target-prob + top-1-indicator + entropy, which serves
  every metric that shares a (substrate, direction) pair.  The full 8-metric
  battery (evaluatePerturbation.py:462-482) therefore costs 3 passes instead
  of 8 (blur/ins ⊇ {MAS_ins, RISE_ins, AIC_ins, MONO_pos}; zeros/del ⊇
  {MAS_del, RISE_del, AIC_del, MONO_neg, MORF}; zeros/lerf ⊇ {LERF}).
- monotone normalization (MASTestFunctions.py:297-309) is a cummax/cummin;
  the MAS density response (:225-263) is a segment-sum + cumsum.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stats import auc_np, entropy_bits, spearman_np


@dataclasses.dataclass
class CurveOutputs:
    """Raw per-step curve data for one (start, finish, order) pass."""

    target_prob: np.ndarray      # [n_steps+1] softmax prob of target class
    top1_is_target: np.ndarray   # [n_steps+1] 0/1
    entropy: np.ndarray          # [n_steps+1] bits
    original_pred: float         # target prob of the untouched input
    baseline_pred: float         # target prob of the fully-substituted input
    baseline_top1: float         # top-1-is-target of the substituted input


# ---------------------------------------------------------------------------
# reveal schedules
# ---------------------------------------------------------------------------

def pixel_flip_steps(saliency: np.ndarray, step_size: int,
                     descending: bool = True) -> np.ndarray:
    """[H, W] saliency -> [H*W] int32 'flip step' (1-indexed).

    Matches np.flip(np.argsort(...)) ordering incl. its tie behaviour
    (MASTestFunctions.py:207-212): computed with numpy on host — it is a
    50k-element sort, negligible next to the forwards.
    """
    flat = np.asarray(saliency).reshape(-1)
    hw = flat.shape[0]
    if descending:
        order = np.flip(np.argsort(flat.reshape(1, hw), axis=1), axis=-1)[0]
    else:
        order = np.argsort(flat.reshape(1, hw), axis=1)[0]
    flip = np.empty(hw, dtype=np.int32)
    flip[order] = np.arange(hw, dtype=np.int32) // step_size + 1
    return flip


def patch_flip_steps(saliency: np.ndarray, patch_mask: np.ndarray,
                     descending: bool = True) -> np.ndarray:
    """Patch-ranked variant (MASTestFunctions.py:213-223): patches ordered by
    mean saliency; one patch flips per step."""
    flat = np.asarray(saliency).reshape(-1)
    pm = np.asarray(patch_mask).reshape(-1)
    n_seg = len(np.unique(pm))
    seg_sal = np.zeros(n_seg)
    for i in range(n_seg):
        seg_sal[i] = flat[pm == i].mean()
    if descending:
        order = np.flip(np.argsort(seg_sal, axis=0), axis=-1)
    else:
        order = np.argsort(seg_sal, axis=0)
    seg_step = np.empty(n_seg, dtype=np.int32)
    seg_step[order] = np.arange(n_seg, dtype=np.int32) + 1
    return seg_step[pm]


# ---------------------------------------------------------------------------
# the device engine
# ---------------------------------------------------------------------------

def _curves_core(apply_fn, params, start, finish, flip_step,
                 n_steps: int, chunk: int, target):
    """start/finish: [H, W, C]; flip_step: [H*W] int32.

    Returns probs of target, top1 indicator, entropy at steps 0..n_steps.
    Pure trace-time function — jitted via _curves_device or inlined into
    the fused battery."""
    H, W, C = start.shape
    mask_hw = flip_step.reshape(H, W, 1)

    def probs_at(s):
        img = jnp.where(mask_hw <= s, finish, start)
        logits = apply_fn(params, img[None])[0]
        p = jax.nn.softmax(logits, axis=-1)
        return (p[target], (jnp.argmax(logits) == target).astype(jnp.float32),
                entropy_bits(p))

    total = n_steps + 1
    padded = ((total + chunk - 1) // chunk) * chunk
    steps = jnp.arange(padded, dtype=jnp.int32).reshape(-1, chunk)
    tp, top1, ent = jax.lax.map(jax.vmap(probs_at), steps)
    return (tp.reshape(-1)[:total], top1.reshape(-1)[:total],
            ent.reshape(-1)[:total])


_curves_device = functools.partial(jax.jit, static_argnums=(0, 5, 6))(
    _curves_core)


@functools.partial(jax.jit, static_argnums=(0, 1, 6, 7))
def _battery_device(apply_fn, blur_fn, params, x, desc, asc,
                    n_steps: int, chunk: int, target):
    """The entire metric battery's device work as ONE dispatch: blur
    substrate, target selection (argmax when target < 0), and all three
    reveal passes.  Eager per-op dispatches cost ~30-120 ms each on the
    axon tunnel, so the fused form is ~10x the per-pass version."""
    blurred = blur_fn(x[None])[0]
    zeros = jnp.zeros_like(x)
    t = jax.lax.cond(
        target < 0,
        lambda: jnp.argmax(apply_fn(params, x[None])[0]).astype(jnp.int32),
        lambda: jnp.asarray(target, jnp.int32))
    ins = _curves_core(apply_fn, params, blurred, x, desc, n_steps, chunk, t)
    dele = _curves_core(apply_fn, params, x, zeros, desc, n_steps, chunk, t)
    lerf = _curves_core(apply_fn, params, x, zeros, asc, n_steps, chunk, t)
    return ins, dele, lerf, t


def reveal_curves(apply_fn, params, start, finish, flip_step, n_steps: int,
                  target: int, chunk: int = 25,
                  original_img=None, original_at: str = None) -> CurveOutputs:
    """Run one full reveal pass.

    start is the step-0 image; finish is the fully-substituted end state.
    ``original_at`` names which endpoint is the clean input ("start" for a
    deletion pass, "finish" for insertion); its prediction is read straight
    off the curve — step 0 is exactly `start` (flip steps are 1-indexed) and
    step n is exactly `finish` — so no separate forward is needed (an eager
    bundle.apply here used to cost ~650 ms/pass on the axon tunnel).
    ``original_img`` remains for callers whose original is NEITHER endpoint
    (or as a legacy exact-match fallback when ``original_at`` is omitted).
    """
    tp, top1, ent = _curves_device(apply_fn, params, jnp.asarray(start),
                                   jnp.asarray(finish),
                                   jnp.asarray(flip_step), n_steps, chunk,
                                   target)
    tp = np.asarray(tp)
    top1 = np.asarray(top1)
    ent = np.asarray(ent)
    if original_at is None and original_img is not None:
        # legacy path: infer the endpoint by EXACT equality (allclose could
        # misclassify an insertion pass on an image ~equal to its substrate)
        if np.array_equal(np.asarray(original_img), np.asarray(start)):
            original_at = "start"
        elif np.array_equal(np.asarray(original_img), np.asarray(finish)):
            original_at = "finish"
    if original_at == "start":
        original_pred = float(tp[0])
        baseline_pred = float(tp[-1])
        baseline_top1 = float(top1[-1])
    elif original_at == "finish":
        original_pred = float(tp[-1])
        baseline_pred = float(tp[0])
        baseline_top1 = float(top1[0])
    elif original_img is not None:   # original is neither endpoint
        o_probs = jax.nn.softmax(
            _jit_apply(apply_fn)(params, jnp.asarray(original_img)[None])[0])
        original_pred = float(o_probs[target])
        baseline_pred = float(tp[0])
        baseline_top1 = float(top1[0])
    else:
        raise ValueError("pass original_at='start'/'finish' or original_img")
    return CurveOutputs(tp, top1, ent, original_pred, baseline_pred,
                        baseline_top1)


@functools.lru_cache(maxsize=64)
def _jit_apply(apply_fn):
    """jit an apply function keyed by its identity (stable per bundle)."""
    return jax.jit(apply_fn)


# ---------------------------------------------------------------------------
# metric post-processing (all O(n_steps) — host numpy, matching reference
# float semantics exactly)
# ---------------------------------------------------------------------------

def monotone_normalize(response: np.ndarray, original_pred: float,
                       baseline_pred: float, mode: str) -> np.ndarray:
    """MASTestFunctions.py:297-309 — normalize against (original, baseline)
    and enforce monotonicity with a running min (del) / max (ins).

    NaN entries (degenerate baseline == original, e.g. AIC's 0/0) replicate
    the reference's Python ``min(mn, nan) -> mn`` semantics: they leave the
    running value unchanged (initial value 1.0 for del, 0.0 for ins).
    """
    denom = abs(original_pred - baseline_pred)
    with np.errstate(invalid="ignore", divide="ignore"):
        norm = np.clip((response - baseline_pred) / denom, 0.0, 1.0)
    nan = np.isnan(norm)
    if mode in ("del", "morf", "lerf"):
        v = np.where(nan, np.inf, norm)
        return np.minimum.accumulate(np.concatenate([[1.0], v]))[1:]
    v = np.where(nan, -np.inf, norm)
    return np.maximum.accumulate(np.concatenate([[0.0], v]))[1:]


def density_response(saliency: np.ndarray, flip_step: np.ndarray,
                     n_steps: int, mode: str) -> np.ndarray:
    """MAS attribution-density curve (MASTestFunctions.py:225-263)."""
    flat = np.asarray(saliency).reshape(-1).astype(np.float64)
    total = flat.sum()
    per_step = np.bincount(flip_step, weights=flat,
                           minlength=n_steps + 1)[1:n_steps + 1]
    # an all-zero map (e.g. LIME with no positive segments) is 0/0 here;
    # the NaN density is handled by mas_scores' NaN-ramp fallback exactly
    # as the reference does — just don't spam RuntimeWarnings on the way
    with np.errstate(invalid="ignore", divide="ignore"):
        frac = np.cumsum(per_step) / total
    if mode in ("del", "morf", "lerf"):
        return np.concatenate([[1.0], 1.0 - frac])
    return np.concatenate([[0.0], frac])


def mas_scores(normalized: np.ndarray, density: np.ndarray,
               mode: str) -> np.ndarray:
    """Density-alignment correction + minmax (MASTestFunctions.py:352-368)."""
    penalty = np.abs(normalized - density)
    if mode in ("del", "morf", "lerf"):
        corrected = normalized + penalty
    else:
        corrected = normalized - penalty
    corrected = corrected.clip(0, 1)
    rng = corrected.max() - corrected.min()
    with np.errstate(invalid="ignore", divide="ignore"):
        corrected = (corrected - corrected.min()) / rng
    if np.isnan(corrected).any():
        n = len(normalized)
        if mode in ("del", "morf"):
            corrected = np.linspace(1, 0, n)
        else:
            corrected = np.linspace(0, 1, n)
    return corrected


def assemble_battery_scores(ins_tp, ins_t1, del_tp, del_t1, lerf_tp,
                            saliency, desc, n_steps: int) -> dict:
    """The ONE 10-score assembly over the three reveal curves — shared by
    run_battery (sequential driver) and parallel.sharded_battery (batched
    --image_batch driver) so a metric-semantics change can never diverge
    the two paths (the AIC endpoint-anchor fix had to land twice before).

    Endpoint conventions (evaluatePerturbation.py:448-495): the insertion
    curve ENDS at the clean image and starts at the substrate; the deletion
    curve STARTS at the clean image.  AIC anchors come off the top-1
    indicator's own endpoints (exactly 1.0 for the driver's argmax target;
    0.0 for an explicit non-argmax target — hard-coding 1.0 distorted that
    case)."""
    ins_tp = np.asarray(ins_tp)
    ins_t1 = np.asarray(ins_t1)
    del_tp = np.asarray(del_tp)
    del_t1 = np.asarray(del_t1)
    lerf_tp = np.asarray(lerf_tp)

    # --- MAS ins/del (blur-ins, zeros-del; MASTestFunctions) ---
    rise_ins = monotone_normalize(ins_tp, float(ins_tp[-1]),
                                  float(ins_tp[0]), "ins")
    rise_del = monotone_normalize(del_tp, float(del_tp[0]),
                                  float(del_tp[-1]), "del")
    dens_ins = density_response(saliency, desc, n_steps, "ins")
    dens_del = density_response(saliency, desc, n_steps, "del")

    # --- AIC ins/del (top-1-preserved binary response; AICTestFunctions) ---
    aic_ins = monotone_normalize(ins_t1, float(ins_t1[-1]),
                                 float(ins_t1[0]), "ins")
    aic_del = monotone_normalize(del_t1, float(del_t1[0]),
                                 float(del_t1[-1]), "del")

    return {
        "MAS_ins": float(auc_np(mas_scores(rise_ins, dens_ins, "ins"))),
        "MAS_del": float(auc_np(mas_scores(rise_del, dens_del, "del"))),
        "RISE_ins": float(auc_np(rise_ins)),
        "RISE_del": float(auc_np(rise_del)),
        "AIC_ins": float(auc_np(aic_ins)),
        "AIC_del": float(auc_np(aic_del)),
        # --- MoRF/LeRF raw responses (PosNegPertFunctions returns raw) ---
        "LERF_res": float(auc_np(lerf_tp)),
        "MORF_res": float(auc_np(del_tp)),
        # --- Monotonicity (raw response vs ideal ramp; MonotonicityTest) ---
        "MONO_pos": float(spearman_np(np.linspace(0, 1, n_steps + 1),
                                      ins_tp)),
        "MONO_neg": float(spearman_np(np.linspace(1, 0, n_steps + 1),
                                      del_tp)),
    }


# ---------------------------------------------------------------------------
# the full battery — evaluatePerturbation.run_perturbation equivalent
# ---------------------------------------------------------------------------

def run_battery(apply_fn, params, input_img, saliency, blur_fn,
                step_size: Optional[int] = None, chunk: int = 45,
                target: Optional[int] = None) -> dict:
    """Compute all 10 perturbation scores for one image.

    input_img: [H, W, C] normalized input. saliency: [H, W].
    Returns the reference's Counter keys
    (evaluatePerturbation.py:484-495) -> float score.
    """
    H, W, C = input_img.shape
    hw = H * W
    step_size = step_size or H
    n_steps = (hw + step_size - 1) // step_size

    x = jnp.asarray(input_img)
    desc = pixel_flip_steps(saliency, step_size, descending=True)
    asc = pixel_flip_steps(saliency, step_size, descending=False)

    # one fused device dispatch: blur + target + 3 reveal passes
    # (pass 1: blur/ins; pass 2: zeros/del; pass 3: zeros/lerf)
    raw_ins, raw_del, raw_lerf, _ = jax.device_get(_battery_device(
        apply_fn, blur_fn, params, x, jnp.asarray(desc), jnp.asarray(asc),
        n_steps, chunk, -1 if target is None else int(target)))

    def _outs(raw, insertion):
        tp, top1, ent = (np.asarray(v) for v in raw)
        # original is the clean-input endpoint; baseline the substituted one
        o, b = (-1, 0) if insertion else (0, -1)
        return CurveOutputs(tp, top1, ent, float(tp[o]), float(tp[b]),
                            float(top1[b]))

    ins = _outs(raw_ins, True)
    dele = _outs(raw_del, False)
    lerf = _outs(raw_lerf, False)
    return assemble_battery_scores(ins.target_prob, ins.top1_is_target,
                                   dele.target_prob, dele.top1_is_target,
                                   lerf.target_prob, saliency, desc, n_steps)
