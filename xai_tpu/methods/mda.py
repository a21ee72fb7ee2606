"""MDA — Model-Dependent Attribution (util/attribution_methods/MDAFunctions.py,
the paper's own method).

Structure (MDA, :600-625): SLIC superpixels (compactness 10000) -> prior
saliency downsampled to the patch grid -> greedy *insertion* search ordered
by the prior (find_insertion_patches :39-311, subsearch window
min(2*sqrt(n), 28), early cutoff at 90% confidence recovery) -> greedy
*deletion* search seeded by the insertion order (find_deletion_patches
:313-597) -> monotone normalization + convex/concave curve projection
(normalize_curve :12-37, cvxopt -> native.project_curve) -> MAS ins/del
re-scoring of the intermediate map -> sparse/dense kappa-blended maps.

TPU design (SURVEY §7 step 5): host greedy control flow, but every candidate
scoring round is ONE jitted device call over the whole subsearch window
(vs the reference's batch-5 host loop) — for patch_count=196 this turns
~10^4 single forwards into ~400 batched calls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..native import project_curve, slic
from ..ops.resize import resize_bilinear, resize_nearest_exact


def _probs1(bundle, x, target):
    # one jitted dispatch (bundle.probs_fn is cached+jitted); eager softmax
    # chains cost several device round-trips each
    return bundle.probs_fn(bundle.params, jnp.asarray(x)[None])[0][target]


def _segment_saliency(sal2d: np.ndarray, segments: np.ndarray,
                      n: int) -> np.ndarray:
    flat = sal2d.reshape(-1)
    seg = segments.reshape(-1)
    sums = np.bincount(seg, weights=flat, minlength=n)
    cnts = np.bincount(seg, minlength=n)
    return sums / np.maximum(cnts, 1)


@functools.partial(jax.jit, static_argnums=(0, 7, 8))
def _greedy_scan_device(apply_fn, params, start, finish, seg_map, order,
                        k_sched, subsearch: int, maximize: bool,
                        chosen0, target, cutoff, norm_lo, norm_hi):
    """The WHOLE greedy search as one on-device `lax.scan` — the host
    version pays a ~30 ms tunnel round-trip per round (argmax download),
    which dominated MDA end-to-end (~40 blocking reads per image).

    Per round r (k = k_sched[r]): take the first k not-yet-chosen segments
    in `order`, score each candidate insertion with ONE batched forward,
    pick argmax (maximize) / argmin, apply it to the running image; the
    cutoff check sets a done-flag that freezes later rounds.  Returns
    (picked [R], responses [R], trig [R], final image); picked = −1 for
    frozen/empty rounds."""
    n = order.shape[0]
    S = subsearch
    seg3 = seg_map[..., None]

    def live_round(chosen, cur, done, k_r):
        # first-k-unchosen-in-order -> fixed S candidate slots
        m = jnp.logical_not(chosen[order])            # [n] selectable?
        rank = jnp.cumsum(m.astype(jnp.int32))
        write = m & (rank <= jnp.minimum(k_r, S))
        slots = jnp.where(write, rank - 1, S)
        cands = jnp.full((S,), -1, jnp.int32).at[slots].set(
            jnp.where(write, order, -1), mode="drop")

        imgs = jnp.where(seg3[None] == cands[:, None, None, None],
                         finish[None], cur[None])
        probs = jax.nn.softmax(
            apply_fn(params, imgs).astype(jnp.float32), axis=-1)[:, target]
        valid = cands >= 0
        masked = jnp.where(valid, probs,
                           -jnp.inf if maximize else jnp.inf)
        idx = jnp.argmax(masked) if maximize else jnp.argmin(masked)
        seg_id = cands[idx]
        resp = probs[idx]
        applied = jnp.logical_not(done) & valid.any() & (k_r > 0)

        chosen = chosen | (applied &
                           (jnp.arange(n, dtype=jnp.int32) == seg_id))
        cur = jnp.where(applied & (seg3 == seg_id), finish, cur)
        trig = applied & (cutoff < 1.0) & \
            ((resp - norm_lo) / jnp.abs(norm_hi - norm_lo) >= cutoff)
        out = (jnp.where(applied, seg_id, -1).astype(jnp.float32),
               jnp.where(applied, resp, jnp.nan),
               trig.astype(jnp.float32))
        return (chosen, cur, done | trig), out

    def frozen_round(chosen, cur, done, k_r):
        return (chosen, cur, done), (jnp.float32(-1.0), jnp.float32(jnp.nan),
                                     jnp.float32(0.0))

    def round_body(carry, k_r):
        chosen, cur, done = carry
        # k_sched is zero-padded to a fixed length so the compile is shared
        # across images; cond skips the batched forward on padded/finished
        # rounds (a real branch under scan, not a select)
        return jax.lax.cond(jnp.logical_not(done) & (k_r > 0),
                            live_round, frozen_round,
                            chosen, cur, done, k_r)

    (chosen, cur, _), (picked, resps, trig) = jax.lax.scan(
        round_body, (chosen0, start, jnp.bool_(False)), k_sched)
    return jnp.stack([picked, resps, trig], axis=-1), cur


def _greedy_search(bundle, start, finish, seg_map, segment_order, n_steps,
                   target, direction, skip=None, n_searches=None,
                   cutoff=None, norm_pair=None, dtype=None):
    """Shared greedy loop: at each step, score the first `subsearch` not-yet-
    chosen segments in `segment_order`, pick argmax (ins) / argmin (del of
    the insertion response), apply it to start.  Mirrors the reference's
    subsearch structure exactly, including the shrinking tail window.
    Control flow semantics are defined here; the heavy lifting (every
    round's scoring + pick + cutoff) runs as one `_greedy_scan_device`
    dispatch with a single packed [R, 3] download."""
    n_searches = n_searches or n_steps
    subsearch = min(int(n_steps ** 0.5) * 2, 28)
    seg_dev = jnp.asarray(seg_map, jnp.int32)
    start = jnp.asarray(start)
    finish = jnp.asarray(finish)

    main_rounds = n_searches - subsearch - (len(skip) if skip else 0)
    tail = subsearch
    if skip and len(skip) > n_searches - subsearch:
        tail = n_searches - len(skip)
    total_rounds = max(main_rounds, 0) + tail
    if total_rounds <= 0:
        return [], [], start, False
    # zero-pad the schedule to the fixed length n_searches: the scan length
    # must not depend on len(skip), or every distinct insertion-pick count
    # would recompile the whole search (~30 s each on the tunnel); padded
    # rounds are skipped by the cond inside the scan.
    k_sched = np.zeros(max(n_searches, total_rounds), np.int32)
    for r in range(total_rounds):
        k_sched[r] = subsearch if r < max(main_rounds, 0) else \
            tail - (r - max(main_rounds, 0))
    k_sched = np.maximum(k_sched, 0)
    # the host loop `break`s at the first k <= 0; the scan freezes instead —
    # equivalent because the tail schedule is monotonically decreasing
    chosen0 = np.zeros(n_steps, bool)
    if skip:
        chosen0[list(skip)] = True
    if cutoff is not None and norm_pair is not None and cutoff != 1:
        orig, base = norm_pair
        cut_args = (float(cutoff), float(base), float(orig))
    else:
        cut_args = (1.0, 0.0, 1.0)      # cutoff >= 1 never triggers

    params = bundle.params
    if dtype is not None:
        # opt-in bf16 candidate-scoring forwards; softmax/argmax/cutoff
        # math inside the scan stays f32 (probs are cast on exit)
        from .gradient import _cast_params_cached
        params = _cast_params_cached(bundle, dtype)
        start = start.astype(dtype)
        finish = finish.astype(dtype)
    packed, start = _greedy_scan_device(
        bundle.apply, params, start, finish, seg_dev,
        jnp.asarray(segment_order, jnp.int32), jnp.asarray(k_sched),
        subsearch, direction == "max", jnp.asarray(chosen0), target,
        *cut_args)
    packed = np.asarray(packed)         # ONE blocking download [R, 3]

    picked, responses = [], []
    for seg_f, resp, trig in packed:
        if seg_f < 0:
            continue
        picked.append(int(seg_f))
        responses.append(float(resp))
        if trig:
            responses[-1] = float(cutoff)
            return picked, responses, start, True
    return picked, responses, start, False


def find_insertion_patches(bundle, x, prior_segmented, segments, blur_fn,
                           n_searches, target=None, cutoff: float = 0.9,
                           dtype=None):
    """Insertion search (type=1): start=blur, insert the segment maximizing
    the softmax response (MDAFunctions.py:39-192)."""
    x = jnp.asarray(x)
    segments = np.asarray(segments)
    n_steps = int(segments.max()) + 1
    if target is None:
        target = int(jnp.argmax(bundle.logits_fn(bundle.params, x[None])[0]))
    original_pred = float(_probs1(bundle, x, target))
    start = blur_fn(x[None])[0]
    blur_pred = float(_probs1(bundle, start, target))

    sal2d = np.abs(np.asarray(prior_segmented).sum(-1))
    seg_sal = _segment_saliency(sal2d, segments, n_steps)
    order = list(np.flip(np.argsort(seg_sal)))      # high -> low

    picked, responses, _, early = _greedy_search(
        bundle, start, x, segments, order, n_steps, target, "max",
        n_searches=n_searches, cutoff=cutoff,
        norm_pair=(original_pred, blur_pred), dtype=dtype)
    if early:
        # early-exit return: the raw response list with the final entry set
        # to the cutoff value (MDAFunctions.py:190-192)
        return np.array(picked), np.array(responses)
    # full completion: the reference returns original_MR — the monotone-
    # normalized insertion curve with blur_pred prepended (length n+1,
    # :265-291) — and MDA applies its 90% hand-off cutoff to THIS curve
    curve = np.array([blur_pred] + list(responses), np.float64)
    mx = 0.0
    for i in range(len(curve)):
        v = np.clip((curve[i] - blur_pred) / abs(original_pred - blur_pred),
                    0.0, 1.0)
        mx = max(mx, v)
        curve[i] = mx
    return np.array(picked), curve


# introspection for interactive debugging: captures intermediate curves only
# when DEBUG_CAPTURE is flipped on (production runs must not retain the last
# image's full-resolution buffers or mutate module state under parallelism)
DEBUG_CAPTURE = False
_LAST_DEBUG: dict = {}


def find_deletion_patches(bundle, x, segments, prior_segmented,
                          beginning_order, blur_fn, n_searches,
                          target=None, kappa: float = 0.005,
                          mas_chunk: int = 25, dtype=None):
    """Deletion search seeded by the insertion order
    (MDAFunctions.py:313-597).  Returns (map_0, map_5, map_10): the
    kappa = 0 / 0.5 / 1.0 sparse/dense blends as [H, W] 2-D maps (already
    channel-summed — the driver's abs-sum of the [H,W,3] broadcast is
    3x these; rank-identical and the 3x is applied by the registry)."""
    x = jnp.asarray(x)
    H = x.shape[0]
    segments = np.asarray(segments)
    n_steps = int(segments.max()) + 1
    if target is None:
        target = int(jnp.argmax(bundle.logits_fn(bundle.params, x[None])[0]))
    original_pred = float(_probs1(bundle, x, target))
    start = jnp.zeros_like(x)
    black_pred = float(_probs1(bundle, start, target))

    sal2d = np.abs(np.asarray(prior_segmented).sum(-1))
    seg_sal = _segment_saliency(sal2d, segments, n_steps)
    order = list(np.argsort(seg_sal))               # low -> high

    beginning_order = [int(v) for v in beginning_order]
    picked, responses, start_after, _ = _greedy_search(
        bundle, start, x, segments, order, n_steps, target, "min",
        skip=beginning_order, n_searches=n_searches, dtype=dtype)

    # apply the seeded tail (best insertion segments, reversed) recording
    # responses (:496-511) — the reveals are cumulative, so all T states
    # are built and scored in ONE batched forward instead of T blocking
    # per-segment probes
    tail = list(reversed(beginning_order))
    seg_dev = jnp.asarray(segments)
    if tail:
        T = len(tail)
        # bucket the batch length so distinct tail lengths share compiles
        # (-1 padding repeats the final state; extra rows are discarded)
        Tp = ((T + 27) // 28) * 28
        tail_ids = jnp.asarray(tail + [-1] * (Tp - T), jnp.int32)
        eq = seg_dev[None] == tail_ids[:, None, None]          # [Tp, H, W]
        cum = jnp.cumsum(eq.astype(jnp.int32), axis=0) > 0
        imgs = jnp.where(cum[..., None], x[None], start_after[None])
        tail_responses = [
            float(v) for v in
            np.asarray(bundle.probs_fn(bundle.params, imgs)[:, target])[:T]]
    else:
        tail_responses = []

    worst_segments = picked + tail
    worst_mr = responses + tail_responses

    # worst insertion curve -> best deletion curve (:513-527)
    curve = np.array(worst_mr + [original_pred])[::-1].astype(np.float64)
    mn = 1.0
    for i in range(len(curve)):
        v = np.clip((curve[i] - black_pred) /
                    abs(original_pred - black_pred), 0.0, 1.0)
        mn = min(mn, v)
        curve[i] = mn
    if DEBUG_CAPTURE:
        _LAST_DEBUG["stage1_in"] = curve.copy()
    curve = project_curve(curve, "del")
    if DEBUG_CAPTURE:
        _LAST_DEBUG["stage1_out"] = curve.copy()

    best_order = list(reversed(worst_segments))
    seg_flat = segments.reshape(-1)
    seg_counts = np.bincount(seg_flat, minlength=n_steps)

    # intermediate perfect-deletion map (:532-538)
    new_map = np.zeros(H * H)
    for i in range(1, len(best_order) + 1):
        s = best_order[i - 1]
        t_mr = curve[i - 1] - curve[i]
        new_map[seg_flat == s] = (1.0 / seg_counts[s]) * t_mr + \
            (t_mr * (n_steps - i) / n_steps)
    new_map = new_map.reshape(H, H)

    # MAS ins/del re-scoring of this map (:541-556) via the curve engine
    from ..metrics.curves import pixel_flip_steps, reveal_curves, \
        monotone_normalize
    sal_test = np.abs(new_map) * 3.0    # abs-sum over the 3-channel broadcast
    desc = pixel_flip_steps(sal_test, H)
    blurred = blur_fn(x[None])[0]
    ins = reveal_curves(bundle.apply, bundle.params, blurred, x, desc, H,
                        target, chunk=mas_chunk, original_at="finish")
    dele = reveal_curves(bundle.apply, bundle.params, x, jnp.zeros_like(x),
                         desc, H, target, chunk=mas_chunk,
                         original_at="start")
    raw_ins = monotone_normalize(ins.target_prob, ins.original_pred,
                                 ins.baseline_pred, "ins")
    raw_del = monotone_normalize(dele.target_prob, dele.original_pred,
                                 dele.baseline_pred, "del")

    x_old = np.linspace(0, 100, len(raw_ins))
    x_new = np.linspace(0, 100, n_steps + 1)
    raw_ins = np.interp(x_new, x_old, raw_ins)
    raw_del = np.interp(x_new, x_old, raw_del)
    new_curve = 1 - np.mean([raw_ins, 1 - raw_del], axis=0)
    curve = project_curve(new_curve, "del")
    if DEBUG_CAPTURE:
        _LAST_DEBUG.update(best_order=best_order, final_curve=curve,
                           pre_qp_curve=new_curve, raw_ins=raw_ins,
                           raw_del=raw_del, new_map=new_map)

    # sparse / dense maps + kappa blending (:564-591)
    sparse = np.zeros(H * H)
    dense = np.zeros(H * H)
    for i in range(1, len(best_order) + 1):
        s = best_order[i - 1]
        t_mr = curve[i - 1] - curve[i]
        attr_value = 1.0 / seg_counts[s] * t_mr + \
            (t_mr * (n_steps - i) / n_steps)
        sparse[seg_flat == s] = attr_value
        if attr_value >= kappa:
            dense[seg_flat == s] = (n_steps - i) / n_steps
        else:
            dense[seg_flat == s] = attr_value
    if dense.max() > 0:
        dense = dense / dense.max() * sparse.max()

    map_0 = sparse.reshape(H, H)
    map_5 = (0.5 * sparse + 0.5 * dense).reshape(H, H)
    map_10 = dense.reshape(H, H)
    return map_0, map_5, map_10


def mda(bundle, trans_img, x, prior_saliency, patch_count, blur_fn,
        target=None, ordered: bool = False, dtype=None, segments=None):
    """The MDA driver (MDAFunctions.py:600-625).

    trans_img: [H, W, 3] in [0,1] (for SLIC); x: normalized input [H, W, C];
    prior_saliency: [H, W, 3] (e.g. bi_attn broadcast).  Returns the kappa=0
    map [H, W] (MGA_g_0 channel-collapsed).  ``segments`` injects a
    precomputed superpixel label map (golden-parity shared-segment
    protocol)."""
    H = np.asarray(trans_img).shape[0]
    if segments is None:
        segments = slic(np.asarray(trans_img, np.float32), patch_count,
                        compactness=10000.0)

    # prior -> patch-resolution map: bilinear downsize to sqrt(patches),
    # NEAREST_EXACT upsize back (MDAFunctions.py:607-609)
    small = int(patch_count ** 0.5)
    prior = jnp.transpose(jnp.asarray(prior_saliency, jnp.float32),
                          (2, 0, 1))
    down = resize_bilinear(prior, (small, small))
    seg_prior = jnp.transpose(resize_nearest_exact(down, (H, H)), (1, 2, 0))

    order, mr_ins = find_insertion_patches(bundle, x, seg_prior, segments,
                                           blur_fn, patch_count,
                                           target=target, dtype=dtype)
    hits = np.where(mr_ins >= 0.9)[0]
    end_index = hits[0] if len(hits) else len(mr_ins)
    kappa = -1.0 if ordered else 0.005
    map_0, map_5, map_10 = find_deletion_patches(
        bundle, x, segments, seg_prior, order[:end_index + 1], blur_fn,
        patch_count, target=target, kappa=kappa, dtype=dtype)
    return map_0


def mda_dense(bundle, trans_img, x, prior_saliency, patch_count, blur_fn,
              target=None, dtype=None):
    """The seg driver's MDA_dense (evaluateImageNetSeg.py:291-326): same
    insertion search, but the deletion pass runs with kappa = -1 so the dense
    map is the pure insertion-rank map, then bilinear downsize to
    ceil(sqrt(patches)) / upsize back smooths it (:322-325).  Returns the
    smoothed dense map [H, W]."""
    H = np.asarray(trans_img).shape[0]
    segments = slic(np.asarray(trans_img, np.float32), patch_count,
                    compactness=10000.0)

    small = int(patch_count ** 0.5)
    prior = jnp.transpose(jnp.asarray(prior_saliency, jnp.float32),
                          (2, 0, 1))
    down = resize_bilinear(prior, (small, small))
    seg_prior = jnp.transpose(resize_nearest_exact(down, (H, H)), (1, 2, 0))

    order, mr_ins = find_insertion_patches(bundle, x, seg_prior, segments,
                                           blur_fn, patch_count,
                                           target=target, dtype=dtype)
    hits = np.where(mr_ins >= 0.9)[0]
    end_index = hits[0] if len(hits) else len(mr_ins)
    _, _, dense = find_deletion_patches(
        bundle, x, segments, seg_prior, order[:end_index + 1], blur_fn,
        patch_count, target=target, kappa=-1.0, dtype=dtype)

    small_side = int(np.ceil(np.sqrt(patch_count)))
    d = resize_bilinear(jnp.asarray(dense, jnp.float32),
                        (small_side, small_side))
    return np.asarray(resize_bilinear(d, (H, H)))
