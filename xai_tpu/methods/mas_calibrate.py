"""MAS calibration — differentiable MAS scorer + attribution refinement
(util/attribution_methods/MASCalibrate.py:1095-1419).

The reference's trick: the reveal ordering and the model responses are
treated as constants (detached), while the attribution-density curve — and
hence the alignment penalty and the min-max normalized corrected score —
remain differentiable w.r.t. the attribution.  ``refine_attribution`` wraps
the attribution in a 1-tensor "network" (Net :1307-1313, whose forward is
``param + original`` — initially 2x the attribution, reproduced exactly) and
Adam-optimizes ``loss = (1 - MAS_ins) + MAS_del`` for ~25 epochs with a
heuristic LR by total attribution mass (:1372-1384, including the
non-elif first branch that makes total<10 resolve to 1e-4).

TPU design: responses come from the fused reveal-curve engine (one device
pass per direction per epoch); the differentiable part is a tiny jnp graph;
updates via optax.adam.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..metrics.curves import pixel_flip_steps, patch_flip_steps, \
    reveal_curves
from ..native import project_curve
from ..ops.blur import make_blur_fn
from ..ops.resize import resize_bilinear, resize_nearest_exact
from ..ops.stats import auc


def _normalize_response(resp, original, base, mode):
    """MASCalibrate.MAS:1252-1266 (NO abs in the denominator)."""
    out = resp.copy()
    mn, mx = 1.0, 0.0
    for i in range(len(out)):
        v = np.clip((out[i] - base) / (original - base), 0.0, 1.0)
        if mode == "del":
            mn = min(mn, v)
            out[i] = mn
        else:
            mx = max(mx, v)
            out[i] = mx
    return out


def _special_normalize(resp, mode):
    """The special_version derivative normalization (:1212-1250)."""
    deriv = np.diff(np.concatenate([[1.0], resp]))
    deriv[0] = deriv[1]
    if mode == "del":
        deriv = -deriv
    new = np.zeros_like(deriv)
    mn = 1.0
    for i in range(len(deriv)):
        v = (deriv[i] - deriv[-1]) / (deriv[0] - deriv[-1])
        if v > 1:
            c = mn
        elif v < 0:
            c = deriv[i - 1]
        else:
            c = v
        mn = min(mn, c)
        new[i] = mn
    deriv = new
    if mode == "del":
        deriv = -deriv
    resp = np.cumsum(deriv)
    return (resp - resp.min()) / (resp.max() - resp.min())


def _prep(bundle, x, sal2d, mode, segments=None, segment_order=None,
          blur_fn=None, chunk=25, special_version=False, total_steps=None):
    """Non-differentiable prep: flip schedule + normalized responses."""
    H = x.shape[0]
    n_px_steps = total_steps or H
    if segments is None:
        flip = pixel_flip_steps(sal2d, int(H * H / n_px_steps))
        n_steps = n_px_steps
    else:
        if segment_order is None:
            flip = patch_flip_steps(sal2d, segments)
        else:
            seg_step = np.empty(int(segments.max()) + 1, np.int32)
            seg_step[np.asarray(segment_order, int)] = \
                np.arange(len(segment_order)) + 1
            flip = seg_step[np.asarray(segments).reshape(-1)]
        n_steps = int(np.asarray(segments).max()) + 1

    blur_fn = blur_fn or make_blur_fn(31, 31.0)
    if mode == "del":
        start, finish = jnp.asarray(x), jnp.zeros_like(jnp.asarray(x))
    else:
        start, finish = blur_fn(jnp.asarray(x)[None])[0], jnp.asarray(x)

    target = int(jnp.argmax(bundle.logits_fn(bundle.params,
                                             jnp.asarray(x)[None])[0]))
    out = reveal_curves(bundle.apply, bundle.params, start, finish, flip,
                        n_steps, target, chunk=chunk,
                        original_at="start" if mode == "del" else "finish")
    if special_version:
        resp = _special_normalize(out.target_prob, mode)
    else:
        resp = _normalize_response(out.target_prob, out.original_pred,
                                   out.baseline_pred, mode)
    return flip, resp, n_steps


def differentiable_mas(attr_3c, flip, resp_norm, n_steps, mode):
    """The differentiable tail: density from attr, penalty, minmax, AUC.
    attr_3c is a traced jnp array; everything else constant."""
    sal = jnp.abs(attr_3c.sum(-1)).reshape(-1)
    total = sal.sum()
    per_step = jax.ops.segment_sum(sal, jnp.asarray(flip, jnp.int32),
                                   num_segments=n_steps + 1)[1:]
    frac = jnp.cumsum(per_step) / total
    if mode == "del":
        dens = jnp.concatenate([jnp.ones(1), 1.0 - frac])
    else:
        dens = jnp.concatenate([jnp.zeros(1), frac])
    resp = jnp.asarray(resp_norm)
    penalty = jnp.abs(resp - dens)
    corrected = resp + penalty if mode == "del" else resp - penalty
    corrected = jnp.clip(corrected, 0, 1)
    corrected = (corrected - corrected.min()) / \
        (corrected.max() - corrected.min())
    return auc(corrected), auc(penalty)


def mas_score(bundle, x, attr_3c, mode, segments=None, segment_order=None,
              special_version=False, blur_fn=None):
    """MASCalibrate.MAS equivalent returning (score, penalty) floats."""
    sal2d = np.abs(np.asarray(attr_3c).sum(-1))
    flip, resp, n_steps = _prep(bundle, np.asarray(x), sal2d, mode, segments,
                                segment_order, blur_fn,
                                special_version=special_version)
    s, p = differentiable_mas(jnp.asarray(attr_3c), flip, resp, n_steps,
                              mode)
    return float(s), float(p)


def heuristic_lr(attr_3c) -> float:
    total = float(np.abs(np.asarray(attr_3c).sum(-1)).sum())
    lr = 0.1
    if total < 10:
        lr = 0.00001
    if total < 500:
        lr = 0.0001
    elif total < 1000:
        lr = 0.001
    elif total < 10000:
        lr = 0.01
    return lr


def mas_response(bundle, x, attr_3c, mode, segments=None,
                 special_version=False, blur_fn=None, total_steps=None):
    """The MAS preprocess=1 path (MASCalibrate.py:1286-1287): just the
    normalized model response."""
    sal2d = np.abs(np.asarray(attr_3c).sum(-1))
    _, resp, _ = _prep(bundle, np.asarray(x), sal2d, mode, segments,
                       None, blur_fn, special_version=special_version,
                       total_steps=total_steps)
    return resp


def calibrate_density(bundle, x, attr_3c, total_steps=None, mode="del",
                      blur_fn=None, special_version=False):
    """calibrate_density (MASCalibrate.py:985-1050): QP-project the
    normalized response, then rebuild a map whose per-step density equals
    the projected response derivative along the salient order."""
    x = np.asarray(x)
    H = x.shape[0]
    total_steps = total_steps or H
    step_size = int(H * H / total_steps)
    n_steps = (H * H + step_size - 1) // step_size
    resp = mas_response(bundle, x, attr_3c, mode, blur_fn=blur_fn,
                        special_version=special_version,
                        total_steps=total_steps)
    resp = project_curve(np.asarray(resp, np.float64), mode)

    sal2d = np.abs(np.asarray(attr_3c).sum(-1))
    flat = sal2d.reshape(-1)
    order = np.flip(np.argsort(flat.reshape(1, -1), axis=1), axis=-1)[0]
    new_map = np.zeros(H * H)
    for i in range(1, n_steps + 1):
        if mode == "del":
            t = resp[i - 1] - resp[i]
        else:
            t = resp[i] - resp[i - 1]
        coords = order[step_size * (i - 1): step_size * i]
        # NO division: the reference divides by len(coords) where coords is
        # a [1, step_size] tensor, so len() is 1 (MASCalibrate.py:1044) —
        # the per-pixel value is the full step delta
        new_map[coords] = t
    return np.repeat(new_map.reshape(H, H, 1), 3, axis=2)


def remove_pixels(bundle, x, attr_3c, total_steps=None, mode="del",
                  segments=None, blur_fn=None, special_version=False):
    """remove_pixels (MASCalibrate.py:1051-1094): zero the attribution in
    the reveal-order tail where the response derivative is already 0."""
    x = np.asarray(x)
    H = x.shape[0]
    total_steps = total_steps or H
    resp = np.asarray(mas_response(
        bundle, x, attr_3c, mode, segments, special_version, blur_fn,
        total_steps=None if segments is not None else total_steps))
    if mode == "del":
        deriv = np.abs(np.diff(np.insert(resp, 0, 1.0)))
    else:
        deriv = np.abs(np.diff(np.insert(resp, 1, 0.0)))

    sal2d = np.abs(np.asarray(attr_3c).sum(-1))
    flat = sal2d.reshape(-1).copy()
    nz = np.where(deriv != 0)[0]
    start_step = nz[-1] if len(nz) else 0
    if segments is None:
        step_size = int(H * H / total_steps)
        n_steps = (H * H + step_size - 1) // step_size
        order = np.flip(np.argsort(flat.reshape(1, -1), axis=1), axis=-1)[0]
        # reference quirk (MASCalibrate.py:1084-1088): the (i-1) slice is
        # shifted one step EARLY — step start_step's own block is zeroed
        # while the final block survives — reproduced deliberately
        for i in range(int(start_step), n_steps):
            coords = order[step_size * (i - 1): step_size * i]
            flat[coords] = 0.0
    else:
        seg = np.asarray(segments).reshape(-1)
        n_steps = int(seg.max()) + 1
        means = np.bincount(seg, weights=flat, minlength=n_steps) / \
            np.maximum(np.bincount(seg, minlength=n_steps), 1)
        order = np.flip(np.argsort(means))
        for i in range(int(start_step), n_steps):
            flat[seg == order[i - 1]] = 0.0
    return np.repeat(flat.reshape(H, H, 1), 3, axis=2)


def find_deletion_from_insertion_informed_ultimate(
        bundle, x, segments, prior_segmented, beginning_order, blur_fn,
        n_searches, kappa: float = 0.005, **kw):
    """MASCalibrate.py:748-983 — algorithmically identical to
    MDAFunctions.find_deletion_patches but returning the (sparse, dense)
    map pair; delegates to the shared greedy machinery."""
    from .mda import find_deletion_patches
    sparse, _, dense = find_deletion_patches(
        bundle, x, segments, prior_segmented, beginning_order, blur_fn,
        n_searches, kappa=kappa, **kw)
    return sparse, dense


def find_best_segment_reverse_informed(bundle, x, prior_segmented, segments,
                                       blur_fn, n_searches, **kw):
    """MASCalibrate.py:81-299 — the prior-informed insertion search;
    delegates to the shared greedy machinery (MDAFunctions equivalent)."""
    from .mda import find_insertion_patches
    return find_insertion_patches(bundle, x, prior_segmented, segments,
                                  blur_fn, n_searches, **kw)


def refine_attribution(bundle, x, saliency_3c, lr=None, smoothing=False,
                       epochs: int = 25, segments=None, segment_order=None,
                       special_version=False, blur_fn=None):
    """MASCalibrator.refine_attribution (:1333-1420).  x: [H, W, C]
    normalized input; saliency_3c: [H, W, 3].  Returns the refined map (and
    the smoothed variant when segments are given)."""
    x = np.asarray(x)
    H = x.shape[0]
    attr = np.asarray(saliency_3c, np.float32)
    if smoothing:
        chw = jnp.transpose(jnp.asarray(attr), (2, 0, 1))
        down = resize_nearest_exact(chw, (7, 7))
        attr = np.asarray(jnp.transpose(
            resize_bilinear(down, (H, H)), (1, 2, 0)))
    if segments is not None:
        seg = np.asarray(segments).reshape(-1)
        sal = np.abs(attr.sum(-1)).reshape(-1)
        n = int(seg.max()) + 1
        means = np.bincount(seg, weights=sal, minlength=n) / \
            np.maximum(np.bincount(seg, minlength=n), 1)
        sal = means[seg]
        attr = np.repeat(sal.reshape(H, H, 1), 3, axis=2).astype(np.float32)

    lr = lr if lr is not None else heuristic_lr(attr)
    attr_orig = jnp.asarray(attr)
    param = jnp.asarray(attr)                       # Net: param + original
    opt = optax.adam(lr)
    opt_state = opt.init(param)

    ins, _ = mas_score(bundle, x, attr, "ins", segments, segment_order,
                       special_version, blur_fn)
    dele, _ = mas_score(bundle, x, attr, "del", segments, segment_order,
                        special_version, blur_fn)
    best_loss = (1 - ins) + dele
    best_attr = jnp.asarray(attr)

    for _ in range(epochs):
        output = param + attr_orig
        sal2d = np.abs(np.asarray(output).sum(-1))
        flip_i, resp_i, n_i = _prep(bundle, x, sal2d, "ins", segments,
                                    segment_order, blur_fn,
                                    special_version=special_version)
        flip_d, resp_d, n_d = _prep(bundle, x, sal2d, "del", segments,
                                    segment_order, blur_fn,
                                    special_version=special_version)

        def loss_fn(p):
            out = p + attr_orig
            s_i, _ = differentiable_mas(out, flip_i, resp_i, n_i, "ins")
            s_d, _ = differentiable_mas(out, flip_d, resp_d, n_d, "del")
            return (1.0 - s_i) + s_d

        loss, g = jax.value_and_grad(loss_fn)(param)
        if float(loss) < best_loss:
            best_loss = float(loss)
            best_attr = output
        updates, opt_state = opt.update(g, opt_state)
        param = optax.apply_updates(param, updates)

    best = np.asarray(best_attr)
    if segments is None:
        return best
    chw = jnp.transpose(jnp.asarray(best), (2, 0, 1))
    down = resize_nearest_exact(chw, (7, 7))
    smoothed = np.asarray(jnp.transpose(resize_bilinear(down, (H, H)),
                                        (1, 2, 0)))
    return best, smoothed
