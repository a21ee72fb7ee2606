"""MAC — Magnitude Aligned Cleaning denoiser
(util/attribution_methods/MACBuilder.py).

``retrieve_maf`` computes per-segment Magnitude Alignment Factors from the
ratio of the |model-response derivative| to the attribution-density
derivative over a segment-ranked reveal (MACBuilder.py:37-231);
``clean_attribution`` iteratively rescales segments by (1 + MAF) until the
MAS score stagnates or worsens `cutoff` times (:269-362).  Segments default
to Felzenszwalb(scale=0, sigma=0.01, min_size=img_hw) (:290).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..metrics.curves import patch_flip_steps, reveal_curves, \
    monotone_normalize, density_response, mas_scores
from ..native import felzenszwalb
from ..ops.stats import auc_np


def _segment_reveal(bundle, x, sal2d, segments, mode, blur_fn, chunk=25):
    flip = patch_flip_steps(sal2d, segments)
    n_steps = int(np.asarray(segments).max()) + 1
    x = jnp.asarray(x)
    # MAC deletes TO THE SUBSTRATE, not to zeros (RetrieveMAF
    # MACBuilder.py:88-90: finish = substrate_fn(img) in del mode)
    if mode == "del":
        start, finish = x, blur_fn(x[None])[0]
    else:
        start, finish = blur_fn(x[None])[0], x
    target = int(jnp.argmax(bundle.logits_fn(bundle.params, x[None])[0]))
    out = reveal_curves(bundle.apply, bundle.params, start, finish, flip,
                        n_steps, target, chunk=chunk,
                        original_at="start" if mode == "del" else "finish")
    return flip, out, n_steps


def retrieve_maf(bundle, x, sal2d, segments, mode, blur_fn, chunk=25):
    """(MAF, segment_order, corrected_scores) — MACBuilder.py:56-231."""
    segments = np.asarray(segments)
    n = int(segments.max()) + 1
    seg_flat = segments.reshape(-1)
    sal_flat = np.asarray(sal2d).reshape(-1)
    seg_sal = np.bincount(seg_flat, weights=sal_flat, minlength=n) / \
        np.maximum(np.bincount(seg_flat, minlength=n), 1)
    segment_order = np.flip(np.argsort(seg_sal), axis=-1)

    flip, out, n_steps = _segment_reveal(bundle, x, sal2d, segments, mode,
                                         blur_fn, chunk)
    # density derivative per step (attr fraction flipped at that step)
    total = sal_flat.sum()
    per_step = np.bincount(flip, weights=sal_flat,
                           minlength=n_steps + 1)[1:]
    dens_deriv = np.concatenate([per_step / total, [0.0]])

    norm = _normalize_no_abs(out.target_prob, out.original_pred,
                             out.baseline_pred, mode)
    dens = density_response(sal2d, flip, n_steps, mode)
    corrected = mas_scores(norm, dens, mode)

    deriv = np.gradient(norm, 1)
    deriv_abs = np.abs(deriv)
    deriv_error = np.abs(deriv_abs - dens_deriv)
    maf = np.divide(deriv_abs, dens_deriv, out=deriv_abs.copy(),
                    where=dens_deriv != 0)
    maf[deriv_error <= 0] = 0
    return maf, segment_order, corrected


def _normalize_no_abs(resp, original, base, mode):
    """Single source of truth: mas_calibrate._normalize_response (the same
    MASCalibrate.py:1252-1266 loop) — a quirk fix there must apply here."""
    from .mas_calibrate import _normalize_response
    return _normalize_response(np.asarray(resp, dtype=np.float64), original,
                               base, mode)


def clean_attribution(bundle, trans_img, x, saliency_3c, iterations: int,
                      mode: str = "ins", blur_fn=None, segments=None,
                      cutoff: int = 5, chunk: int = 25):
    """Denoise.clean_attribution (:269-362).  Returns (best_map, iterations,
    summary string)."""
    from ..ops.blur import make_blur_fn
    from ..metrics.curves import pixel_flip_steps
    blur_fn = blur_fn or make_blur_fn(31, 31.0)
    H = np.asarray(x).shape[0]
    new_map = np.asarray(saliency_3c, np.float64)
    maps = [new_map]
    scores = []
    best_score = 1.0 if mode == "del" else 0.0
    best_index = 0
    stagnant = 0
    worse = 0

    if segments is None:
        segments = felzenszwalb(np.asarray(trans_img, np.float32),
                                scale=0.0, sigma=0.01, min_size=H)
    seg_flat = np.asarray(segments).reshape(-1)

    i = 0
    while i <= iterations:
        sal2d = np.abs(new_map.sum(-1))
        # score via the pixel-ranked MAS metric (MACBuilder.py:303-314)
        flip = pixel_flip_steps(sal2d, H)
        xj = jnp.asarray(x)
        # the scoring MASMetric also gets substrate_fn as its substrate
        # (MACBuilder.py:304), so del reveals toward the substrate
        if mode == "del":
            start, finish = xj, blur_fn(xj[None])[0]
        else:
            start, finish = blur_fn(xj[None])[0], xj
        target = int(jnp.argmax(bundle.logits_fn(bundle.params, xj[None])[0]))
        out = reveal_curves(bundle.apply, bundle.params, start, finish,
                            flip, H, target, chunk=chunk,
                            original_at="start" if mode == "del"
                            else "finish")
        norm = monotone_normalize(out.target_prob, out.original_pred,
                                  out.baseline_pred, mode)
        dens = density_response(sal2d, flip, H, mode)
        score = auc_np(mas_scores(norm, dens, mode))

        if mode == "del":
            if score < best_score:
                best_score, best_index, worse = score, i, 0
            elif score > best_score:
                worse += 1
        else:
            if score > best_score:
                best_score, best_index, worse = score, i, 0
            elif score < best_score:
                worse += 1
        if i > 1 and round(score, 3) == round(scores[i - 1], 3):
            stagnant += 1
        elif i > 1:
            stagnant = 0
        scores.append(score)
        if stagnant == cutoff or worse == cutoff or i == iterations:
            break

        maf, segment_order, _ = retrieve_maf(bundle, x, sal2d, segments,
                                             mode, blur_fn, chunk)
        modifier = np.ones(H * H)
        for j, s in enumerate(segment_order):
            m = seg_flat == s
            modifier[m] += modifier[m] * maf[j]
        new_map = new_map * modifier.reshape(H, H, 1)
        maps.append(new_map)
        i += 1

    summary = (f"start: {round(scores[0], 3)} best: "
               f"{round(scores[best_index], 3)}")
    return maps[best_index], i, summary
