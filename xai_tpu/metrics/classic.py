"""Reference-shaped metric classes over the fused curve engine.

API parity with util/test_methods/: ``MASMetric(model, HW, mode, step_size,
substrate_fn).single_run(img, saliency, ...)`` and friends — here "model"
is a ModelBundle and images are [H, W, C] NHWC.  Return tuples match the
reference's (MASTestFunctions.py:385, RISETestFunctions.py:237,
AICTestFunctions.py:200-225, PosNegPertFunctions.py:177,
MonotonicityTest.py:213).  All forwards run through ONE on-device reveal
pass per call instead of the reference's 224-step host loop.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..native import project_curve
from ..ops.stats import spearman
from .curves import (density_response, mas_scores, monotone_normalize,
                     patch_flip_steps, pixel_flip_steps, reveal_curves)


class _RevealMetric:
    def __init__(self, bundle, HW: int, mode: str, step_size: int,
                 substrate_fn):
        self.bundle = bundle
        self.HW = HW
        self.mode = mode
        self.step_size = step_size
        self.substrate_fn = substrate_fn

    def _run(self, img, saliency_map, patch_mask=None, max_batch_size=50,
             descending=True):
        img = jnp.asarray(img)
        if img.ndim == 4:
            img = img[0]
        sub = self.substrate_fn(img[None])
        sub = jnp.asarray(sub)[0] if sub.ndim == 4 else jnp.asarray(sub)

        if patch_mask is None:
            n_steps = (self.HW + self.step_size - 1) // self.step_size
            flip = pixel_flip_steps(saliency_map, self.step_size, descending)
        else:
            n_steps = len(np.unique(np.asarray(patch_mask)))
            flip = patch_flip_steps(saliency_map, patch_mask, descending)

        deletion = self.mode in ("del", "morf", "lerf", "negative")
        start, finish = (img, sub) if deletion else (sub, img)
        target = int(jnp.argmax(
            self.bundle.apply(self.bundle.params, img[None])[0]))
        chunk = min(max_batch_size, 25)
        out = reveal_curves(self.bundle.apply, self.bundle.params, start,
                            finish, flip, n_steps, target, chunk=chunk,
                            original_img=img)
        return out, flip, n_steps


class MASMetric(_RevealMetric):
    def single_run(self, img_tensor, saliency_map, device=None,
                   patch_mask=None, max_batch_size=50,
                   special_version=False, **_):
        mode = "del" if self.mode in ("del", "morf", "lerf") else "ins"
        descending = self.mode != "lerf"
        out, flip, n_steps = self._run(img_tensor, saliency_map, patch_mask,
                                       max_batch_size, descending)
        norm = monotone_normalize(out.target_prob, out.original_pred,
                                  out.baseline_pred, mode)
        if special_version:
            norm = project_curve(norm, mode)
        dens = density_response(saliency_map, flip, n_steps, mode)
        corrected = mas_scores(norm, dens, mode)
        return n_steps + 1, corrected, out.entropy, dens, norm


class RISEMetric(_RevealMetric):
    def single_run(self, img_tensor, saliency_map, device=None,
                   patch_mask=None, max_batch_size=50, **_):
        mode = "del" if self.mode in ("del", "morf", "lerf") else "ins"
        descending = self.mode != "lerf"
        out, _, n_steps = self._run(img_tensor, saliency_map, patch_mask,
                                    max_batch_size, descending)
        norm = monotone_normalize(out.target_prob, out.original_pred,
                                  out.baseline_pred, mode)
        return n_steps + 1, out.entropy, norm


class AICMetric(_RevealMetric):
    def single_run(self, img_tensor, saliency_map, device=None,
                   patch_mask=None, max_batch_size=50, decision_flip=False,
                   **_):
        out, _, n_steps = self._run(img_tensor, saliency_map, patch_mask,
                                    max_batch_size, True)
        resp = out.top1_is_target
        if decision_flip:
            if self.mode == "del":
                hits = np.where(resp == 0)[0]
            else:
                hits = np.where(resp == 1)[0]
            score = hits[0] / len(resp) if len(hits) else 1.0
            return score, resp
        norm = monotone_normalize(resp, 1.0, out.baseline_top1, self.mode)
        return n_steps + 1, norm


class PositiveNegativePerturbation(_RevealMetric):
    """MoRF/LeRF — always deletion-direction; returns the RAW response
    (PosNegPertFunctions.py:177)."""

    def single_run(self, img_tensor, saliency_map, device=None,
                   patch_mask=None, max_batch_size=50, **_):
        descending = self.mode == "morf"
        out, _, n_steps = self._run(img_tensor, saliency_map, patch_mask,
                                    max_batch_size, descending)
        return n_steps + 1, out.target_prob


class MonotonicityMetric(_RevealMetric):
    def single_run(self, img_tensor, saliency_map, device=None,
                   patch_mask=None, max_batch_size=50, **_):
        # positive = insertion start, negative = deletion; order always desc
        out, _, n_steps = self._run(img_tensor, saliency_map, patch_mask,
                                    max_batch_size, True)
        ideal = (np.linspace(0, 1, n_steps + 1) if self.mode == "positive"
                 else np.linspace(1, 0, n_steps + 1))
        mono = float(spearman(ideal, out.target_prob))
        return out.target_prob, mono
