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

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..native import project_curve
from ..ops.stats import spearman_np
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
            self.bundle.logits_fn(self.bundle.params, img[None])[0]))
        chunk = min(max_batch_size, 25)
        out = reveal_curves(self.bundle.apply, self.bundle.params, start,
                            finish, flip, n_steps, target, chunk=chunk,
                            original_at="start" if deletion else "finish")
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

    def single_run_embeddings(self, img_tensor, saliency_map,
                              patch_mask=None, max_batch_size=8):
        """return_embeddings=True path (MASTestFunctions.py:370-381):
        (embeddings [L, steps+1, N, D], classes, model_response,
        salient_order-equivalent flip schedule)."""
        img = jnp.asarray(img_tensor)
        if img.ndim == 4:
            img = img[0]
        sub = self.substrate_fn(img[None])
        sub = jnp.asarray(sub)[0] if sub.ndim == 4 else jnp.asarray(sub)
        if patch_mask is None:
            n_steps = (self.HW + self.step_size - 1) // self.step_size
            flip = pixel_flip_steps(saliency_map, self.step_size, True)
        else:
            n_steps = len(np.unique(np.asarray(patch_mask)))
            flip = patch_flip_steps(saliency_map, patch_mask, True)
        deletion = self.mode in ("del", "morf", "lerf")
        start, finish = (img, sub) if deletion else (sub, img)
        embs, classes = _embeddings_sweep(self.bundle, start, finish, flip,
                                          n_steps, chunk=max_batch_size)
        target = int(jnp.argmax(
            self.bundle.logits_fn(self.bundle.params, img[None])[0]))
        out = reveal_curves(self.bundle.apply, self.bundle.params, start,
                            finish, flip, n_steps, target,
                            chunk=min(max_batch_size, 25),
                            original_at="start" if deletion else "finish")
        return embs, classes, out.target_prob, flip


@functools.partial(jax.jit, static_argnums=(0,))
def _taps_chunk(apply_taps, params, start, finish, mask_hw, steps):
    """One reveal-chunk of the embedding capture; module-level so jax.jit
    caches on the bundle's stable apply_taps identity — a per-call closure
    here retraced + re-compiled the full taps model for EVERY image."""
    def one(s):
        img = jnp.where(mask_hw <= s, finish, start)
        logits, taps = apply_taps(params, img[None])
        return taps["block_out"][:, 0], jnp.argmax(logits[0])
    return jax.vmap(one)(steps)


def _embeddings_sweep(bundle, start, finish, flip, n_steps, chunk=8):
    """ViT-embedding capture mode (MASTestFunctions.py:121-132, 283-295):
    per reveal step, every block's token embeddings + the predicted class."""
    H = start.shape[0]
    mask_hw = jnp.asarray(flip).reshape(H, H, 1)

    def batch_taps(steps):
        return _taps_chunk(bundle.apply_taps, bundle.params,
                           jnp.asarray(start), jnp.asarray(finish),
                           mask_hw, steps)

    total = n_steps + 1
    pad = (-total) % chunk
    steps = jnp.concatenate(
        [jnp.arange(total, dtype=jnp.int32),
         jnp.zeros(pad, jnp.int32)]).reshape(-1, chunk)
    embs, classes = [], []
    for chunk_steps in steps:
        e, c = batch_taps(chunk_steps)
        embs.append(np.asarray(e))
        classes.append(np.asarray(c))
    embs = np.concatenate(embs)[:total]        # [steps+1, L, N, D]
    classes = np.concatenate(classes)[:total]
    return embs.transpose(1, 0, 2, 3), classes  # [L, steps+1, N, D]


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
        mono = spearman_np(ideal, out.target_prob)
        return out.target_prob, mono
