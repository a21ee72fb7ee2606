"""CLIP attribution registry — reference CLI names from get_CLIP_attr
(evaluatePerturbation.py:373-445): eclip, eclip_nograd, eclip_wo, game,
maskclip, rollout, selfattn, lrp (+ grad_cam and rise as capability
extensions; surgery/m2ib pending their dedicated modules).

Context contract: ctx.extras carries {"txt_emb": [T, E] normalized caption
embedding(s) for the target class, "text_tokens": [T, L] token ids}.  The
runner builds both from the class-prompt table.  Maps are patch-grid,
bilinear-upsampled + abs by the shared post-processing (:442-445).
"""
from __future__ import annotations

import numpy as np

from .methods import clip_explain as CE
from .ops.resize import resize_bilinear


def _up_abs(m, img_hw):
    return np.abs(np.asarray(resize_bilinear(m, (img_hw, img_hw))))


def _txt(ctx):
    return ctx.extras["txt_emb"]


def _tok(ctx):
    return ctx.extras["text_tokens"]


CLIP_METHODS = {
    "eclip": lambda c: _up_abs(
        CE.grad_eclip(c.bundle, c.x, _txt(c)), c.img_hw),
    "eclip_nograd": lambda c: _up_abs(
        CE.grad_eclip(c.bundle, c.x, _txt(c), withgrad=False), c.img_hw),
    "eclip_wo": lambda c: _up_abs(
        CE.grad_eclip(c.bundle, c.x, _txt(c), withksim=False), c.img_hw),
    "maskclip": lambda c: _up_abs(
        CE.mask_clip(c.bundle, c.x, _txt(c)), c.img_hw),
    "selfattn": lambda c: _up_abs(CE.self_attn(c.bundle, c.x), c.img_hw),
    "game": lambda c: _up_abs(
        CE.game(c.bundle, c.x, _tok(c)), c.img_hw),
    "rollout": lambda c: _up_abs(
        CE.clip_rollout(c.bundle, c.x, _tok(c)), c.img_hw),
    "lrp": lambda c: _up_abs(
        CE.clip_lrp(c.bundle, c.x, _tok(c))[1], c.img_hw),
    "grad_cam": lambda c: _up_abs(
        CE.clip_grad_cam(c.bundle, c.x, _txt(c)), c.img_hw),
    "rise": lambda c: _rise_entry(c),
    # surgery/m2ib consume the already-image-sized maps (no patch upsample)
    "surgery": lambda c: _surgery_entry(c),
    "m2ib": lambda c: _m2ib_entry(c),
}


def _surgery_entry(ctx):
    import jax.numpy as jnp

    from .methods.clip_surgery import surgery_map
    # text table: target caption first, then extra class texts — the
    # redundant-feature removal needs >1 class (evaluatePerturbation.py:
    # 425-429 passes the target plus 59 generic class names; with a single
    # class the mean-subtraction zeroes the map)
    txt = ctx.extras.get("surgery_text_features")
    if txt is None:
        table = ctx.bundle.extras["text_embeddings"]
        others = np.array([i for i in range(min(60, table.shape[0]))
                           if i != ctx.target][:59])
        txt = jnp.concatenate([table[ctx.target][None],
                               table[jnp.asarray(others)]])
    return np.abs(surgery_map(ctx.bundle, ctx.x, txt))


def _m2ib_entry(ctx):
    from .methods.clip_m2ib import vision_heatmap_iba
    return np.abs(vision_heatmap_iba(ctx.bundle, ctx.x,
                                     ctx.extras["txt_emb"], key=ctx.key))


def _rise_entry(ctx):
    from .methods.rise import rise
    sal = rise(ctx.bundle, ctx.x, ctx.target, ctx.key)
    return np.abs(np.asarray(sal))
