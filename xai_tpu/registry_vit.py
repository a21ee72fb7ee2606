"""ViT attribution registry — reference CLI names from get_VIT_attr
(evaluatePerturbation.py:192-266).  Each entry returns the [H, W] saliency
(patch grid bilinear-upsampled, abs), matching the driver's
``resize(...)`` + ``np.abs(np.sum(..., axis=2))`` post-processing."""
from __future__ import annotations

import numpy as np

from .methods import vit_explain as VE
from .methods.vit_lrp import transformer_attribution
from .ops.resize import resize_bilinear


def _upsample_abs(patch_map, img_hw):
    up = resize_bilinear(patch_map, (img_hw, img_hw))
    return np.abs(np.asarray(up))


VIT_METHODS = {
    "attn": lambda c: _upsample_abs(VE.raw_attn(c.bundle, c.x), c.img_hw),
    "grad": lambda c: _upsample_abs(
        VE.attn_grad(c.bundle, c.x, c.target), c.img_hw),
    "cam_attn": lambda c: _upsample_abs(
        VE.cam_attn(c.bundle, c.x, c.target), c.img_hw),
    "n_rollout": lambda c: _upsample_abs(
        VE.naive_rollout(c.bundle, c.x), c.img_hw),
    "rollout": lambda c: _upsample_abs(VE.rollout(c.bundle, c.x), c.img_hw),
    "t_attn": lambda c: _upsample_abs(
        VE.transition_attention(c.bundle, c.x, c.target), c.img_hw),
    "attn_ig": lambda c: _upsample_abs(
        VE.attn_ig(c.bundle, c.x, c.target), c.img_hw),
    "attn_attr": lambda c: _upsample_abs(
        VE.attn_attr(c.bundle, c.x, c.target), c.img_hw),
    "bi_attn": lambda c: _upsample_abs(
        VE.bidirectional(c.bundle, c.x, c.target), c.img_hw),
    "InFlow": lambda c: _upsample_abs(
        VE.rave(c.bundle, c.x, c.target), c.img_hw),
    "t_attr": lambda c: _upsample_abs(
        transformer_attribution(c.bundle, c.x, c.target), c.img_hw),
    "TIS": lambda c: _tis_entry(c),
    "VIT_CX": lambda c: _vit_cx_entry(c),
}


def _tis_entry(ctx):
    from .methods.tis import tis
    sal = tis(ctx.bundle, ctx.x, ctx.target, key=ctx.key)
    return _upsample_abs(sal, ctx.img_hw)


def _vit_cx_entry(ctx):
    from .methods.vit_cx import vit_cx
    # driver broadcasts over 3 channels then abs-sums -> 3 * map
    sal = vit_cx(ctx.bundle, ctx.x, ctx.target, key=ctx.key)
    return 3.0 * np.abs(sal)
