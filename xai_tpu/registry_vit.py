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
    "MDA": lambda c: _mda_entry(c),
    "MDA_dense": lambda c: _mda_entry(c, dense=True),
}


def _mda_entry(ctx, dense: bool = False):
    import jax
    import jax.numpy as jnp
    from .methods.mda import mda, mda_dense
    from .ops.blur import make_blur_fn

    x = jnp.asarray(ctx.x)
    # adaptive blur kernel: grow until the blurred image's confidence in the
    # target drops below 1% (evaluatePerturbation.py:243-257)
    klen = 31
    while True:
        blur_fn = make_blur_fn(klen, float(klen))
        probs = jax.nn.softmax(
            ctx.bundle.apply(ctx.bundle.params, blur_fn(x[None]))[0])
        if float(probs[ctx.target]) * 100 <= 1 or klen > 101:
            break
        klen += 4
    prior = VE.bidirectional(ctx.bundle, x, ctx.target)
    prior_up = np.asarray(resize_bilinear(prior, (ctx.img_hw, ctx.img_hw)))
    prior3 = np.repeat(prior_up[..., None], 3, axis=-1)
    patch_count = ctx.bundle.meta.num_patches ** 2
    if dense:
        # seg-driver variant (evaluateImageNetSeg.py:291-326): dense rank
        # map, no 3x abs-sum (it is consumed minmax-normalized)
        return mda_dense(ctx.bundle, ctx.trans_img, x, prior3, patch_count,
                         blur_fn, target=ctx.target, dtype=ctx.dtype)
    m = mda(ctx.bundle, ctx.trans_img, x, prior3, patch_count, blur_fn,
            target=ctx.target, dtype=ctx.dtype)
    return 3.0 * np.abs(m)


def _tis_entry(ctx):
    from .methods.tis import tis
    sal = tis(ctx.bundle, ctx.x, ctx.target, key=ctx.key, dtype=ctx.dtype)
    return _upsample_abs(sal, ctx.img_hw)


def _vit_cx_entry(ctx):
    from .methods.vit_cx import vit_cx
    # driver broadcasts over 3 channels then abs-sums -> 3 * map
    sal = vit_cx(ctx.bundle, ctx.x, ctx.target, key=ctx.key,
                 dtype=ctx.dtype)
    return 3.0 * np.abs(sal)
