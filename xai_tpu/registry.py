"""Method / model / metric registries keyed by the reference CLI names.

The reference dispatches attributions through if/elif ladders in
``get_CNN_attr`` / ``get_VIT_attr`` / ``get_CLIP_attr``
(evaluatePerturbation.py:82-445).  Here each family has a registry mapping
the same names to pure functions ``(ctx) -> [H, W] saliency``, where ctx
carries the bundle, the normalized input, the [0,1] image, the target class
and a PRNG key (deterministically folded per image index).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .methods import gradient as G
from .methods import guided as GD
from .methods import ablation as AB
from .methods.agi import agi as agi_fn
from .methods.gig import guided_ig
from .methods.rise import rise as rise_fn
from .methods.gradient import to_saliency


@dataclasses.dataclass
class AttrContext:
    bundle: Any
    x: jnp.ndarray            # normalized [H, W, C]
    trans_img: np.ndarray     # [H, W, C] in [0, 1]
    target: int
    key: jax.Array
    img_hw: int = 224
    steps: int = 50
    extras: Optional[dict] = None
    # opt-in low-precision sweep dtype (driver --attr_dtype); consumed by
    # the entries whose methods take dtype=, ignored by the rest
    dtype: Any = None


def _abs_sum(fn):
    def wrapped(ctx):
        return to_saliency(fn(ctx))
    return wrapped


def _down_up(attr_hwc, img_hw: int, num_patches: int = 14):
    """NEAREST_EXACT downsize to the patch grid + bilinear resize back."""
    from .ops.resize import resize_bilinear, resize_nearest_exact
    chw = jnp.transpose(jnp.asarray(attr_hwc), (2, 0, 1))
    down = resize_nearest_exact(chw, (num_patches, num_patches))
    up = resize_bilinear(down, (img_hw, img_hw))
    return jnp.transpose(up, (1, 2, 0))


# --- CNN family (evaluatePerturbation.py:99-181) ---

CNN_METHODS: Dict[str, Callable] = {
    "grad": _abs_sum(lambda c: G.grad(c.bundle, c.x, c.target)),
    "inp_x_grad": _abs_sum(lambda c: G.inp_x_grad(c.bundle, c.x, c.target)),
    "ig": _abs_sum(lambda c: G.ig(c.bundle, c.x, c.target, c.steps, 1.0, 0.0,
                                  dtype=c.dtype)),
    "lig": _abs_sum(lambda c: G.ig(c.bundle, c.x, c.target, c.steps, 0.9,
                                   0.0, dtype=c.dtype)),
    "idg": _abs_sum(lambda c: G.idg(c.bundle, c.x, c.target, c.steps, 0.0)),
    "idgi": _abs_sum(lambda c: G.idgi(c.bundle, c.x, c.target, c.steps, 0.0)),
    "gig": _abs_sum(lambda c: guided_ig(c.bundle, c.x, c.target,
                                        steps=c.steps, fraction=0.5,
                                        max_dist=1.0)),
    "agi": lambda c: np.abs(agi_fn(c.bundle, c.trans_img)),
    "sg": _abs_sum(lambda c: G.smooth_grad(c.bundle, c.x, c.target, c.key,
                                           "IG", c.steps, 0.0,
                                           dtype=c.dtype)),
    "gc": _abs_sum(lambda c: GD.grad_cam(c.bundle, c.x, c.target,
                                         img_hw=c.img_hw)),
    "gbp": _abs_sum(lambda c: GD.guided_backprop(c.bundle, c.x, c.target)),
    "ggc": _abs_sum(lambda c: GD.guided_grad_cam(c.bundle, c.x, c.target,
                                                 img_hw=c.img_hw)),
    "gs": _abs_sum(lambda c: AB.gradient_shap(c.bundle, c.x, c.target,
                                              c.key)),
    # fa/occ: driver post-processes with NEAREST_EXACT downsize to the 14x14
    # patch grid then bilinear resize back (evaluatePerturbation.py:171-176)
    "fa": _abs_sum(lambda c: _down_up(
        AB.feature_ablation(c.bundle, c.x, c.target), c.img_hw)),
    "occ": _abs_sum(lambda c: _down_up(
        AB.occlusion(c.bundle, c.x, c.target), c.img_hw)),
    "shap": _abs_sum(lambda c: AB.shapley_sampling(c.bundle, c.x, c.target,
                                                   c.key)),
    "rise": lambda c: np.abs(np.asarray(
        rise_fn(c.bundle, c.x, c.target, c.key))),
    # xrai: segments from the normalized input, base attribution = IG
    # (evaluatePerturbation.py:142-146)
    "xrai": lambda c: np.abs(_xrai_entry(c)),
    # lime: model runs on the UNNORMALIZED [0,1] image — a reference quirk
    # (limeAttr.py:10-20 never applies the normalize transform); mask
    # broadcast over 3 channels -> abs-sum = 3 * mask
    "lime": lambda c: 3.0 * _lime_entry(c),
}


def _xrai_entry(ctx):
    from .methods.xrai import xrai
    base = np.asarray(G.ig(ctx.bundle, ctx.x, ctx.target, ctx.steps, 1.0,
                           0.0))
    return xrai(np.asarray(ctx.x), base)


def _lime_entry(ctx):
    from .methods.lime import lime
    return lime(ctx.bundle, ctx.trans_img, ctx.key, dtype=ctx.dtype)


def get_attribution(family: str, name: str, ctx: AttrContext) -> np.ndarray:
    table = {"cnn": CNN_METHODS}
    try:
        from .registry_vit import VIT_METHODS  # populated in vit phase
        table["vit"] = VIT_METHODS
    except ImportError:
        pass
    try:
        from .registry_clip import CLIP_METHODS
        table["clip"] = CLIP_METHODS
    except ImportError:
        pass
    methods = table[family]
    if name not in methods:
        raise KeyError(
            f"unknown {family} attribution '{name}'; available: "
            f"{sorted(methods)}")
    return np.asarray(methods[name](ctx))
