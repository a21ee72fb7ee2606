from . import gradient

__all__ = [
    "gradient",
    # imported lazily by the registries; listed for discoverability:
    # batch (the fused multi-image attribution path), guided, ablation,
    # agi, gig, rise, lime, xrai, mda, mas_calibrate, mac, vit_explain,
    # vit_lrp, vit_cx, tis, clip_explain, clip_surgery, clip_m2ib,
    # adversarial, recalibration
]
