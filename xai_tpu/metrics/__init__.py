from .curves import (
    CurveOutputs,
    pixel_flip_steps,
    patch_flip_steps,
    reveal_curves,
    monotone_normalize,
    mas_scores,
    run_battery,
)

__all__ = [
    "CurveOutputs", "pixel_flip_steps", "patch_flip_steps", "reveal_curves",
    "monotone_normalize", "mas_scores", "run_battery",
]
