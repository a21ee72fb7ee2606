from .blur_pallas import separable_blur, pallas_blur
from .reveal import reveal_batch, pallas_reveal_batch

__all__ = ["separable_blur", "pallas_blur", "reveal_batch",
           "pallas_reveal_batch"]
