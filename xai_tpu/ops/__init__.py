from .blur import gkern, make_blur_fn, gaussian_blur
from .resize import resize_bilinear, resize_nearest_exact
from .preprocess import load_and_preprocess, normalize, center_crop_resize
from .stats import auc, spearman, entropy_bits

__all__ = [
    "gkern", "make_blur_fn", "gaussian_blur",
    "resize_bilinear", "resize_nearest_exact",
    "load_and_preprocess", "normalize", "center_crop_resize",
    "auc", "spearman", "entropy_bits",
]
