"""Input preprocessing with exact reference parity.

The reference pipeline (evaluatePerturbation.py:690-694):
    transforms.Resize(img_hw)        # smaller edge -> img_hw, PIL bilinear
    transforms.CenterCrop(img_hw)
    transforms.ToTensor()            # HWC uint8 -> CHW float/255
then a per-family Normalize (:680-688).  torchvision applies Resize to the
PIL image with PIL's own resampler, so we use PIL directly for bit-exact
parity, and keep normalization on device (fused into the first conv by XLA).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
VIT_MEAN = (0.5, 0.5, 0.5)
VIT_STD = (0.5, 0.5, 0.5)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def center_crop_resize(img, img_hw: int = 224,
                       interpolation=None) -> np.ndarray:
    """PIL image -> [H, W, 3] float32 in [0, 1] (the reference's trans_img,
    transposed to HWC)."""
    if Image is None:
        raise RuntimeError("PIL required for image loading")
    interpolation = interpolation or Image.BILINEAR
    w, h = img.size
    # torchvision F.resize int-size semantics: short side -> img_hw, long
    # side TRUNCATED (int(size * long / short)), not rounded
    if w <= h:
        ow, oh = img_hw, int(img_hw * h / w)
    else:
        ow, oh = int(img_hw * w / h), img_hw
    img = img.resize((ow, oh), interpolation)
    # torchvision CenterCrop: round((dim - crop) / 2)
    left = int(round((ow - img_hw) / 2.0))
    top = int(round((oh - img_hw) / 2.0))
    img = img.crop((left, top, left + img_hw, top + img_hw))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr


def normalize(x, mean, std):
    """NHWC (or HWC) normalize."""
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x - mean) / std


def denormalize(x, mean, std):
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return x * std + mean


def load_and_preprocess(path: str, img_hw: int = 224,
                        mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """path -> (trans_img [H,W,3] in [0,1], input [1,H,W,3] normalized).

    Returns None for non-RGB-convertible images the reference skips
    (evaluatePerturbation.py:539-541 checks shape == (3, hw, hw))."""
    img = Image.open(path)
    if img.mode != "RGB":
        # reference keeps the raw mode and skips non-3-channel results
        arr = center_crop_resize(img, img_hw)
        if arr.ndim != 3 or arr.shape[-1] != 3:
            return None
    else:
        arr = center_crop_resize(img, img_hw)
    x = normalize(jnp.asarray(arr), mean, std)[None]
    return arr, x
