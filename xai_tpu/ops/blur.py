"""Gaussian blur substrate — exact parity with the reference's ``gkern``.

The reference builds the kernel by gaussian-filtering a dirac delta with
``scipy.ndimage.gaussian_filter`` (MASTestFunctions.py:11-28) and applies it
with a stride-1 'same' conv (evaluatePerturbation.py:456-459).  We build the
identical kernel on host once, and run the conv on device as a depthwise
NHWC convolution — XLA maps it onto the MXU; for the common (31, 31) case a
separable Pallas path is available in kernels/blur_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter


@functools.lru_cache(maxsize=32)
def gkern(klen: int, nsig: float) -> np.ndarray:
    """The reference's kernel, returned as [klen, klen] float32 (the torch
    version tiles it into a [3,3,k,k] grouped-conv weight; we keep it 2-D and
    use a depthwise conv)."""
    inp = np.zeros((klen, klen))
    inp[klen // 2, klen // 2] = 1
    k = gaussian_filter(inp, nsig)
    return k.astype("float32")


def gaussian_blur(x: jnp.ndarray, klen: int = 31, nsig: float = 31.0
                  ) -> jnp.ndarray:
    """Depthwise 'same' blur of NHWC images (zero padding, matching torch
    ``conv2d(padding=klen//2)``)."""
    k = jnp.asarray(gkern(klen, nsig))
    c = x.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    return jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(1, 1),
        padding=((klen // 2, klen // 2), (klen // 2, klen // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def make_blur_fn(klen: int = 31, nsig: float = 31.0,
                 separable: bool = True):
    """jit-ready substrate_fn(x_nhwc) -> blurred, the metric battery's
    insertion substrate (evaluatePerturbation.py:456-471).

    The kernel is rank-1 to ~1e-10, so the default path runs two 1-D convs
    (klen*2 MACs/px instead of klen^2 — see kernels/blur_pallas.py)."""
    if separable:
        from ..kernels.blur_pallas import separable_blur
        return functools.partial(separable_blur, klen=klen, nsig=nsig)
    return functools.partial(gaussian_blur, klen=klen, nsig=nsig)
