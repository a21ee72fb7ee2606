"""ctypes bridge to the native host helpers (libxai_native.so).

Auto-builds with make on first import if the .so is missing and a compiler
is available; otherwise falls back to the pure-numpy reference
implementations in fallback.py (same algorithms, slower).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libxai_native.so")


def _load():
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _HERE], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.slic.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                         ctypes.c_float, ctypes.c_int, i32p]
    lib.slic.restype = ctypes.c_int
    lib.felzenszwalb.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_float,
                                 ctypes.c_float, ctypes.c_int, i32p]
    lib.felzenszwalb.restype = ctypes.c_int
    lib.quickshift.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_float, ctypes.c_float,
                               ctypes.c_float, i32p]
    lib.quickshift.restype = ctypes.c_int
    lib.project_curve.argtypes = [f64p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, f64p]
    lib.project_curve.restype = None
    return lib


_LIB = _load()


def have_native() -> bool:
    return _LIB is not None


def slic(image: np.ndarray, n_segments: int, compactness: float = 10.0,
         max_iter: int = 10) -> np.ndarray:
    """[H, W, 3] float RGB in [0,1] -> [H, W] int32 labels (0..K-1).
    MDA's superpixel front-end (MDAFunctions.py:604)."""
    img = np.ascontiguousarray(image, dtype=np.float32)
    H, W = img.shape[:2]
    labels = np.empty((H, W), np.int32)
    if _LIB is not None:
        _LIB.slic(img, H, W, n_segments, compactness, max_iter,
                  labels.reshape(-1))
        return labels
    from .fallback import slic_np
    return slic_np(img, n_segments, compactness, max_iter)


def felzenszwalb(image: np.ndarray, scale: float, sigma: float = 0.8,
                 min_size: int = 20) -> np.ndarray:
    """XRAI/MAC's segmenter (XRAIBuilder.py:200-259)."""
    img = np.ascontiguousarray(image, dtype=np.float32)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    labels = np.empty((H, W), np.int32)
    if _LIB is not None:
        _LIB.felzenszwalb(img, H, W, C, scale, sigma, min_size,
                          labels.reshape(-1))
        return labels
    from .fallback import felzenszwalb_np
    return felzenszwalb_np(img, scale, sigma, min_size)


def quickshift(image: np.ndarray, ratio: float = 0.2,
               kernel_size: float = 4.0, max_dist: float = 200.0
               ) -> np.ndarray:
    """LIME's default segmenter (lime/wrappers/scikit_image.py:87)."""
    img = np.ascontiguousarray(image, dtype=np.float32)
    H, W = img.shape[:2]
    labels = np.empty((H, W), np.int32)
    if _LIB is not None:
        _LIB.quickshift(img, H, W, ratio, kernel_size, max_dist,
                        labels.reshape(-1))
        return labels
    from .fallback import quickshift_np
    return quickshift_np(img, ratio, kernel_size, max_dist)


def project_curve(y: np.ndarray, mode: str,
                  iters: int = 100000) -> np.ndarray:
    """Projection of a curve onto {convex (del) / concave (ins), [0,1] box,
    fixed endpoints} — the cvxopt QP (MASTestFunctions.py:311-350).
    Dykstra converges linearly, so the cap is high; both backends exit
    early once a sweep stops moving."""
    yv = np.ascontiguousarray(y, dtype=np.float64)
    out = np.empty_like(yv)
    m = 0 if mode == "del" else 1
    if _LIB is not None:
        _LIB.project_curve(yv, len(yv), m, iters, out)
        return out
    from .fallback import project_curve_np
    return project_curve_np(yv, mode, iters)
