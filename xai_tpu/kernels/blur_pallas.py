"""Separable Gaussian blur — the metric battery's substrate op.

The reference's blur is a dense 31x31 depthwise conv (961 MACs/pixel,
evaluatePerturbation.py:456-459).  The kernel is numerically rank-1
(SVD residual ~1e-10), so two 1-D passes (62 MACs/pixel) compute the same
thing ~15x cheaper.  Two device paths:

- :func:`separable_blur` — two ``lax.conv_general_dilated`` 1-D convs; XLA
  maps them onto the MXU; used by default on all backends;
- :func:`pallas_blur` — a hand-written Pallas TPU kernel (one program per
  image row-block; row pass then column pass in VMEM) for the 224x224x3
  hot shape, demonstrating the fused form.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blur import gkern


@functools.lru_cache(maxsize=16)
def _factors(klen: int, nsig: float):
    k = np.asarray(gkern(klen, nsig), np.float64)
    u, s, vt = np.linalg.svd(k)
    col = (u[:, 0] * np.sqrt(s[0]))
    row = (vt[0] * np.sqrt(s[0]))
    # fix sign (gaussian factors are positive)
    if col.sum() < 0:
        col, row = -col, -row
    return col.astype(np.float32), row.astype(np.float32)


def separable_blur(x: jnp.ndarray, klen: int = 31, nsig: float = 31.0
                   ) -> jnp.ndarray:
    """NHWC 'same' blur via two 1-D depthwise convs (zero padding, matching
    the dense conv to ~1e-7)."""
    col, row = _factors(klen, nsig)
    c = x.shape[-1]
    pad = klen // 2
    kcol = jnp.tile(jnp.asarray(col)[:, None, None, None], (1, 1, 1, c))
    krow = jnp.tile(jnp.asarray(row)[None, :, None, None], (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(
        x, kcol, (1, 1), ((pad, pad), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jax.lax.conv_general_dilated(
        y, krow, (1, 1), ((0, 0), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _blur_kernel(tcol_ref, trow_ref, x_ref, out_ref):
    """One program blurs one [H, W] channel plane held in VMEM.

    MXU formulation: a separable 'same' conv is two banded-Toeplitz matmuls,
    out = T_col @ x @ T_row^T — two 224-cube matmuls per plane ride the
    systolic array instead of 62 unrolled shifted adds on the VPU (which
    also stalls the Mosaic compiler at klen 31)."""
    y = jnp.dot(tcol_ref[...], x_ref[0],
                preferred_element_type=jnp.float32)
    out_ref[0] = jnp.dot(y, trow_ref[...].T,
                         preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=16)
def _toeplitz(klen: int, nsig: float, H: int, W: int):
    col, row = _factors(klen, nsig)
    pad = klen // 2

    def banded(vec, n):
        t = np.zeros((n, n), np.float32)
        for i in range(n):
            for tt in range(klen):
                j = i + tt - pad
                if 0 <= j < n:
                    t[i, j] += vec[tt]
        return t

    return banded(col, H), banded(row, W)


def pallas_blur(x: jnp.ndarray, klen: int = 31, nsig: float = 31.0,
                interpret: bool = False) -> jnp.ndarray:
    """[B, H, W, C] -> blurred, one Pallas program per (batch, channel)
    plane."""
    from jax.experimental import pallas as pl

    B, H, W, C = x.shape
    tcol, trow = _toeplitz(klen, nsig, H, W)
    planes = x.transpose(0, 3, 1, 2).reshape(B * C, H, W)

    out = pl.pallas_call(
        _blur_kernel,
        grid=(B * C,),
        in_specs=[
            pl.BlockSpec((H, H), lambda i: (0, 0)),
            pl.BlockSpec((W, W), lambda i: (0, 0)),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * C, H, W), x.dtype),
        interpret=interpret,
    )(jnp.asarray(tcol), jnp.asarray(trow), planes)
    return out.reshape(B, C, H, W).transpose(0, 2, 3, 1)
