"""Quickshift parent-link stencil as a Pallas TPU kernel.

The XLA form (ops/quickshift_jax.py) materializes the (2w+1)^2 = 625-wide
neighbor window as a dense [H, W, K, 3] patches tensor — ~376 MB of HBM
traffic per 224px image for ~0.3 GFLOP of actual math, twice (density +
parent phases).  That made the segmenter the second-largest cost in LIME
(~50 ms/image, vs ~100 ms for the 1000-sample model sweep).

Pallas form: one program per image; the LAB image (~600 KB padded) and the
density plane live entirely in VMEM, and a ``fori_loop`` over the 625
window offsets reads shifted views straight from VMEM — HBM traffic drops
to one image read + one parent write (~1 MB), the VPU does the exp/compare
work, and the kernel runs in single-digit ms.

Semantics match ``_quickshift_core`` (same padding sentinels, same joint
color+spatial distance, same strict-inequality tie-breaking as argmin's
first-minimum rule); reference spec: lime/wrappers/scikit_image.py:87 and
skimage quickshift (Vedaldi & Soatto 2008).  Bit-exactness caveat: the
density is a 625-term float sum and XLA's reduce order differs from the
sequential loop here, so densities agree only to ~1e-6 relative — parent
choices can flip on exact density ties (same caveat as the C++ native
path, documented in ops/quickshift_jax.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.quickshift_jax import rgb2lab

_COLOR_FILL = 1e6          # matches _window_patches fill for LAB planes
_DENS_FILL = -1e30         # padded density: never a higher-density parent


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(H: int, W: int, w: int, wd: int):
    KW = 2 * w + 1
    K = KW * KW
    # Dynamic rotates require (8, 128)-aligned shapes; the alignment pad
    # holds the same sentinel and never wraps into the [0:H, 0:W] window
    # (max slice start + extent = 2w + H <= Hp <= Hp_pad).
    Hp, Wp = _round_up(H + 2 * w, 8), _round_up(W + 2 * w, 128)

    def kernel(lab_ref, inv2s2_ref, max_d2_ref, out_ref, dens_ref):
        inv2s2 = inv2s2_ref[0]
        max_d2 = max_d2_ref[0]
        l0 = lab_ref[0, 0]                               # [Hp, Wp] values
        l1 = lab_ref[0, 1]
        l2 = lab_ref[0, 2]
        c0 = l0[w:w + H, w:w + W]
        c1 = l1[w:w + H, w:w + W]
        c2 = l2[w:w + H, w:w + W]

        def shifted(x2d, dy, dx):
            # Mosaic rejects dynamic non-8-aligned slice offsets, but
            # supports dynamic circular rotates on both dims: rotate so
            # padded row/col (dy, dx) lands at 0, then slice statically.
            # out[i] = in[(i - s) % N], so s = N - dy puts in[dy] at 0;
            # wrapped-in pad garbage stays outside the [0:H, 0:W] window.
            r = pltpu.roll(x2d, (Hp - dy) % Hp, 0)
            r = pltpu.roll(r, (Wp - dx) % Wp, 1)
            return r[0:H, 0:W]

        def nb_d2(k):
            dy, dx = k // KW, k % KW
            n0 = shifted(l0, dy, dx)
            n1 = shifted(l1, dy, dx)
            n2 = shifted(l2, dy, dx)
            sp = ((dy - w) ** 2 + (dx - w) ** 2).astype(jnp.float32)
            return (((n0 - c0) ** 2 + (n1 - c1) ** 2) +
                    (n2 - c2) ** 2) + sp, dy, dx

        def dens_body(k, acc):
            d2, _, _ = nb_d2(k)
            return acc + jnp.exp(-d2 * inv2s2)

        dens = jax.lax.fori_loop(0, K, dens_body,
                                 jnp.zeros((H, W), jnp.float32))

        dens_ref[:, :] = jnp.full((Hp, Wp), _DENS_FILL, jnp.float32)
        dens_ref[w:w + H, w:w + W] = dens
        dens_pad = dens_ref[:, :]

        def parent_body(k, carry):
            best_d2, best_off = carry
            d2, dy, dx = nb_d2(k)
            ody, odx = dy - w, dx - w
            in_rad = jnp.logical_and(
                jnp.maximum(jnp.abs(ody), jnp.abs(odx)) <= wd,
                jnp.logical_or(ody != 0, odx != 0))
            nbd = shifted(dens_pad, dy, dx)
            ok = in_rad & (nbd > dens) & (d2 < max_d2)
            # strict < keeps the earliest k on ties = argmin's first-min
            upd = ok & (d2 < best_d2)
            return (jnp.where(upd, d2, best_d2),
                    jnp.where(upd, ody * W + odx, best_off))

        _, best_off = jax.lax.fori_loop(
            0, K, parent_body,
            (jnp.full((H, W), jnp.inf, jnp.float32),
             jnp.zeros((H, W), jnp.int32)))

        base = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W +
                jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
        out_ref[0] = base + best_off

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("w", "wd", "interpret"))
def quickshift_parents_pallas(rgbs, inv2s2, max_d2, ratio, *, w: int,
                              wd: int, interpret: bool = False):
    """[B, H, W, 3] sRGB in [0, 1] -> [B, H, W] int32 flat parent indices
    (same contract as ``_quickshift_device_b``)."""
    B, H, W = rgbs.shape[:3]
    Hp, Wp = _round_up(H + 2 * w, 8), _round_up(W + 2 * w, 128)
    lab = (rgb2lab(rgbs.astype(jnp.float32)) * ratio).transpose(0, 3, 1, 2)
    lab_p = jnp.pad(
        lab, ((0, 0), (0, 0), (w, Hp - H - w), (w, Wp - W - w)),
        constant_values=_COLOR_FILL)

    return pl.pallas_call(
        _make_kernel(H, W, w, wd),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, Hp, Wp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        scratch_shapes=[pltpu.VMEM((Hp, Wp), jnp.float32)],
        interpret=interpret,
    )(lab_p, jnp.asarray([inv2s2], jnp.float32),
      jnp.asarray([max_d2], jnp.float32))
