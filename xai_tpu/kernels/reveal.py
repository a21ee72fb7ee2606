"""Fused ranked-reveal batch construction — the curve engine's inner op.

Builds the [S, H, W, C] batch of progressively-revealed images
(``where(flip_step <= step_s, finish, start)``) in one pass.  The jnp form
is what the curve engine inlines (XLA fuses the select into the model's
first conv); the Pallas form materializes a chunk directly in VMEM-sized
tiles — useful when feeding an externally-compiled model or writing the
batch to HBM once for multiple consumers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def reveal_batch(start, finish, flip_step, steps) -> jnp.ndarray:
    """start/finish: [H, W, C]; flip_step: [H, W] int; steps: [S] int.
    Returns [S, H, W, C]."""
    fs = flip_step[None, :, :, None]
    return jnp.where(fs <= steps[:, None, None, None], finish[None],
                     start[None])


def _reveal_kernel(steps_ref, start_ref, finish_ref, flip_ref, out_ref):
    s = steps_ref[0]
    mask = (flip_ref[...] <= s)[..., None]
    out_ref[0] = jnp.where(mask, finish_ref[...], start_ref[...])


def pallas_reveal_batch(start, finish, flip_step, steps,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas form: one program per step; start/finish/flip stay resident,
    each program writes its [H, W, C] slab."""
    from jax.experimental import pallas as pl

    H, W, C = start.shape
    S = steps.shape[0]
    return pl.pallas_call(
        _reveal_kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (i,)),
            pl.BlockSpec((H, W, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((H, W, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((H, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, H, W, C), start.dtype),
        interpret=interpret,
    )(jnp.asarray(steps, jnp.int32), start, finish,
      jnp.asarray(flip_step, jnp.int32))
