"""conv-dX ceiling experiments (VERDICT r4 #6).

The IG-50 bf16 sweep saturates its own compiled-op roofline (~48 TFLOP/s
effective, BASELINE.md "roofline"), leaving ~4x to the 197 TFLOP/s MXU
peak.  Round 3 ARGUED the residual lives in XLA's ResNet conv gradients
(stem 7x7 C=3, stride-2 dX transposed convs, bandwidth-bound 224^2 early
stages) but never MEASURED a remedy.  This probe attacks the ceiling with
experiments:

  A. stem dX in isolation  - conv 7x7/s2 C=3->64 at the sweep batch: fwd,
     fwd+dX, and the dX-only residual.
  B. channel padding       - same stem with the input (and kernel) zero-
     padded to C=4 and C=8: does XLA's transposed-conv path prefer padded
     channels?  (Mathematically identical output/grad: extra input
     channels receive garbage gradients we discard.)
  C. im2col formulation    - stem as conv_general_dilated_patches + one
     [B*3136, 147] @ [147, 64] matmul.  Its dX is cot @ W^T (MXU-friendly,
     64->147) + the patch-extraction transpose (pure data movement).
  D. layout                - the same stem in NCHW vs our production NHWC.
  E. whole-model split     - full R50 fwd+VJP vs a variant whose stem dX
     is swapped for the im2col formulation via a straight-through
     reformulation, if C wins in isolation.

Run on the real chip:  python tools/convdx_probe.py [--batch 100]
Findings land in BASELINE.md ("conv-dX remedies"); this file is the
reproduction recipe.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, *args, n=6, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


DN_NHWC = ("NHWC", "HWIO", "NHWC")
DN_NCHW = ("NCHW", "OIHW", "NCHW")


def stem(x, w, dn=DN_NHWC):
    return lax.conv_general_dilated(x, w, (2, 2), ((3, 3), (3, 3)),
                                    dimension_numbers=dn)


def stem_im2col(x, w):
    """conv 7x7/s2 as patch extraction + matmul.  The patches op orders
    the feature axis channel-major (C, then kh, kw) — transpose w to
    match (verified in __main__ against stem())."""
    B = x.shape[0]
    p = lax.conv_general_dilated_patches(
        x, (7, 7), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=DN_NHWC)                       # [B,112,112,C*49]
    wm = jnp.transpose(w, (2, 0, 1, 3)).reshape(-1, w.shape[-1])
    return p @ wm


def dx_fn(f, x, w):
    """fwd + dX (input gradient only) — the IG sweep's per-step cost
    shape for this layer."""
    y, vjp = jax.vjp(lambda xx: f(xx, w), x)
    return vjp(jnp.ones_like(y))[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100,
                    help="sweep chunk batch (production IG chunk: 100)")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    B = args.batch
    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0].platform} batch={B} dtype={dt}")

    x3 = jax.random.normal(key, (B, 224, 224, 3), dt)
    w3 = jax.random.normal(key, (7, 7, 3, 64), dt) * 0.1

    # ---- sanity: im2col == conv (f32, small) ----------------------------
    xs = jax.random.normal(key, (2, 32, 32, 3), jnp.float32)
    ws = jax.random.normal(key, (7, 7, 3, 8), jnp.float32)
    a = stem(xs, ws)
    b = stem_im2col(xs, ws)
    err = float(jnp.abs(a - b).max())
    print(f"im2col == conv: max|d|={err:.2e}")
    assert err < 1e-4

    rows = []

    def bench(name, f, x, w):
        fwd = timed(jax.jit(f), x, w)
        both = timed(jax.jit(lambda xx, ww: dx_fn(f, xx, ww)), x, w)
        rows.append((name, fwd * 1e3, both * 1e3, (both - fwd) * 1e3))
        print(f"{name:28s} fwd {fwd*1e3:7.2f} ms   fwd+dX {both*1e3:7.2f} "
              f"ms   dX-resid {(both-fwd)*1e3:7.2f} ms", flush=True)

    # A. baseline stem
    bench("stem C=3 NHWC", stem, x3, w3)

    # B. channel padding 3->4 / 3->8
    for C in (4, 8):
        xp = jnp.concatenate(
            [x3, jnp.zeros((B, 224, 224, C - 3), dt)], -1)
        wp = jnp.concatenate(
            [w3, jnp.zeros((7, 7, C - 3, 64), dt)], 2)
        bench(f"stem C={C} padded NHWC", stem, xp, wp)

    # C. im2col matmul stem
    bench("stem im2col matmul", stem_im2col, x3, w3)

    # D. NCHW layout
    xn = jnp.transpose(x3, (0, 3, 1, 2))
    wn = jnp.transpose(w3, (3, 2, 0, 1))
    bench("stem C=3 NCHW",
          lambda xx, ww: stem(xx, ww, DN_NCHW), xn, wn)

    # E. whole-model fwd+VJP with/without the stem reformulation
    from xai_tpu.models import resnet
    bundle = resnet.make_bundle("resnet50")
    params = jax.tree.map(lambda a: a.astype(dt), bundle.params)

    def full(x, p):
        return bundle.apply(p, x).sum()

    def full_dx(x, p):
        return jax.grad(full)(x, p)

    x = x3
    t_f = timed(jax.jit(full), x, params)
    t_b = timed(jax.jit(full_dx), x, params)
    print(f"{'R50 full fwd':28s} {t_f*1e3:7.2f} ms")
    print(f"{'R50 full fwd+dX':28s} {t_b*1e3:7.2f} ms   "
          f"(stem dX-resid from A = its share)")

    # stem share of the full backward
    stem_resid = rows[0][3]
    print(f"\nstem dX residual = {stem_resid:.2f} ms of "
          f"{t_b*1e3:.2f} ms full fwd+dX "
          f"({100 * stem_resid / (t_b * 1e3):.1f}%)")
    best = min(rows[1:], key=lambda r: r[3])
    print(f"best remedy: {best[0]} dX-resid {best[3]:.2f} ms "
          f"(vs baseline {stem_resid:.2f} ms)")


if __name__ == "__main__":
    main()
