"""TIS scoring roofline check (part 2 of VERDICT r3 #2b).

Q1: does a bigger scoring chunk help (MXU utilization at M = chunk*100)?
Q2: does the scoring sweep run at the model's OWN batched-forward rate
    (i.e. is it at its roofline)?  Compare 1024 token-dropped forwards
    against the equivalent count of full-197-token batched forwards.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from xai_tpu.models import vit
from xai_tpu.methods import tis as T
from xai_tpu.methods.gradient import _cast_params_cached


def med_time(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    bundle = vit.make_bundle("VIT16")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    n_masks, target = 1024, 7

    logits, taps = bundle.apply_taps(bundle.params, x)
    blocks = taps["block_out"]
    acts = jnp.concatenate([blocks[i, 0] for i in range(blocks.shape[0])],
                           axis=-1)[1:].T
    centroids = T.kmeans(acts, key, n_masks)
    top = jax.lax.top_k(centroids, 98)[1]

    p16 = _cast_params_cached(bundle, jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)

    print(f"{'config':34s} {'ms':>9s} {'attr-equiv/s':>13s}")
    for chunk in (32, 64, 128, 256):
        for tag, pp, xx in (("f32", bundle.params, x),
                            ("bf16", p16, x16)):
            t = med_time(lambda: T._token_drop_scores(
                bundle.apply_tokens, pp, xx, top, chunk, target))
            print(f"scoring_1024 chunk={chunk:<4d} {tag:5s}"
                  f" {t*1e3:9.2f} {1.0/t:13.2f}")

    # model's own forward roofline at the same batch geometry: 1024
    # full-197-token forwards (same weights, ~2x the token FLOPs)
    for B in (64, 128):
        xb = jnp.broadcast_to(x16, (B, 224, 224, 3))
        fwd = jax.jit(lambda p, xs: bundle.apply(p, xs))
        t = med_time(lambda: jax.block_until_ready(
            [fwd(p16, xb) for _ in range(1024 // B)]))
        print(f"full197_fwd_1024 bf16 batch={B:<4d} {t*1e3:9.2f}"
              f" {1.0/t:13.2f}")


if __name__ == "__main__":
    main()
