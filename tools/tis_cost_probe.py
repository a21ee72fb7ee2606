"""TIS stage-cost decomposition (VERDICT r3 #2b).

Round 3 measured TIS at 3.75 attr/s f32 -> 4.58 bf16 (+22%) while claiming
the 1024 token-dropped scoring forwards dominate "at their own roofline" —
if that were the whole story bf16 should approach 2x.  This probe times
each pipeline stage of methods/tis.py separately on the real chip:

  1. tap forward         (f32: produces the block activations)
  2. KMeans              (50 Lloyd iterations, [9216, 196] x K=1024,
                          HIGHEST-precision matmuls — stays f32 by design)
  3. top_k + mask build
  4. scoring sweep       (1024 ViT-B 99-token forwards) f32 AND bf16
  5. weighted sum / normalize

Budget anchor in the reference: TIS.py:244-330 (the scoring loop) vs
:96-157 (hooks + fast_pytorch_kmeans).

Run:  python tools/tis_cost_probe.py            (on the axon TPU chip)
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
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def main():
    bundle = vit.make_bundle("VIT16")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    n_masks, ratio, chunk, target = 1024, 0.5, 64, 7

    # -- stage 1: tap forward -------------------------------------------
    t_tap, (logits, taps) = med_time(
        lambda: bundle.apply_taps(bundle.params, x))
    blocks = taps["block_out"]
    acts = jnp.concatenate([blocks[i, 0] for i in range(blocks.shape[0])],
                           axis=-1)[1:].T
    acts = jax.block_until_ready(acts)
    n_tok = acts.shape[1]

    # -- stage 2: kmeans --------------------------------------------------
    t_km, centroids = med_time(lambda: T.kmeans(acts, key, n_masks))

    # -- stage 3: top_k + mask build --------------------------------------
    k = int(ratio * n_tok)

    def build_masks():
        top = jax.lax.top_k(centroids, k)[1]
        masks = jnp.zeros((n_masks, n_tok))
        return jax.vmap(lambda m, i: m.at[i].set(1.0))(masks, top), top
    t_mask, (masks, top) = med_time(build_masks)

    # -- stage 4: scoring sweep f32 / bf16 --------------------------------
    t_sc32, scores = med_time(lambda: T._token_drop_scores(
        bundle.apply_tokens, bundle.params, x, top, chunk, target))
    p16 = _cast_params_cached(bundle, jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)
    t_sc16, _ = med_time(lambda: T._token_drop_scores(
        bundle.apply_tokens, p16, x16, top, chunk, target))

    # -- stage 5: weighted sum ---------------------------------------------
    def wsum():
        raw = jnp.einsum("m,mt->t", scores, masks)
        sal = raw / jnp.maximum(masks.sum(0), 1.0)
        sal = sal.reshape(14, 14)
        return (sal - sal.min()) / sal.max()
    t_ws, _ = med_time(wsum)

    # -- end-to-end, both dtypes ------------------------------------------
    t_e2e32, _ = med_time(lambda: T.tis(bundle, x, target, key=key), reps=3)
    t_e2e16, _ = med_time(lambda: T.tis(bundle, x, target, key=key,
                                        dtype=jnp.bfloat16), reps=3)

    rows = [("tap_forward_f32", t_tap), ("kmeans_f32_50it", t_km),
            ("topk_mask_build", t_mask), ("scoring_1024_f32", t_sc32),
            ("scoring_1024_bf16", t_sc16), ("weighted_sum", t_ws),
            ("end_to_end_f32", t_e2e32), ("end_to_end_bf16", t_e2e16)]
    print(f"{'stage':24s} {'ms':>9s}")
    for name, t in rows:
        print(f"{name:24s} {t * 1e3:9.2f}")
    fixed = t_tap + t_km + t_mask + t_ws
    print(f"\nfixed (non-scoring) cost: {fixed*1e3:.1f} ms; "
          f"scoring f32 {t_sc32*1e3:.1f} -> bf16 {t_sc16*1e3:.1f} ms")
    print(f"attr/s: f32 {1/t_e2e32:.2f}  bf16 {1/t_e2e16:.2f}")
    amdahl = 1.0 / (fixed + t_sc16)
    print(f"Amdahl ceiling with current fixed costs + bf16 scoring: "
          f"{amdahl:.2f} attr/s")


if __name__ == "__main__":
    main()
