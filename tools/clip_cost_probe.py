"""Stage decomposition of the CLIP explainer BATCH rows (VERDICT r4 #2).

Round 4 published batch-32 bf16 rows SLOWER than batch-8 f32 for
eclip/game/lrp with no decomposition.  This probe crosses batch {8, 32} x
dtype {f32, bf16} for each method and splits every cell into:

  compute  - the jitted vmapped adapter called with device-resident inputs,
             result left ON DEVICE (queued depth 2) -> pure device rate
  download - np.asarray(out) + host f32 cast (what batch_attribution adds)
  e2e      - the full production batch_attribution path (what bench times)

Output: one markdown table (pasted into BASELINE.md).  Reference cost
anchor: generate_emap.py:453-486 (per-image torch loop).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from xai_tpu.methods import batch as BT
from xai_tpu.methods import gradient as G
from xai_tpu.models import clip as clipmod

bundle = clipmod.make_bundle("CLIP16")
bundle = clipmod.attach_text_table(bundle)
emb_table = np.asarray(bundle.extras["text_embeddings"])
tok_table = np.asarray(bundle.extras["text_tokens_table"])

imgs8 = jax.random.normal(jax.random.PRNGKey(3), (8, 224, 224, 3),
                          jnp.float32)
METHODS = ["eclip", "game", "lrp"]
POINTS = [(8, None), (8, jnp.bfloat16), (32, None), (32, jnp.bfloat16)]


def timed(fn, n=3, warm=1):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    if hasattr(r, "block_until_ready"):
        r.block_until_ready()
    return (time.perf_counter() - t0) / n


print("| method | B | dtype | compute ms | download ms | e2e ms | "
      "e2e attr/s | device attr/s |")
print("|---|---|---|---|---|---|---|---|")
for name in METHODS:
    kind = BT.CLIP_EXTRA_KIND[name]
    for B, dt in POINTS:
        reps = int(np.ceil(B / 8))
        xs_f32 = jnp.asarray(np.concatenate([np.asarray(imgs8)] * reps)[:B])
        ts = np.arange(B) % 1000
        ks = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(4),
                                                     i)) for i in range(B)])
        ex = {"txt_emb": emb_table[ts], "text_tokens": tok_table[ts]}

        # --- the same compiled fn batch_attribution uses -----------------
        opts = dict(BT._DEFAULT_OPTS)
        fn = BT._cached_vmapped(
            ("clip", name), bundle.apply,
            (224, 50) + tuple(sorted(opts.items())),
            lambda: BT._clip_adapter(name, bundle, 224, 50, opts))
        extra = jnp.asarray(ex["txt_emb"] if kind == "txt"
                            else ex["text_tokens"])
        params, xs = bundle.params, xs_f32
        if dt is not None:
            t0 = time.perf_counter()
            params = G._cast_params_cached(bundle, dt)
            jax.block_until_ready(params)
            cast_s = time.perf_counter() - t0
            xs = xs_f32.astype(dt)
            if extra.dtype in (jnp.float32, jnp.float64):
                extra = extra.astype(dt)
        else:
            cast_s = 0.0
        tj = jnp.asarray(ts, jnp.int32)
        kj = jnp.asarray(ks)
        xs.block_until_ready()

        # compute only (queued depth 2, device-resident result)
        def dev():
            a = fn(params, xs, tj, kj, extra)
            b = fn(params, xs, tj, kj, extra)
            jax.block_until_ready((a, b))
            return a
        comp_ms = timed(dev, n=3) / 2 * 1000

        # download (+ host f32 cast, as batch_attribution does); each
        # iteration converts a FRESH device array — jax caches the host
        # copy on the array object, so re-converting one array times the
        # cache, not the tunnel
        outs = [fn(params, xs, tj, kj, extra) for _ in range(4)]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        for o in outs[1:]:
            np.asarray(o).astype(np.float32)
        dl_ms = (time.perf_counter() - t0) / (len(outs) - 1) * 1000

        # full production path
        def e2e():
            return BT.batch_attribution("clip", name, bundle, xs_f32,
                                        xs_f32, ts, ks, extras=ex, dtype=dt)
        e2e_ms = timed(e2e, n=3) * 1000

        tag = "bf16" if dt is not None else "f32"
        print(f"| {name} | {B} | {tag} | {comp_ms:.1f} | {dl_ms:.1f} | "
              f"{e2e_ms:.1f} | {B / e2e_ms * 1000:.1f} | "
              f"{B / comp_ms * 1000:.1f} |", flush=True)
