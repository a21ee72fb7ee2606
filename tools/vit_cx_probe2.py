"""Batched ViT-CX stage split + batch-8 + threaded clustering probe."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from xai_tpu.models import vit
from xai_tpu.methods import vit_cx as VC

b = vit.make_bundle("VIT16")
key = jax.random.PRNGKey(0)

for B in (4, 8):
    xs = jax.random.normal(key, (B, 224, 224, 3)) * 0.5
    H = 224
    # warm
    _ = VC.vit_cx_batch(b, xs)
    _ = VC.vit_cx_batch(b, xs, dtype=jnp.bfloat16)

    # stage A
    t0 = time.time()
    masks, tris, tgt, cp = VC._masks_and_sim_batch_jit(
        b.apply_taps, b.params, H, xs)
    jax.block_until_ready(tris)
    tA = time.time() - t0
    t0 = time.time()
    tris_h = np.asarray(tris)
    tDL = time.time() - t0
    D = masks.shape[1]

    t0 = time.time()
    labels = np.stack([VC._cluster_host(tris_h[i], D, 0.1)
                       for i in range(B)])
    tCL = time.time() - t0
    with ThreadPoolExecutor(4) as ex:
        t0 = time.time()
        labels2 = np.stack(list(ex.map(
            lambda i: VC._cluster_host(tris_h[i], D, 0.1), range(B))))
        tCLt = time.time() - t0
    assert (labels == labels2).all()

    Ks = labels.max(axis=1) + 1
    Kp = int(((Ks.max() + 63) // 64) * 64)
    noise = jax.random.normal(key, (B, Kp, H, H, 3)) * 0.1
    chunk = VC._chunk_for(Kp, 50)
    lab_j = jnp.asarray(labels, jnp.int32)
    ks_j = jnp.asarray(Ks, jnp.int32)

    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        params, x2, m2, n2 = b.params, xs, masks, noise
        if dtype is not None:
            from xai_tpu.methods.gradient import _cast_params_cached
            params = _cast_params_cached(b, dtype)
            x2, m2, n2 = xs.astype(dtype), masks.astype(dtype), noise.astype(dtype)
        sal = VC._cluster_and_score_batch_jit(
            b.apply, chunk, Kp, params, x2, m2, lab_j, n2, cp, tgt, ks_j)
        jax.block_until_ready(sal)
        t0 = time.time()
        sal = VC._cluster_and_score_batch_jit(
            b.apply, chunk, Kp, params, x2, m2, lab_j, n2, cp, tgt, ks_j)
        jax.block_until_ready(sal)
        tB = time.time() - t0
        print(f"B={B} {tag}: A {tA*1e3:6.1f}  dl {tDL*1e3:6.1f} "
              f"({tris_h.nbytes/1e6:.1f}MB)  cl {tCL*1e3:6.1f} "
              f"(thr {tCLt*1e3:6.1f})  B-stage {tB*1e3:6.1f}  Kp={Kp}")

    t0 = time.time()
    for i in range(3):
        VC.vit_cx_batch(b, xs, key=jax.random.PRNGKey(i))
    print(f"B={B} e2e f32: {3*B/(time.time()-t0):.2f} attr/s")
    t0 = time.time()
    for i in range(3):
        VC.vit_cx_batch(b, xs, key=jax.random.PRNGKey(i),
                        dtype=jnp.bfloat16)
    print(f"B={B} e2e bf16: {3*B/(time.time()-t0):.2f} attr/s")
