"""Isolate the B-stage costs: raw ViT forward f32 vs bf16 at batch 128,
and segment_sum vs one-hot-matmul cluster reduction."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xai_tpu.models import vit
from xai_tpu.methods.gradient import _cast_params_cached

b = vit.make_bundle("VIT16")
key = jax.random.PRNGKey(0)
x128 = jax.random.normal(key, (128, 224, 224, 3)) * 0.5

fwd = jax.jit(lambda p, x: b.apply(p, x))
for tag, p, xx in (("f32", b.params, x128),
                   ("bf16", _cast_params_cached(b, jnp.bfloat16),
                    x128.astype(jnp.bfloat16))):
    out = fwd(p, xx); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = fwd(p, xx)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    tf = 128 * 17.6e9 / dt / 1e12
    print(f"fwd batch128 {tag}: {dt*1e3:6.1f} ms  {tf:5.1f} TFLOP/s  "
          f"out_dtype={out.dtype}")

masks = jax.random.uniform(key, (4, 768, 50176))
labels = jax.random.randint(key, (4, 768), 0, 29)

seg = jax.jit(lambda m, l: jax.vmap(
    lambda mm, ll: jax.ops.segment_sum(mm, ll, num_segments=64))(m, l))
ohm = jax.jit(lambda m, l: jnp.einsum(
    "bkf,bkn->bfn", jax.nn.one_hot(labels, 64, dtype=m.dtype,
                                   axis=-1).transpose(0, 2, 1)
    .transpose(0, 2, 1), m))
# simpler: oh [b, k, F]; cm = einsum('bkf,bkn->bfn', oh, m)
oh_fn = jax.jit(lambda m, l: jnp.einsum(
    "bkf,bkn->bfn", jax.nn.one_hot(l, 64, dtype=m.dtype), m))

a = seg(masks, labels); jax.block_until_ready(a)
t0 = time.time()
for _ in range(5):
    a = seg(masks, labels)
jax.block_until_ready(a)
print(f"segment_sum: {(time.time()-t0)/5*1e3:.1f} ms")

c = oh_fn(masks, labels); jax.block_until_ready(c)
t0 = time.time()
for _ in range(5):
    c = oh_fn(masks, labels)
jax.block_until_ready(c)
print(f"one-hot matmul: {(time.time()-t0)/5*1e3:.1f} ms")
np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5,
                           atol=1e-3)
print("reductions agree")
