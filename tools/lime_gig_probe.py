import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from xai_tpu.models import resnet
from xai_tpu.methods.lime import lime_batch
from xai_tpu.methods import batch as BT

bundle = resnet.make_bundle("resnet50")
rs = np.random.RandomState(0)
imgs01 = rs.rand(16, 224, 224, 3).astype(np.float32)
keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(0), i))
                 for i in range(16)])
targets = np.arange(16) % 1000

def rate(tag, f, n, B):
    t0 = time.perf_counter(); f(); print(f"{tag} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n): f()
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {B/dt:.2f} attr/s", flush=True)

rate("lime fused B=4 bf16",
     lambda: lime_batch(bundle, imgs01[:4], keys[:4], dtype=jnp.bfloat16),
     3, 4)
rate("lime fused B=8 bf16",
     lambda: lime_batch(bundle, imgs01[:8], keys[:8], dtype=jnp.bfloat16),
     3, 8)
rate("lime fused B=4 f32",
     lambda: lime_batch(bundle, imgs01[:4], keys[:4]), 2, 4)

rate("gig nosort batch16",
     lambda: BT.batch_attribution("cnn", "gig", bundle, imgs01, imgs01,
                                  targets, keys), 2, 16)
rate("gig nosort batch8",
     lambda: BT.batch_attribution("cnn", "gig", bundle, imgs01[:8],
                                  imgs01[:8], targets[:8], keys[:8]), 2, 8)
