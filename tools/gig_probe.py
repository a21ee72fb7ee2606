import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from xai_tpu.models import resnet
from xai_tpu.methods import batch as BT

bundle = resnet.make_bundle("resnet50")
keys8 = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(0), i))
                  for i in range(16)])
imgs = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                    (16, 224, 224, 3), jnp.float32))
targets = np.arange(16) % 1000

for B in (4, 8, 16):
    f = lambda: BT.batch_attribution("cnn", "gig", bundle, imgs[:B],
                                     imgs[:B], targets[:B], keys8[:B])
    t0 = time.perf_counter(); f(); print(f"B={B} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); n = 2
    for _ in range(n): f()
    dt = (time.perf_counter() - t0) / n
    print(f"gig batch{B}: {B/dt:.2f} attr/s", flush=True)
