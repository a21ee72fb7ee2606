"""Stage-level timing for ViT-CX on the real chip.

Splits one vit_cx call into: masks+sim jit, [D, D] sim download, sklearn
complete-linkage clustering, and the cluster+score sweep — to see whether
the tunnel transfer (2.36 MB sim matrix) or the ~380 causal forwards
dominate.  Run alone (single-chip tunnel)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.cluster import AgglomerativeClustering

from xai_tpu.models import vit
from xai_tpu.methods import vit_cx as VC

b = vit.make_bundle("VIT16")
key = jax.random.PRNGKey(0)
xs = jax.random.normal(key, (4, 224, 224, 3)) * 0.5
H = 224

# warm
_ = VC.vit_cx(b, xs[0], 1)

for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
    t0 = time.time()
    for i in range(3):
        VC.vit_cx(b, xs[i % 4], i, dtype=dtype)
    print(f"vit_cx {tag}: {3/(time.time()-t0):.2f} attr/s")

# stage split (f32)
x = xs[0]
masks, tri, probs0 = VC._masks_and_sim_jit(b.apply_taps, b.params, x[None], H)
jax.block_until_ready(tri)
t0 = time.time()
masks, tri, probs0 = VC._masks_and_sim_jit(b.apply_taps, b.params, x[None], H)
jax.block_until_ready(tri)
t_sim = time.time() - t0

t0 = time.time()
sim_h = np.asarray(tri)
t_dl = time.time() - t0

t0 = time.time()
labels = VC._cluster_host(sim_h, masks.shape[0], 0.1)
t_cl = time.time() - t0
K = int(labels.max()) + 1
Kp = ((K + 63) // 64) * 64

noise_b = jax.random.normal(key, (Kp, H, H, 3)) * 0.1
target = int(jnp.argmax(probs0))
class_p = float(probs0[target])
lab_j = jnp.asarray(labels, jnp.int32)
sal = VC._cluster_and_score_jit(b.apply, 50, Kp, b.params, x, masks, lab_j,
                                noise_b, class_p, target, K)
jax.block_until_ready(sal)
t0 = time.time()
sal = VC._cluster_and_score_jit(b.apply, 50, Kp, b.params, x, masks, lab_j,
                                noise_b, class_p, target, K)
jax.block_until_ready(sal)
t_sc = time.time() - t0
t0 = time.time()
_ = np.asarray(sal)
t_dl2 = time.time() - t0

print(f"K={K} Kp={Kp}")
print(f"masks+sim jit   {t_sim*1e3:7.1f} ms")
print(f"sim download    {t_dl*1e3:7.1f} ms  ({sim_h.nbytes/1e6:.2f} MB)")
print(f"sklearn cluster {t_cl*1e3:7.1f} ms")
print(f"score sweep     {t_sc*1e3:7.1f} ms  (2*{Kp} fwds)")
print(f"sal download    {t_dl2*1e3:7.1f} ms")

# batched path
from xai_tpu.methods.vit_cx import vit_cx_batch
for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
    _ = vit_cx_batch(b, xs, dtype=dtype)           # warm
    t0 = time.time()
    for i in range(3):
        vit_cx_batch(b, xs, key=jax.random.PRNGKey(i), dtype=dtype)
    print(f"vit_cx_batch4 {tag}: {12/(time.time()-t0):.2f} attr/s")
