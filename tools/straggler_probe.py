import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from xai_tpu.models import resnet, vit
from xai_tpu.methods.lime import lime
from xai_tpu.methods.vit_cx import vit_cx

T0 = time.time()
def stage(m):
    print("%7.1fs %s" % (time.time() - T0, m), flush=True)

rb = resnet.make_bundle("resnet50")
stage("bundle ready")
img01 = np.asarray(jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(0), (224,224,3))))
for name, fn in [("lime f32", lambda i: lime(rb, img01, jax.random.PRNGKey(i))),
                 ("lime bf16", lambda i: lime(rb, img01, jax.random.PRNGKey(i), dtype=jnp.bfloat16))]:
    stage(f"{name} warming")
    fn(0)
    stage(f"{name} warmed")
    t0=time.perf_counter(); n=4
    for i in range(n): fn(i)
    print(f"{name}: {n/(time.perf_counter()-t0):.2f} attr/s", flush=True)

vb = vit.make_bundle("VIT16")
stage("vit bundle ready")
x = jax.random.normal(jax.random.PRNGKey(1), (224,224,3))
for name, fn in [("vit_cx f32", lambda i: vit_cx(vb, x, 1, key=jax.random.PRNGKey(i))),
                 ("vit_cx bf16", lambda i: vit_cx(vb, x, 1, key=jax.random.PRNGKey(i), dtype=jnp.bfloat16))]:
    stage(f"{name} warming")
    fn(0)
    stage(f"{name} warmed")
    t0=time.perf_counter(); n=4
    for i in range(n): fn(i)
    print(f"{name}: {n/(time.perf_counter()-t0):.2f} attr/s", flush=True)
