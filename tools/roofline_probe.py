import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from xai_tpu.models import resnet
from xai_tpu.methods import gradient as G

bundle = resnet.make_bundle("resnet50")

def timed(fn, n=4, warm=2):
    for _ in range(warm): fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n): r = fn()
    r.block_until_ready()
    return (time.perf_counter() - t0) / n

for B, chunk in [(4,100),(4,200),(8,200),(8,400),(16,400)]:
    xs = jax.random.normal(jax.random.PRNGKey(1), (B,224,224,3), jnp.float32)
    ts = jnp.arange(B) % 1000
    try:
        fn = lambda: G.ig_batch(bundle, xs, ts, steps=50, chunk=chunk, dtype=jnp.bfloat16)
        dt = timed(fn)
        print(f"ig_batch bf16 B={B} chunk={chunk}: {B/dt:.1f} attr/s blocked", flush=True)
    except Exception as e:
        print("B,chunk", B, chunk, "failed:", type(e).__name__, str(e)[:160], flush=True)

# pipelined (depth-2) at the best config
for B, chunk in [(8,200),(8,400)]:
    xs = jax.random.normal(jax.random.PRNGKey(1), (B,224,224,3), jnp.float32)
    ts = jnp.arange(B) % 1000
    fn = lambda i: G.ig_batch(bundle, xs, ts, steps=50, chunk=chunk, dtype=jnp.bfloat16)
    fn(0).block_until_ready()
    t0=time.perf_counter(); infl=[]
    n=8
    for i in range(n):
        infl.append(fn(i))
        if len(infl) > 2: infl.pop(0).block_until_ready()
    for a in infl: a.block_until_ready()
    dt=(time.perf_counter()-t0)/n
    print(f"ig_batch bf16 pipelined B={B} chunk={chunk}: {B/dt:.1f} attr/s", flush=True)
