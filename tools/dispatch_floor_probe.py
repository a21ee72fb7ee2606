"""Guided-IG / AGI batch-row decomposition (VERDICT r4 #1 settlement).

The r2 ">=15 attr/s" marks for guided-IG batch-16 and AGI batch-8 passed
in one r4 artifact and failed in the other (15.9 vs 10.3, 16.2 vs 10.4).
This probe splits each row into

  device - the fused batch computation, device-resident result, blocked
  e2e    - the production batch_attribution path (adds the [B,224,224]
           map download + per-call host dispatch)

and repeats each cell TWICE with a pause so within-probe drift is visible.
If the device rate clears 15 attr/s in both trials while e2e swings, the
mark is tunnel/environment-bound; if the device rate itself swings, the
chip allocation is shared.  Reference cost anchors: GIGBuilder.py:194-291,
AGI.py:52-80.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from xai_tpu.methods import batch as BT
from xai_tpu.models import resnet

bundle = resnet.make_bundle("resnet50")
imgs = jax.random.normal(jax.random.PRNGKey(0), (8, 224, 224, 3),
                         jnp.float32)
imgs01 = np.asarray(jax.nn.sigmoid(imgs))
targets = np.arange(8) % 1000
keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(0), i))
                 for i in range(8)])

i16 = np.concatenate([np.asarray(imgs)] * 2)
t16 = np.concatenate([targets] * 2)
k16 = np.concatenate([keys] * 2)


def rate(fn, n, B):
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(i)
        if hasattr(r, "block_until_ready"):
            r.block_until_ready()
    return n * B / (time.perf_counter() - t0)


print("| row | trial | device-in device-out | device-in e2e | "
      "numpy-in e2e (r4 bench methodology) |")
print("|---|---|---|---|---|")

# guided IG batch 16 ---------------------------------------------------------
i16d = jnp.asarray(i16)
i16d.block_until_ready()
gd = lambda i: BT.batch_attribution("cnn", "gig", bundle, i16d, i16d, t16,
                                    k16, as_numpy=False)
gde = lambda i: BT.batch_attribution("cnn", "gig", bundle, i16d, i16d,
                                     t16, k16)
ge = lambda i: BT.batch_attribution("cnn", "gig", bundle, i16, i16, t16,
                                    k16)
gd(0).block_until_ready()
ge(0)
for trial in (1, 2):
    dv = rate(gd, 2, 16)
    de = rate(gde, 2, 16)
    ee = rate(ge, 2, 16)
    print(f"| gig_batch16 | {trial} | {dv:.2f} | {de:.2f} | {ee:.2f} |",
          flush=True)
    time.sleep(5)

# AGI batch 8 ----------------------------------------------------------------
from xai_tpu.methods.agi import _agi_post                     # noqa: E402
from xai_tpu.methods.batch import _agi_batch_jit, _jit_napply, \
    _make_norm_apply                                          # noqa: E402
from xai_tpu.methods import gradient as G                     # noqa: E402

xs = jnp.asarray(imgs01, jnp.float32)
napply = _make_norm_apply(bundle.apply, tuple(bundle.meta.mean),
                          tuple(bundle.meta.std))
init_preds = jnp.argmax(_jit_napply(napply)(bundle.params, xs), axis=-1)
sel = tuple(range(0, 999, 1000))


def agi_dev(i):
    return _agi_post(_agi_batch_jit(napply, bundle.params, xs, init_preds,
                                    sel, 20, 0.05).astype(jnp.float32))


imgs01d = jnp.asarray(imgs01)
imgs01d.block_until_ready()
ade = lambda i: BT.batch_attribution("cnn", "agi", bundle, imgs01d,
                                     imgs01d, targets, keys)
ae = lambda i: BT.batch_attribution("cnn", "agi", bundle, imgs01, imgs01,
                                    targets, keys)
agi_dev(0).block_until_ready()
ae(0)
for trial in (1, 2):
    dv = rate(agi_dev, 2, 8)
    de = rate(ade, 2, 8)
    ee = rate(ae, 2, 8)
    print(f"| agi_batch8 | {trial} | {dv:.2f} | {de:.2f} | {ee:.2f} |",
          flush=True)
    time.sleep(5)
