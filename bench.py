"""Headline benchmark: ResNet-50 IG-50 attribution maps/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's torch pipeline measured at ~1.1 attr/sec on a
datacenter GPU for IG-50 ResNet-50-class models (50 fwd+bwd per map, host
loop, batch 50 — evaluatePerturbation.py:89,109,632).  vs_baseline is
value / 1.1.
"""
import json
import time

import jax
import jax.numpy as jnp

# reference-equivalent torch GPU throughput for IG-50 on ResNet-50 (maps/s)
BASELINE_ATTR_PER_SEC = 1.1


def main():
    from xai_tpu.models import resnet
    from xai_tpu.methods import gradient as G

    bundle = resnet.make_bundle("resnet50")

    steps = 50
    chunk = 50
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (8, 224, 224, 3), jnp.float32)

    # warmup / compile
    attr = G.ig(bundle, imgs[0], 0, steps=steps, chunk=chunk)
    attr.block_until_ready()

    n = 16
    t0 = time.perf_counter()
    for i in range(n):
        attr = G.ig(bundle, imgs[i % 8], int(i % 1000), steps=steps,
                    chunk=chunk)
    attr.block_until_ready()
    dt = time.perf_counter() - t0

    rate = n / dt
    print(json.dumps({
        "metric": "resnet50_ig50_attr_per_sec",
        "value": round(rate, 3),
        "unit": "attributions/sec/chip",
        "vs_baseline": round(rate / BASELINE_ATTR_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
