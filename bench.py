"""Benchmark suite: headline ResNet-50 IG-50 attributions/sec on one chip,
plus the broader surface (blocked IG, SmoothGrad device sweep, ViT rollout /
bi_attn, CLIP eclip, full metric battery) so round-over-round regressions
anywhere are visible.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
The headline keys keep the round-1 contract; "extras" is a list of
{metric, value, unit} dicts.

Baseline protocol: the reference implementation's own IG loop
(saliencyMethods.py:13-72, steps=50 batch=50) run with torch on THIS
machine's CPU (the reference's non-CUDA fallback), measured at
29.64 s/attribution on 2026-08-16 (see BASELINE.md).  vs_baseline =
value / (1 / 29.64).  For context, the same math on a datacenter GPU is
roughly 1-3 attr/s; the headline number is pipelined (the drivers enqueue
per-image work back-to-back); the blocked variant hard-syncs per map.
"""
import json
import time

import jax
import jax.numpy as jnp

MEASURED_TORCH_CPU_SECONDS_PER_ATTR = 29.64
BASELINE_ATTR_PER_SEC = 1.0 / MEASURED_TORCH_CPU_SECONDS_PER_ATTR

# MFU accounting for the IG sweep: ResNet-50 fwd ~4.1 GFLOP @224, VJP ~2x,
# 50 interpolation steps -> ~615 GFLOP per attribution; v5e fp32 peak
# ~48 TFLOP/s (BASELINE.md roofline note).
IG50_FLOP = 50 * 3 * 4.1e9
V5E_F32_PEAK = 48e12


def _pipelined(fn, n, depth=4):
    """Steady-state pipelined rate: enqueue, keep `depth` in flight."""
    t0 = time.perf_counter()
    inflight = []
    for i in range(n):
        inflight.append(fn(i))
        if len(inflight) > depth:
            inflight.pop(0).block_until_ready()
    for a in inflight:
        a.block_until_ready()
    return n / (time.perf_counter() - t0)


def _blocked(fn, n):
    t0 = time.perf_counter()
    for i in range(n):
        fn(i).block_until_ready()
    return n / (time.perf_counter() - t0)


def bench_resnet_ig(extras):
    from xai_tpu.methods import gradient as G
    from xai_tpu.models import resnet

    bundle = resnet.make_bundle("resnet50")
    imgs = jax.random.normal(jax.random.PRNGKey(0), (8, 224, 224, 3),
                             jnp.float32)
    targets = jnp.arange(8) % 1000

    # headline: batch-4 sweeps in one dispatch (math identical to the
    # per-image form; single-image dispatches leave pipeline bubbles the
    # tunnel RTT can't fill)
    B = 4
    igb = lambda i: G.ig_batch(bundle, imgs[:B], targets[:B], steps=50,
                               chunk=50)
    igb(0).block_until_ready()                      # compile
    rate = _pipelined(igb, 12) * B

    ig1 = lambda i: G.ig(bundle, imgs[i % 8], i % 1000, steps=50, chunk=50)
    ig1(0).block_until_ready()
    extras.append({"metric": "resnet50_ig50_single_attr_per_sec",
                   "value": round(_pipelined(ig1, 48), 3),
                   "unit": "attr/s/chip"})
    extras.append({"metric": "resnet50_ig50_attr_per_sec_blocked",
                   "value": round(_blocked(ig1, 16), 3),
                   "unit": "attr/s/chip"})

    # bf16 sweep (f32 Riemann mean + x-product): ~2x at batch 4 on v5e
    igb16 = lambda i: G.ig_batch(bundle, imgs[:B], targets[:B], steps=50,
                                 chunk=50, dtype=jnp.bfloat16)
    igb16(0).block_until_ready()
    extras.append({"metric": "resnet50_ig50_bf16_batch4_attr_per_sec",
                   "value": round(_pipelined(igb16, 12) * B, 3),
                   "unit": "attr/s/chip"})
    extras.append({"metric": "resnet50_ig50_mfu_f32",
                   "value": round(rate * IG50_FLOP / V5E_F32_PEAK, 4),
                   "unit": "fraction of 48 TFLOP/s"})

    # SmoothGrad 25x50: one folded device sweep (methods/gradient.py)
    key = jax.random.PRNGKey(1)
    sg1 = lambda i: G.smooth_grad(bundle, imgs[i % 8], i % 1000, key, "IG",
                                  steps=50)
    sg1(0).block_until_ready()
    sg_rate = _blocked(sg1, 4)
    extras.append({"metric": "resnet50_sg25x50_attr_per_sec",
                   "value": round(sg_rate, 3), "unit": "attr/s/chip"})

    # full 10-score metric battery on the IG map
    import numpy as np

    from xai_tpu.metrics import run_battery
    from xai_tpu.ops import make_blur_fn
    blur = make_blur_fn()
    sal = G.to_saliency(ig1(0))
    x0 = np.asarray(imgs[0])
    run_battery(bundle.apply, bundle.params, x0, sal, blur, chunk=25)
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        run_battery(bundle.apply, bundle.params, x0, sal, blur, chunk=25)
    extras.append({"metric": "battery10_images_per_sec",
                   "value": round(n / (time.perf_counter() - t0), 3),
                   "unit": "images/s/chip"})
    # Guided IG: the whole adaptive path search is one device dispatch
    from xai_tpu.methods import gig as GIG
    g1 = lambda i: GIG.guided_ig(bundle, imgs[i % 8], i % 1000, steps=50)
    g1(0)
    t0 = time.perf_counter()
    n = 6
    for i in range(n):
        g1(i)
    extras.append({"metric": "resnet50_guided_ig50_attr_per_sec",
                   "value": round(n / (time.perf_counter() - t0), 3),
                   "unit": "attr/s/chip"})
    return rate


def bench_vit(extras):
    from xai_tpu.methods import vit_explain as VE
    from xai_tpu.models import vit

    bundle = vit.make_bundle("VIT16")
    imgs = jax.random.normal(jax.random.PRNGKey(2), (4, 224, 224, 3),
                             jnp.float32)
    r1 = lambda i: VE.rollout(bundle, imgs[i % 4])
    r1(0).block_until_ready()
    extras.append({"metric": "vit_b16_rollout_attr_per_sec",
                   "value": round(_pipelined(r1, 32), 3),
                   "unit": "attr/s/chip"})

    b1 = lambda i: VE.bidirectional(bundle, imgs[i % 4], i % 1000)
    b1(0).block_until_ready()
    extras.append({"metric": "vit_b16_bi_attn_attr_per_sec",
                   "value": round(_blocked(b1, 8), 3),
                   "unit": "attr/s/chip"})

    from xai_tpu.methods import vit_lrp as VL
    t1 = lambda i: VL.transformer_attribution(bundle, imgs[i % 4], i % 1000)
    t1(0).block_until_ready()
    extras.append({"metric": "vit_b16_t_attr_attr_per_sec",
                   "value": round(_pipelined(t1, 16), 3),
                   "unit": "attr/s/chip"})


def bench_clip(extras):
    from xai_tpu.methods import clip_explain as CE
    from xai_tpu.models import clip as clipmod

    bundle = clipmod.make_bundle("CLIP16")
    bundle = clipmod.attach_text_table(bundle)
    txt = bundle.extras["text_embeddings"][:1]
    imgs = jax.random.normal(jax.random.PRNGKey(3), (4, 224, 224, 3),
                             jnp.float32)
    e1 = lambda i: CE.grad_eclip(bundle, imgs[i % 4], txt)
    e1(0).block_until_ready()
    extras.append({"metric": "clip_b16_eclip_attr_per_sec",
                   "value": round(_blocked(e1, 8), 3),
                   "unit": "attr/s/chip"})


def main():
    extras = []
    rate = bench_resnet_ig(extras)
    for part in (bench_vit, bench_clip):
        try:
            part(extras)
        except Exception as e:   # a broken sub-bench must not hide the rest
            extras.append({"metric": f"{part.__name__}_error",
                           "value": f"{type(e).__name__}: {e}",
                           "unit": "error"})
    print(json.dumps({
        "metric": "resnet50_ig50_attr_per_sec",
        "value": round(rate, 3),
        "unit": "attributions/sec/chip",
        "vs_baseline": round(rate / BASELINE_ATTR_PER_SEC, 2),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
