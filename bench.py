"""Benchmark suite covering the whole method surface (~60 rows), so
round-over-round regressions anywhere are driver-visible (VERDICT r2 #5).

Prints ONE COMPACT JSON line {"metric", "value", "unit", "vs_baseline", ...}
(the r4 artifact's ``parsed: null`` showed the driver's output capture is
~2 KB — the full per-row data now lives in the committed files
``BENCH_EXTRAS.json`` / ``BENCH_TABLE.md`` / ``BENCH_HISTORY.jsonl``, not
in the stdout line).

Measurement protocol (VERDICT r4 #1 — cross-RUN reproducibility):

* every throughput row is the MEDIAN of BENCH_REPS (>=3) timed repetitions,
  compile excluded by a warmup call, {min, max, reps} recorded;
* the WHOLE row set is then measured a SECOND time back-to-back (pass 2,
  same closures, everything warm) and each row records ``value_run2`` +
  ``cross_run_delta``; rows whose two medians disagree by >15% carry
  ``drift_flag: true`` — that separates code regressions from environment
  drift at the artifact level;
* rows whose per-dispatch period is < 5x the measured tunnel RTT carry
  ``tunnel_bound: true`` — they time the dev tunnel's blocking round-trip,
  not the chip; their production headline is the amortized batch row;
* every run appends one line per row to ``BENCH_HISTORY.jsonl`` (the
  variance manifest, VERDICT r4 #8); BENCH_TABLE.md footnotes any row whose
  current value deviates >25% from its committed history median.

MFU convention (VERDICT r3 #4 + r4 advisor rename): ``mfu_hw_*`` rows =
fraction of the DOCUMENTED v5e hardware peak (197 TFLOP/s bf16 MXU; no
separate f32 spec exists, so f32 MFU uses the same denominator).
``roofline_frac_*`` rows = fraction of an op ceiling MEASURED IN THIS RUN
(queued-dispatch throughput of the same compiled sweep, depth 8 — the
fastest the chip executes the op with zero host gaps), so the fraction is
a fraction by construction; the r4 constant-based version published
roofline_frac_bf16 = 1.112 against a stale constant (VERDICT r4 #5).

Baseline protocol: the reference implementation's own IG loop
(saliencyMethods.py:13-72, steps=50 batch=50) run with torch on THIS
machine's CPU (the reference's non-CUDA fallback), measured at
29.64 s/attribution on 2026-08-16 (see BASELINE.md).  vs_baseline =
value / (1 / 29.64).
"""
import json
import os
import re
import time

import numpy as np
import jax
import jax.numpy as jnp

MEASURED_TORCH_CPU_SECONDS_PER_ATTR = 29.64
BASELINE_ATTR_PER_SEC = 1.0 / MEASURED_TORCH_CPU_SECONDS_PER_ATTR

# MFU accounting for the IG sweep: ResNet-50 fwd ~4.1 GFLOP @224, VJP ~2x,
# 50 interpolation steps -> ~615 GFLOP per attribution.
IG50_FLOP = 50 * 3 * 4.1e9
V5E_HW_PEAK = 197e12          # documented v5e bf16 MXU peak

EXTRAS = []
_MEASURES = []                # (metric, measure_fn, reps) for pass 2
BENCH_REPS = max(1, int(os.environ.get("BENCH_REPS", "3")))
RUN_ID = int(time.time())

# wall-clock budget: the tunnel's compile service is erratic (each fresh
# jit signature 20-200s); rows are ordered required-first and the guard
# stops ADDING rows when the pass-1 budget is spent so the JSON line always
# lands.  Pass 2 (cross-run re-measurement, everything warm) gets the
# remainder up to BUDGET_S.
_T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2400"))
_PASS1_FRAC = 0.62
_SKIPPED = []
_RTT_S = None                 # measured tunnel blocking round-trip


def budget_ok(name):
    if time.time() - _T0 < BUDGET_S * _PASS1_FRAC:
        return True
    _SKIPPED.append(name)
    return False


def row(metric, value, unit="attr/s/chip", **extra_fields):
    if not isinstance(value, str):
        value = round(float(value), 3)
    e = {"metric": metric, "value": value, "unit": unit,
         "t": round(time.time() - _T0, 1)}   # budget diagnostics
    e.update(extra_fields)
    EXTRAS.append(e)


def mrow(metric, measure, unit="attr/s/chip", reps=None, blocking=True):
    """Median-of-reps throughput row: runs ``measure()`` BENCH_REPS times
    (caller already warmed the jit), records median + spread, and registers
    the closure for the pass-2 cross-run re-measurement.  ``blocking``:
    the measurement loop blocks on the tunnel once per dispatch (_blocked /
    _host_rate) — only those rows are candidates for the tunnel_bound
    label; pipelined rows overlap the RTT."""
    n = reps or BENCH_REPS
    vals = sorted(measure() for _ in range(n))
    med = vals[len(vals) // 2]
    row(metric, med, unit, min=round(float(vals[0]), 3),
        max=round(float(vals[-1]), 3), reps=len(vals),
        **({"blocking": True} if blocking else {}))
    _MEASURES.append((metric, measure, n))
    return med


def _pipelined(fn, n, depth=4):
    t0 = time.perf_counter()
    inflight = []
    for i in range(n):
        inflight.append(fn(i))
        if len(inflight) > depth:
            inflight.pop(0).block_until_ready()
    for a in inflight:
        a.block_until_ready()
    return n / (time.perf_counter() - t0)


def _queued(fn, n=8):
    """Queued-dispatch op throughput: submit all, block once at the end —
    the zero-host-gap device execution rate (the run-measured op ceiling)."""
    fn(0).block_until_ready()
    t0 = time.perf_counter()
    rs = [fn(i) for i in range(n)]
    for r in rs:
        r.block_until_ready()
    return n / (time.perf_counter() - t0)


def _blocked(fn, n):
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(i)
        if hasattr(r, "block_until_ready"):
            r.block_until_ready()
    return n / (time.perf_counter() - t0)


def _host_rate(fn, n):
    """For host-returning (numpy) methods."""
    t0 = time.perf_counter()
    for i in range(n):
        fn(i)
    return n / (time.perf_counter() - t0)


def _roofline_row(metric, frac, tag):
    """roofline_frac must be a FRACTION (<= 1) of the ceiling measured in
    THIS run (VERDICT r4 #5: the r4 constant-based bf16 row published
    1.112).  5% headroom tolerates drift between the two measurements;
    beyond that the row becomes a loud error, not a silent >1 value."""
    if frac > 1.05:
        row(metric, f"ANOMALY: frac {frac:.3f} > run-measured {tag} "
            "ceiling", "error")
    else:
        row(metric, frac, f"fraction of run-measured {tag} op ceiling")


def bench_resnet(extras):
    from xai_tpu.methods import batch as BT
    from xai_tpu.methods import gradient as G
    from xai_tpu.models import resnet

    bundle = resnet.make_bundle("resnet50")
    imgs = jax.random.normal(jax.random.PRNGKey(0), (8, 224, 224, 3),
                             jnp.float32)
    imgs01 = jax.nn.sigmoid(imgs)     # [0,1] for AGI
    targets = jnp.arange(8) % 1000
    keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(0),
                                                   i)) for i in range(8)])

    # headline: batch-4 f32 fused sweeps (round-1 metric contract)
    B = 4
    igb = lambda i: G.ig_batch(bundle, imgs[:B], targets[:B], steps=50,
                               chunk=100)
    igb(0).block_until_ready()
    rate = mrow("resnet50_ig50_batch4_attr_per_sec",
                lambda: _pipelined(igb, 12) * B, blocking=False)
    # run-measured f32 op ceiling at the same shape (queued, no host gaps)
    ceil_f32 = _queued(igb, 8) * B * IG50_FLOP
    row("measured_op_ceiling_f32_tflops", ceil_f32 / 1e12,
        "TFLOP/s queued ig_batch4 f32, this run")
    row("resnet50_ig50_mfu_hw_f32", rate * IG50_FLOP / V5E_HW_PEAK,
        "fraction of 197 TFLOP/s v5e peak")
    _roofline_row("resnet50_ig50_roofline_frac_f32",
                  rate * IG50_FLOP / ceil_f32, "f32")

    ig1 = lambda i: G.ig(bundle, imgs[i % 8], i % 1000, steps=50, chunk=50)
    ig1(0).block_until_ready()
    mrow("resnet50_ig50_single_attr_per_sec", lambda: _pipelined(ig1, 24),
         blocking=False)
    mrow("resnet50_ig50_attr_per_sec_blocked", lambda: _blocked(ig1, 8))

    # bf16 PRODUCTION operating point: batch-8, chunk-100 fused sweep
    B16 = 8
    igb16 = lambda i: G.ig_batch(bundle, imgs[:B16], targets[:B16],
                                 steps=50, chunk=100, dtype=jnp.bfloat16)
    igb16(0).block_until_ready()
    r16 = mrow("resnet50_ig50_bf16_batch8_attr_per_sec",
               lambda: _pipelined(igb16, 8, depth=2) * B16, blocking=False)
    ceil_bf16 = _queued(igb16, 8) * B16 * IG50_FLOP
    row("measured_op_ceiling_bf16_tflops", ceil_bf16 / 1e12,
        "TFLOP/s queued ig_batch8 bf16, this run")
    row("resnet50_ig50_mfu_hw_bf16", r16 * IG50_FLOP / V5E_HW_PEAK,
        "fraction of 197 TFLOP/s v5e peak")
    _roofline_row("resnet50_ig50_roofline_frac_bf16",
                  r16 * IG50_FLOP / ceil_bf16, "bf16")

    # metric battery (3 fused reveal passes), f32 and bf16
    from xai_tpu.metrics import run_battery
    from xai_tpu.ops import make_blur_fn
    blur = make_blur_fn()
    sal = G.to_saliency(ig1(0))
    x0 = np.asarray(imgs[0])
    run_battery(bundle.apply, bundle.params, x0, sal, blur, chunk=25)
    mrow("battery10_images_per_sec",
         lambda: _host_rate(lambda i: run_battery(
             bundle.apply, bundle.params, x0, sal, blur, chunk=25), 6),
         "images/s/chip")
    p16 = G._cast_params_cached(bundle, jnp.bfloat16)
    apply16 = _bf16_apply(bundle)
    run_battery(apply16, p16, x0, sal, blur, chunk=45)
    mrow("battery10_bf16_images_per_sec",
         lambda: _host_rate(lambda i: run_battery(
             apply16, p16, x0, sal, blur, chunk=45), 6),
         "images/s/chip")

    if not budget_ok("sg"):
        return rate
    # SmoothGrad 25x50 folded sweep
    key = jax.random.PRNGKey(1)
    sg1 = lambda i: G.smooth_grad(bundle, imgs[i % 8], i % 1000, key, "IG",
                                  steps=50)
    sg1(0).block_until_ready()
    mrow("resnet50_sg25x50_attr_per_sec", lambda: _blocked(sg1, 3))
    if budget_ok("sg_bf16"):
        sg16 = lambda i: G.smooth_grad(bundle, imgs[i % 8], i % 1000, key,
                                       "IG", steps=50, dtype=jnp.bfloat16)
        sg16(0).block_until_ready()
        mrow("resnet50_sg25x50_bf16_attr_per_sec", lambda: _blocked(sg16, 3))

    if not budget_ok("gig_and_rest"):
        return rate
    # guided IG: single-dispatch device search + cross-image vmapped batch
    from xai_tpu.methods import gig as GIG
    g1 = lambda i: GIG.guided_ig(bundle, imgs[i % 8], i % 1000, steps=50)
    g1(0)
    mrow("resnet50_guided_ig50_attr_per_sec", lambda: _host_rate(g1, 4))
    gb = lambda i: BT.batch_attribution("cnn", "gig", bundle,
                                        imgs[:4], imgs[:4],
                                        np.asarray(targets[:4]), keys[:4])
    gb(0)
    mrow("resnet50_guided_ig50_batch4_attr_per_sec",
         lambda: _host_rate(gb, 3) * 4)
    if budget_ok("gig_batch16"):
        # device-resident inputs, same methodology as the explainer batch
        # rows (re-uploading 9.6 MB of numpy per call measures the tunnel;
        # BASELINE.md "Guided-IG / AGI dispatch-floor decomposition")
        i16 = jnp.concatenate([imgs[:8], imgs[:8]])
        i16.block_until_ready()
        t16 = np.concatenate([np.asarray(targets[:8])] * 2)
        k16 = np.concatenate([keys[:8], keys[:8]])
        g16 = lambda i: BT.batch_attribution("cnn", "gig", bundle,
                                             i16, i16, t16, k16)
        g16(0)
        mrow("resnet50_guided_ig50_batch16_attr_per_sec",
             lambda: _host_rate(g16, 2) * 16)
        g16d = lambda i: BT.batch_attribution("cnn", "gig", bundle, i16,
                                              i16, t16, k16,
                                              as_numpy=False)
        g16d(0).block_until_ready()
        mrow("resnet50_guided_ig50_batch16_device_attr_per_sec",
             lambda: _blocked(g16d, 2) * 16)

    if not budget_ok("agi_and_rest"):
        return rate
    # AGI: single + batched PGD
    from xai_tpu.methods.agi import agi
    a1 = lambda i: agi(bundle, imgs01[i % 8])
    a1(0)
    mrow("resnet50_agi_attr_per_sec", lambda: _host_rate(a1, 4))
    # device-resident inputs (see gig note above)
    ab = lambda i: BT.batch_attribution("cnn", "agi", bundle, imgs01,
                                        imgs01, np.asarray(targets), keys)
    ab(0)
    mrow("resnet50_agi_batch8_attr_per_sec", lambda: _host_rate(ab, 3) * 8)
    abd = lambda i: BT.batch_attribution("cnn", "agi", bundle, imgs01,
                                         imgs01, np.asarray(targets), keys,
                                         as_numpy=False)
    abd(0).block_until_ready()
    mrow("resnet50_agi_batch8_device_attr_per_sec",
         lambda: _blocked(abd, 3) * 8)

    if not budget_ok("guided_family"):
        return rate
    # guided backprop / grad-cam family, batched production path
    for name in ("gbp", "gc", "ggc"):
        if not budget_ok(f"{name}_batch8"):
            return rate
        f = lambda i, n=name: BT.batch_attribution(
            "cnn", n, bundle, imgs, imgs, np.asarray(targets), keys)
        f(0)
        mrow(f"resnet50_{name}_batch8_attr_per_sec",
             lambda: _host_rate(f, 3) * 8)

    if not budget_ok("lime_xrai"):
        return rate
    # LIME (quickshift + ridge) and XRAI (felzenszwalb + greedy)
    from xai_tpu.methods.lime import lime
    l1 = lambda i: lime(bundle, np.asarray(imgs01[i % 4]),
                        jax.random.PRNGKey(i))
    l1(0)
    l1(1)      # warm both segment-count buckets (amortized in a real sweep)
    mrow("resnet50_lime_attr_per_sec", lambda: _host_rate(l1, 2))
    if budget_ok("lime_batch4"):
        from xai_tpu.methods.lime import lime_batch
        lkeys = np.stack([np.asarray(jax.random.PRNGKey(i))
                          for i in range(4)])
        lb = lambda i: lime_batch(bundle, np.asarray(imgs01[:4]), lkeys,
                                  dtype=jnp.bfloat16)
        lb(0)
        mrow("resnet50_lime_batch4_bf16_attr_per_sec",
             lambda: _host_rate(lb, 2) * 4)
    from xai_tpu.methods.xrai import xrai
    base_ig = np.asarray(G.ig(bundle, imgs[0], 1, 50, 1.0, 0.0))
    x1 = lambda i: xrai(np.asarray(imgs[i % 4]), base_ig)
    x1(0)
    mrow("resnet50_xrai_attr_per_sec", lambda: _host_rate(x1, 2))
    # NOTE (VERDICT r4 #4c): no xrai bf16 row.  XRAI's device cost is one
    # 50-step IG sweep; single-image IG is dispatch-bound at these shapes
    # (see resnet50_ig50_single vs batch rows), so casting it bf16 cannot
    # help and r4 measured it slower (2.6 vs 3.4).  The production
    # low-precision path is the batched base-IG sweep feeding the same host
    # greedy; its speed is the resnet50_ig50_bf16_batch8 row.

    return rate


def _bf16_apply(bundle):
    ap = bundle.apply

    def apply16(p, x):
        return ap(p, x.astype(jnp.bfloat16)).astype(jnp.float32)

    return apply16


def _explainer_batch_rows(BT, prefix, family, name, bundle, imgs, targets,
                          keys, extras_fn=None,
                          points=((8, None), (32, jnp.bfloat16))):
    """VERDICT r3 #3: saturate the ViT/CLIP explainer sweeps.  Per method:
    the round-3-comparable batch-8 f32 row plus a batch-32 bf16 row, both
    through the production batch_attribution path.  Each point is isolated
    (an OOM at batch 32 must not kill the remaining rows)."""
    for B, dt in points:
        reps = int(np.ceil(B / imgs.shape[0]))
        # images live ON DEVICE before the timed loop (as in a pipelined
        # production run, and as round 3 measured): re-uploading 5-19 MB
        # of numpy per call measures the dev tunnel's ~15 MB/s, not the
        # method (targets/keys stay host-side — the adapters consume them
        # as numpy)
        xs = jnp.asarray(np.concatenate([np.asarray(imgs)] * reps)[:B])
        xs.block_until_ready()
        ts = np.concatenate([np.asarray(targets)] * reps)[:B]
        ks = np.concatenate([np.asarray(keys)] * reps)[:B]
        ex = extras_fn(B) if extras_fn else None
        tag = "_bf16" if dt is not None else ""
        metric = f"{prefix}_{name}_batch{B}{tag}_attr_per_sec"
        if not budget_ok(metric):
            return
        try:
            f = lambda i: BT.batch_attribution(family, name, bundle, xs,
                                               xs, ts, ks, extras=ex,
                                               dtype=dt)
            if f(0) is None:
                # batch_attribution's documented no-batched-impl signal —
                # timing the None path would record an absurd rate
                row(metric, "batch_attribution returned None", "error")
                continue
            mrow(metric, lambda: _host_rate(f, 2) * B)
            if dt is not None:
                # device-resident rate (as_numpy=False): the map download
                # is 70-90% of the e2e time on the dev tunnel (BASELINE.md
                # "CLIP explainer batch decomposition") — this row tracks
                # the COMPUTE, immune to tunnel bandwidth drift
                fd = lambda i: BT.batch_attribution(
                    family, name, bundle, xs, xs, ts, ks, extras=ex,
                    dtype=dt, as_numpy=False)
                fd(0).block_until_ready()
                mrow(metric.replace("_attr_per_sec", "_device_attr_per_sec"),
                     lambda: _blocked(fd, 2) * B)
        except Exception as e:
            row(metric, f"{type(e).__name__}: {e}", "error")


def bench_vit(extras):
    from xai_tpu.methods import batch as BT
    from xai_tpu.methods import vit_explain as VE
    from xai_tpu.methods import vit_lrp as VL
    from xai_tpu.models import vit

    bundle = vit.make_bundle("VIT16")
    imgs = jax.random.normal(jax.random.PRNGKey(2), (8, 224, 224, 3),
                             jnp.float32)
    targets = np.arange(8) % 1000
    keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(3),
                                                   i)) for i in range(8)])

    r1 = lambda i: VE.rollout(bundle, imgs[i % 4])
    r1(0).block_until_ready()
    mrow("vit_b16_rollout_attr_per_sec", lambda: _pipelined(r1, 24),
         blocking=False)
    if not budget_ok("rollout_batches"):
        return
    _explainer_batch_rows(BT, "vit_b16", "vit", "rollout", bundle, imgs, targets, keys)

    if not budget_ok("VE.bidirectional"):
        return
    b1 = lambda i: VE.bidirectional(bundle, imgs[i % 4], i % 1000)
    b1(0).block_until_ready()
    mrow("vit_b16_bi_attn_attr_per_sec", lambda: _blocked(b1, 6))
    _explainer_batch_rows(BT, "vit_b16", "vit", "bi_attn", bundle, imgs, targets, keys)

    if not budget_ok("VL.transformer_attribution"):
        return
    t1 = lambda i: VL.transformer_attribution(bundle, imgs[i % 4], i % 1000)
    t1(0).block_until_ready()
    mrow("vit_b16_t_attr_attr_per_sec", lambda: _pipelined(t1, 12),
         blocking=False)
    _explainer_batch_rows(BT, "vit_b16", "vit", "t_attr", bundle, imgs, targets, keys)

    if not budget_ok("vit_cx"):
        return
    from xai_tpu.methods.vit_cx import vit_cx
    v1 = lambda i: vit_cx(bundle, imgs[i % 4], i % 1000,
                          key=jax.random.PRNGKey(i))
    v1(0)
    mrow("vit_b16_vit_cx_attr_per_sec", lambda: _host_rate(v1, 3))
    if budget_ok("vit_cx_batch"):
        from xai_tpu.methods.vit_cx import vit_cx_batch
        vb = lambda i: vit_cx_batch(bundle, imgs[:4],
                                    key=jax.random.PRNGKey(i),
                                    dtype=jnp.bfloat16)
        vb(0)
        mrow("vit_b16_vit_cx_batch4_bf16_attr_per_sec",
             lambda: _host_rate(vb, 3) * 4)

    if not budget_ok("tis"):
        return
    from xai_tpu.methods.tis import tis
    s1 = lambda i: tis(bundle, imgs[i % 4], i % 1000,
                       key=jax.random.PRNGKey(i))
    s1(0).block_until_ready()
    mrow("vit_b16_tis_attr_per_sec", lambda: _blocked(s1, 3))
    if budget_ok("tis_bf16"):
        s16 = lambda i: tis(bundle, imgs[i % 4], i % 1000,
                            key=jax.random.PRNGKey(i), dtype=jnp.bfloat16)
        s16(0).block_until_ready()
        mrow("vit_b16_tis_bf16_attr_per_sec", lambda: _blocked(s16, 3))

    if not budget_ok("mda"):
        return
    # MDA at the quick 16-patch budget (warm), f32 + bf16 (VERDICT r3 #2a)
    from xai_tpu.methods.mda import mda
    from xai_tpu.ops.blur import make_blur_fn
    blur = jax.jit(make_blur_fn(31, 31.0))
    prior = np.repeat(np.asarray(
        VE.bidirectional(bundle, imgs[0], 1))[..., None], 3, -1)
    prior224 = np.repeat(np.asarray(jax.image.resize(
        jnp.asarray(prior[..., 0]), (224, 224), "linear"))[..., None], 3, -1)
    m1 = lambda i: mda(bundle, np.asarray(imgs[i % 2]), imgs[i % 2],
                       prior224, 16, blur, target=1)
    m1(0)
    mrow("vit_b16_mda16_attr_per_sec", lambda: _host_rate(m1, 2))
    if budget_ok("mda_bf16"):
        m16 = lambda i: mda(bundle, np.asarray(imgs[i % 2]), imgs[i % 2],
                            prior224, 16, blur, target=1,
                            dtype=jnp.bfloat16)
        m16(0)
        mrow("vit_b16_mda16_bf16_attr_per_sec", lambda: _host_rate(m16, 2))
    if budget_ok("mda196"):
        # the reference's PRODUCTION shape: patch_count = 196
        # (MDAFunctions.py:600-626, driver evaluatePerturbation.py:243-263)
        # — committed as an artifact row (VERDICT r4 #4d), not prose
        m196 = lambda i: mda(bundle, np.asarray(imgs[i % 2]), imgs[i % 2],
                             prior224, 196, blur, target=1)
        m196(0)
        mrow("vit_b16_mda196_attr_per_sec", lambda: _host_rate(m196, 1))


def bench_clip(extras):
    from xai_tpu.methods import batch as BT
    from xai_tpu.methods import clip_explain as CE
    from xai_tpu.models import clip as clipmod

    bundle = clipmod.make_bundle("CLIP16")
    bundle = clipmod.attach_text_table(bundle)
    txt = bundle.extras["text_embeddings"][:1]
    toks = bundle.extras["text_tokens_table"][:1]
    imgs = jax.random.normal(jax.random.PRNGKey(3), (8, 224, 224, 3),
                             jnp.float32)
    targets = np.arange(8) % 1000
    keys = np.stack([np.asarray(jax.random.fold_in(jax.random.PRNGKey(4),
                                                   i)) for i in range(8)])
    emb_table = np.asarray(bundle.extras["text_embeddings"])
    tok_table = np.asarray(bundle.extras["text_tokens_table"])

    def _txt_extras(B):
        t = np.arange(B) % 1000
        return {"txt_emb": emb_table[t], "text_tokens": tok_table[t]}

    e1 = lambda i: CE.grad_eclip(bundle, imgs[i % 4], txt)
    e1(0).block_until_ready()
    mrow("clip_b16_eclip_attr_per_sec", lambda: _blocked(e1, 6))
    if not budget_ok("eclip_batches"):
        return
    _explainer_batch_rows(BT, "clip_b16", "clip", "eclip", bundle, imgs, targets, keys,
                          extras_fn=_txt_extras)

    if not budget_ok("CE.game"):
        return
    g1 = lambda i: CE.game(bundle, imgs[i % 4], toks)
    g1(0).block_until_ready()
    mrow("clip_b16_game_attr_per_sec", lambda: _blocked(g1, 6))
    _explainer_batch_rows(BT, "clip_b16", "clip", "game", bundle, imgs, targets, keys,
                          extras_fn=_txt_extras)

    if not budget_ok("CE.clip_lrp"):
        return
    lr = lambda i: CE.clip_lrp(bundle, imgs[i % 4], toks)[1]
    lr(0).block_until_ready()
    mrow("clip_b16_clip_lrp_attr_per_sec", lambda: _blocked(lr, 6))
    _explainer_batch_rows(BT, "clip_b16", "clip", "lrp", bundle, imgs, targets, keys,
                          extras_fn=_txt_extras)

    if not budget_ok("surgery_map"):
        return
    from xai_tpu.methods.clip_surgery import surgery_map
    stxt = bundle.extras["text_embeddings"][:60]
    su = lambda i: surgery_map(bundle, imgs[i % 4], stxt)
    su(0)
    mrow("clip_b16_surgery_attr_per_sec", lambda: _host_rate(su, 6))
    _explainer_batch_rows(BT, "clip_b16", "clip", "surgery", bundle, imgs, targets,
                          keys, extras_fn=lambda B: {})

    if budget_ok("clip_rise"):
        from xai_tpu.methods.rise import rise
        r1 = lambda i: rise(bundle, imgs[i % 4], i % 1000,
                            jax.random.PRNGKey(i))
        r1(0).block_until_ready()
        mrow("clip_b16_rise2000_attr_per_sec", lambda: _blocked(r1, 2))
        if budget_ok("clip_rise_bf16"):
            r16 = lambda i: rise(bundle, imgs[i % 4], i % 1000,
                                 jax.random.PRNGKey(i), dtype=jnp.bfloat16)
            r16(0).block_until_ready()
            mrow("clip_b16_rise2000_bf16_attr_per_sec",
                 lambda: _blocked(r16, 2))

    if not budget_ok("vision_heatmap_iba"):
        return
    from xai_tpu.methods.clip_m2ib import vision_heatmap_iba
    m1 = lambda i: vision_heatmap_iba(bundle, imgs[i % 4], txt,
                                      key=jax.random.PRNGKey(i))
    m1(0)
    mrow("clip_b16_m2ib_attr_per_sec", lambda: _host_rate(m1, 3))
    if budget_ok("m2ib_batch"):
        mk = np.stack([np.asarray(jax.random.fold_in(
            jax.random.PRNGKey(5), i)) for i in range(8)])
        memb = np.tile(np.asarray(txt).reshape(1, -1), (8, 1))
        # device-resident inputs, same methodology as the other batch rows
        mxs = jnp.concatenate([imgs[:4], imgs[:4]])
        mb = lambda i: BT.batch_attribution(
            "clip", "m2ib", bundle, mxs, mxs, np.arange(8), mk,
            extras={"txt_emb": memb})
        mb(0)
        mrow("clip_b16_m2ib_batch8_attr_per_sec",
             lambda: _host_rate(mb, 2) * 8)


# ---------------------------------------------------------------------------
# pass 2: cross-run re-measurement + per-row annotations (VERDICT r4 #1)
# ---------------------------------------------------------------------------

def second_pass():
    by_name = {e["metric"]: e for e in EXTRAS}
    skipped = []
    for metric, measure, n in _MEASURES:
        if time.time() - _T0 > BUDGET_S:
            skipped.append(metric)
            continue
        e = by_name.get(metric)
        if e is None or isinstance(e["value"], str):
            continue
        try:
            vals = sorted(measure() for _ in range(n))
        except Exception as exc:
            e["run2_error"] = f"{type(exc).__name__}: {exc}"
            continue
        med2 = float(vals[len(vals) // 2])
        e["value_run2"] = round(med2, 3)
        v1 = float(e["value"])
        d = (med2 - v1) / v1 if v1 else 0.0
        e["cross_run_delta"] = round(d, 3)
        if abs(d) > 0.15:
            e["drift_flag"] = True
    if skipped:
        row("pass2_skipped_after_budget", ",".join(skipped), "note")


def annotate_tunnel_bound():
    """Rows whose per-DISPATCH period is < 5x the measured blocking RTT are
    timing the tunnel, not the chip (VERDICT r4 #1)."""
    if not _RTT_S:
        return
    for e in EXTRAS:
        if not isinstance(e.get("value"), (int, float)) or e["value"] <= 0:
            continue
        if not e.get("blocking"):
            continue     # pipelined rows overlap the RTT — not applicable
        if "attr_per_sec" not in e["metric"] and \
                "images_per_sec" not in e["metric"]:
            continue
        m = re.search(r"batch(\d+)", e["metric"])
        b = int(m.group(1)) if m else 1
        period = b / float(e["value"])
        e["dispatch_period_s"] = round(period, 4)
        if period < 5.0 * _RTT_S:
            e["tunnel_bound"] = True


# ---------------------------------------------------------------------------
# artifacts: history manifest, extras file, markdown table, stdout line
# ---------------------------------------------------------------------------

def _load_history():
    hist = {}
    try:
        with open("BENCH_HISTORY.jsonl") as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if isinstance(r.get("value"), (int, float)):
                    hist.setdefault(r["metric"], []).append(float(r["value"]))
    except OSError:
        pass
    return hist


def append_history():
    with open("BENCH_HISTORY.jsonl", "a") as f:
        for e in EXTRAS:
            if not isinstance(e.get("value"), (int, float)):
                continue
            rec = {"run": RUN_ID, "metric": e["metric"],
                   "value": e["value"], "unit": e["unit"]}
            for k in ("min", "max", "value_run2", "cross_run_delta"):
                if k in e:
                    rec[k] = e[k]
            f.write(json.dumps(rec) + "\n")


def write_table(headline_rate, history):
    lines = ["# BENCH_TABLE (generated by bench.py — do not hand-edit)",
             "",
             f"Protocol: median of {BENCH_REPS} reps per row, then the whole "
             "row set re-measured back-to-back (run2); drift = |run2-run1| "
             "> 15%.  `tunnel` marks rows whose per-dispatch period is < 5x "
             "the measured tunnel RTT — they time the dev tunnel, not the "
             "chip; use the amortized batch row.  `hist!` marks rows >25% "
             "off their BENCH_HISTORY.jsonl median.",
             "",
             "| metric | value | run2 | Δ | min | max | unit | flags |",
             "|---|---|---|---|---|---|---|---|",
             f"| resnet50_ig50_attr_per_sec | {headline_rate:.3f} | | | | |"
             " attr/s/chip | |"]
    for e in EXTRAS:
        flags = []
        if e.get("tunnel_bound"):
            flags.append("tunnel")
        if e.get("drift_flag"):
            flags.append("drift")
        h = history.get(e["metric"])
        if h and isinstance(e.get("value"), (int, float)):
            hm = sorted(h)[len(h) // 2]
            if hm > 0 and abs(e["value"] - hm) / hm > 0.25:
                flags.append("hist!")
        d = e.get("cross_run_delta")
        lines.append(
            f"| {e['metric']} | {e['value']} | {e.get('value_run2', '')} | "
            f"{'' if d is None else d} | {e.get('min', '')} | "
            f"{e.get('max', '')} | {e['unit']} | {' '.join(flags)} |")
    with open("BENCH_TABLE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    global _RTT_S
    # persistent compile cache: a no-op on the tunnel backend, minutes
    # saved on real TPU VMs where the driver re-runs bench every round
    try:
        from xai_tpu.runners.common import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    # tunnel health diagnostics: blocking-dispatch RTT and device->host
    # bandwidth vary >5x day-to-day on the shared tunnel and bound every
    # host-blocking row (single-attr rates, batch rows' map downloads) —
    # recording them makes rounds comparable
    try:
        f = jax.jit(lambda x: x + 1.0)
        tiny = jnp.zeros((8,))
        big = jnp.zeros((8, 224, 224))
        np.asarray(f(tiny)), np.asarray(f(big))
        t0 = time.perf_counter()
        for _ in range(10):
            np.asarray(f(tiny))
        rtt = (time.perf_counter() - t0) / 10
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(f(big))
        per_big = (time.perf_counter() - t0) / 5
        _RTT_S = rtt
        row("tunnel_rtt_ms", rtt * 1000, "ms blocking round-trip")
        row("tunnel_down_mbps",
            (big.size * 4 / 1e6) / max(per_big - rtt, 1e-9),
            "MB/s device->host")
    except Exception:
        pass
    rate = None
    try:
        rate = bench_resnet(EXTRAS)
    except Exception as e:
        EXTRAS.append({"metric": "bench_resnet_error",
                       "value": f"{type(e).__name__}: {e}",
                       "unit": "error"})
    for part in (bench_vit, bench_clip):
        try:
            part(EXTRAS)
        except Exception as e:   # a broken sub-bench must not hide the rest
            EXTRAS.append({"metric": f"{part.__name__}_error",
                           "value": f"{type(e).__name__}: {e}",
                           "unit": "error"})
    if _SKIPPED:
        EXTRAS.append({"metric": "rows_skipped_after_budget",
                       "value": ",".join(_SKIPPED), "unit": "note"})
    try:
        second_pass()
    except Exception as e:
        EXTRAS.append({"metric": "second_pass_error",
                       "value": f"{type(e).__name__}: {e}", "unit": "error"})
    annotate_tunnel_bound()
    if rate is None:
        rate = 0.0
    history = _load_history()
    try:
        append_history()
    except Exception:
        pass
    try:
        write_table(rate, history)
    except Exception:
        pass
    try:
        with open("BENCH_EXTRAS.json", "w") as f:
            json.dump({"run": RUN_ID, "headline": round(rate, 3),
                       "extras": EXTRAS}, f, indent=1)
    except Exception:
        pass
    drift = [e["metric"] for e in EXTRAS if e.get("drift_flag")]
    nrows = sum(1 for e in EXTRAS
                if isinstance(e.get("value"), (int, float)))
    # COMPACT stdout line (the driver's capture truncates ~2 KB; full rows
    # live in BENCH_EXTRAS.json / BENCH_TABLE.md / BENCH_HISTORY.jsonl)
    print(json.dumps({
        "metric": "resnet50_ig50_attr_per_sec",
        "value": round(rate, 3),
        "unit": "attributions/sec/chip",
        "vs_baseline": round(rate / BASELINE_ATTR_PER_SEC, 2),
        "rows": nrows,
        "drift_rows_gt15pct": drift[:8],
        "n_drift": len(drift),
        "tunnel_rtt_ms": round(_RTT_S * 1000, 1) if _RTT_S else None,
        "artifacts": ["BENCH_EXTRAS.json", "BENCH_TABLE.md",
                      "BENCH_HISTORY.jsonl"],
    }))


if __name__ == "__main__":
    main()
