import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""SURVEY §2.9 / VERDICT r2 #8 evidence: does XLA already fuse the hot
non-matmul ops the Pallas-kernel list named (reveal-select, CAM bilinear
resize, MAS segment-sum), or do they run as standalone HBM round-trips?

AOT-compiles the production jits for the ambient TPU target and greps the
OPTIMIZED HLO: an op that appears only inside `fused_computation` bodies
(or fused into a convolution/dot input) costs no extra memory pass; a
top-level instruction is an unfused kernel.

Run on the chip host: python tools/fusion_evidence.py
"""
import re

import jax
import jax.numpy as jnp
import numpy as np


def analyze(tag, hlo, ops):
    """For each op kind: count occurrences at fusion-body level vs
    ENTRY-computation top level."""
    print(f"\n== {tag} ==")
    # split computations: lines like "%fused_computation.N { ... }" vs ENTRY
    entry = re.search(r"ENTRY [^{]+\{(.*?)\n\}", hlo, re.S)
    entry_body = entry.group(1) if entry else ""
    for op in ops:
        total = len(re.findall(rf"\b{op}\(", hlo))
        at_entry = len(re.findall(rf"\b{op}\(", entry_body))
        fused = total - at_entry
        print(f"  {op:14s} total={total:4d}  in-fusions={fused:4d}  "
              f"entry-level={at_entry:3d}")
    n_fusions = len(re.findall(r"%fused_computation", hlo))
    print(f"  fusion computations: {n_fusions}")


def battery_evidence():
    from xai_tpu.metrics.curves import _battery_device
    from xai_tpu.models import resnet
    from xai_tpu.ops.blur import make_blur_fn

    bundle = resnet.make_bundle("resnet50")
    blur = make_blur_fn()
    x = jax.ShapeDtypeStruct((224, 224, 3), jnp.float32)
    flips = jax.ShapeDtypeStruct((224 * 224,), jnp.int32)
    lowered = _battery_device.lower(bundle.apply, blur, bundle.params,
                                    x, flips, flips, 224, 45, 1)
    hlo = lowered.compile().as_text()
    # select = the reveal where(flip<=s, finish, start); compare feeds it
    analyze("battery (3 reveal passes + blur + target)", hlo,
            ["select", "compare", "convolution", "reduce", "transpose"])
    return hlo


def gradcam_evidence():
    from xai_tpu.methods.guided import _layer_gradcam
    from xai_tpu.models import resnet

    bundle = resnet.make_bundle("resnet50")
    x = jax.ShapeDtypeStruct((224, 224, 3), jnp.float32)
    lowered = _layer_gradcam.lower(bundle.apply_probed, bundle.params, x,
                                   1, "layer4", True)
    hlo = lowered.compile().as_text()
    analyze("grad-cam (probe backward + weighting)", hlo,
            ["select", "convolution", "reduce"])
    return hlo


def main():
    b = battery_evidence()
    g = gradcam_evidence()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fusion_evidence.txt")
    # keep only the summary in the repo; full HLO is huge
    print(f"\n(battery HLO {len(b)} chars, gradcam HLO {len(g)} chars)")


if __name__ == "__main__":
    main()
