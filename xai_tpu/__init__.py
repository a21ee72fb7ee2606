"""xai_tpu — a TPU-native (JAX/XLA/Pallas/pjit) attribution-and-metrics framework.

Re-implements the full capability surface of the reference PyTorch benchmark
harness (chasewalker26/Image-Classification-XAI) with a TPU-first design:

- one functional core: ``logits, taps = model.apply(params, x)`` plus
  ``jax.vjp`` for gradients — no hook-instrumented model forks;
- every attribution method is a pure function
  ``attribute(bundle, x, target, key, cfg) -> (H, W) map``;
- every metric is a pure function over ``(bundle, x, saliency) -> curve``;
- all perturbation axes (IG steps, RISE masks, insertion/deletion reveal
  steps) are array axes under ``vmap``/``lax.map`` — never host loops;
- multi-chip scaling via ``jax.sharding.Mesh`` + collectives over ICI.

Layout (mirrors the reference's capability inventory, SURVEY.md §2):

- ``models``   — Flax ResNet/ResNeXt/VGG/ViT/CLIP with an intermediate-tap API
- ``convert``  — torch state-dict -> Flax pytree weight converters
- ``methods``  — the ~36 attribution methods
- ``metrics``  — faithfulness / sanity / localization metric battery
- ``ops``      — preprocessing, blur, resize, segments, statistics
- ``kernels``  — Pallas TPU kernels for the hot fused ops
- ``native``   — C++ host helpers (QP projection, superpixels)
- ``data``     — ImageNet val bookkeeping, class maps, segmentation sets
- ``runners``  — CLI drivers with the reference's exact flags
- ``parallel`` — device-mesh setup and sharded sweep execution
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# persistent compilation cache: successive runner invocations (the 217-run
# sweep pattern) skip recompilation entirely
_cache_dir = _os.environ.get("XAI_TPU_CACHE",
                             _os.path.expanduser("~/.cache/xai_tpu_xla"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax
    pass
