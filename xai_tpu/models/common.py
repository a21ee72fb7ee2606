"""The functional model interface every attribution method and metric builds on.

The reference exposes white-box access through hook-instrumented model forks
(``util/modified_models/*``, ``VIT_LRP/ViT_new_timm.py:193-312``).  The
TPU-native equivalent is a *tap API*: the Flax ``apply`` returns
``(logits, taps)`` where ``taps`` is a pytree of intermediate activations.
Gradients w.r.t. inputs or taps come from ``jax.vjp`` / probe injection —
no mutable hook state, everything jit-compatible.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=True)
class ModelMeta:
    """Static metadata describing a model family member."""

    name: str                       # registry name, e.g. "R101", "VIT16"
    family: str                     # "cnn" | "vit" | "clip"
    img_hw: int = 224
    num_classes: int = 1000
    num_patches: int = 0            # per side: 14 for ViT-B/16, 7 for /32
    batch_size: int = 50            # reference's per-model chunk size
    mean: tuple = (0.485, 0.456, 0.406)
    std: tuple = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """A model as pure functions + params.

    ``apply`` maps ``(params, x_nhwc) -> logits`` and must be jit-safe.
    ``apply_taps`` maps ``(params, x_nhwc) -> (logits, taps)`` where ``taps``
    is a dict of stacked intermediates (family-specific; see vit.py/resnet.py).
    """

    meta: ModelMeta
    params: Any
    apply: Callable[[Any, jnp.ndarray], jnp.ndarray]
    apply_taps: Optional[Callable[[Any, jnp.ndarray], tuple]] = None
    # ViT only: (params, x, probes) -> (logits, taps); probes are zeros added
    # to each block's post-softmax attention so grad-wrt-probe == grad-wrt-attn
    # (replaces the reference's register_hook attention-gradient capture,
    # ViT_new_timm.py:239-240).
    apply_probed: Optional[Callable[[Any, jnp.ndarray, Any], tuple]] = None
    # ViT only: (params, x, token_indices) -> logits with only CLS+selected
    # patch tokens (TIS token dropping)
    apply_tokens: Optional[Callable] = None
    extras: Any = None              # family-specific (e.g. CLIP text tower)

    # --- jitted conveniences (cached per bundle instance) ---

    @functools.cached_property
    def logits_fn(self):
        return jax.jit(lambda p, x: self.apply(p, x))

    @functools.cached_property
    def probs_fn(self):
        return jax.jit(lambda p, x: jax.nn.softmax(self.apply(p, x), axis=-1))

    @functools.cached_property
    def score_and_grad_fn(self):
        """Batched d logit[target]/d input — the reference's
        ``getGradientsParallel`` (saliencyMethods.py:209-215)."""

        def g(p, x, target):
            # one batched forward + one batched VJP: each score depends only
            # on its own image, so grad of the sum is the per-sample gradient
            def total(xb):
                logits = self.apply(p, xb)
                scores = logits[:, target]
                return scores.sum(), scores

            (_, scores), grads = jax.value_and_grad(total, has_aux=True)(x)
            return grads, scores

        return jax.jit(g)

    def logits(self, x):
        return self.logits_fn(self.params, x)

    def probs(self, x):
        return self.probs_fn(self.params, x)

    def predict(self, x):
        """(class, softmax prob) of the top-1 class for a single image
        [1,H,W,3] — the reference's ``get_classifier_pred``
        (evaluatePerturbation.py:76-80)."""
        pr = self.probs(x)[0]
        cls = int(jnp.argmax(pr))
        return cls, float(pr[cls])


def jit_bundle(**kw) -> ModelBundle:
    """Construct a ModelBundle with every apply function jit-wrapped.

    Bare ``bundle.apply(params, x)`` calls are scattered through runners and
    host-side greedy loops (target selection, MDA subsearch scoring, ...);
    without this they execute op-by-op eagerly — ~650 ms per ResNet-50
    forward on the axon tunnel vs ~5 ms compiled.  jax.jit caches per
    (function, shapes), and each bundle's closures are created once, so the
    wrapper compiles once per input shape and is free afterwards.
    """
    for k in ("apply", "apply_taps", "apply_probed", "apply_tokens"):
        if kw.get(k) is not None:
            kw[k] = jax.jit(kw[k])
    return ModelBundle(**kw)


def init_on_cpu(init_fn):
    """Run a flax init on CPU (fast host compile) then transfer the params
    to the default device — CPU-committed params would otherwise pin every
    downstream jit to the host backend."""
    import jax

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_fn()
    # local_devices, NOT devices: under jax.distributed, devices()[0] is
    # process 0's device — non-addressable from other processes
    return jax.device_put(params, jax.local_devices()[0])
