"""Guided Backprop / Grad-CAM / Guided Grad-CAM — captum-equivalents, native.

The reference gets these from captum 0.7 on the non-inplace-ReLU model fork
(evaluatePerturbation.py:147-163; util/modified_models/resnet.py:139,199).
Here the guided ReLU rule is a ``jax.custom_vjp`` — the entire 23k-LoC
"modified models" layer reduces to one function — and layer gradients come
from activation probes (models/resnet.py ``probes`` arg).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear, resize_nearest_exact


@jax.custom_vjp
def guided_relu(x):
    return jax.nn.relu(x)


def _guided_fwd(x):
    return jax.nn.relu(x), x


def _guided_bwd(x, g):
    # guided rule: pass only positive grads through positive activations
    return (g * (g > 0) * (x > 0),)


guided_relu.defvjp(_guided_fwd, _guided_bwd)


def _guided_apply(bundle):
    """bundle's model rebuilt with the guided ReLU (flax Module.clone).
    Cached per model: a fresh closure per call would be a new static jit
    argument to _input_grad and retrace the backward on every image."""
    return _guided_apply_cached(bundle.extras["model"])


@functools.lru_cache(maxsize=64)
def _guided_apply_cached(model):
    gm = model.clone(relu=guided_relu)

    def apply(p, x):
        return gm.apply({"params": p}, x)

    return apply


@functools.partial(jax.jit, static_argnums=(0,))
def _input_grad(apply_fn, params, x, target):
    def score(xi):
        return apply_fn(params, xi[None])[0, target]
    return jax.grad(score)(x)


def guided_backprop(bundle, x, target) -> jnp.ndarray:
    """captum GuidedBackprop (evaluatePerturbation.py:154-158)."""
    return _input_grad(_guided_apply(bundle), bundle.params, jnp.asarray(x),
                       target)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _layer_gradcam(apply_probed, params, x, target, layer: str,
                   relu_attributions: bool = True):
    """captum LayerGradCam: weights = spatial mean of layer grads; cam =
    relu(sum_k w_k A_k)."""
    def score(probe):
        logits, taps = apply_probed(params, x[None], {layer: probe})
        return logits[0, target], taps[layer]

    # probe shape == activation shape: run once to get it
    _, taps0 = apply_probed(params, x[None], None)
    probe0 = jnp.zeros_like(taps0[layer])
    grads, act = jax.grad(score, has_aux=True)(probe0)
    w = grads.mean(axis=(1, 2), keepdims=True)        # [1,1,1,K]
    cam = (w * act).sum(axis=-1)[0]                   # [h, w]
    if relu_attributions:
        cam = jax.nn.relu(cam)
    return cam


def grad_cam(bundle, x, target, layer: str = "layer4",
             img_hw: int = 224) -> jnp.ndarray:
    """The driver's "gc": LayerGradCam on layer4, bilinear-resized to the
    input size and broadcast over 3 channels (evaluatePerturbation.py:147-153).
    Returns [H, W, 3]."""
    cam = _layer_gradcam(bundle.apply_probed, bundle.params, jnp.asarray(x),
                         target, layer)
    up = resize_bilinear(cam, (img_hw, img_hw))
    return jnp.broadcast_to(up[..., None], (img_hw, img_hw, 3))


def guided_grad_cam(bundle, x, target, layer: str = "layer4",
                    img_hw: int = 224) -> jnp.ndarray:
    """captum GuidedGradCam: GBP x nearest-upsampled positive CAM
    (evaluatePerturbation.py:159-163)."""
    x = jnp.asarray(x)
    cam = _layer_gradcam(bundle.apply_probed, bundle.params, x, target, layer)
    up = resize_nearest_exact(cam, (img_hw, img_hw))
    gbp = guided_backprop(bundle, x, target)
    return gbp * up[..., None]
