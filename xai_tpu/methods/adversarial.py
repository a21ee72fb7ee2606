"""PGD adversarial attack helper (MASTestFunctions.py:34-53): iterated FGSM
on cross-entropy with an epsilon ball around the original image, clamped to
[0, 1].  Used by the reference as a robustness utility alongside the metric
battery."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 5))
def pgd_attack(apply_fn, params, images, labels, eps: float = 0.3,
               iters: int = 10, alpha: float = 2 / 255):
    """images: [B, H, W, C] in [0, 1]; labels: [B] int. Returns adversarial
    images."""
    orig = images

    def ce(x):
        logits = apply_fn(params, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    def body(_, x):
        g = jax.grad(ce)(x)
        adv = x + alpha * jnp.sign(g)
        eta = jnp.clip(adv - orig, -eps, eps)
        return jnp.clip(orig + eta, 0.0, 1.0)

    return jax.lax.fori_loop(0, iters, body, images)
