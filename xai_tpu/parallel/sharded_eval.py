"""Sharded evaluation / calibration steps over a device mesh.

The framework's unit of large-scale work (the reference's 217-run × 1000-image
sweep, allPertTests.txt) maps to: images sharded over the ``data`` axis,
model params optionally tensor-parallel over ``model``, metric accumulators
combined by mean (XLA inserts the psum from output shardings).

``make_sharded_train_step`` is the training-shaped workload in this framework:
MAS-calibration (MASCalibrate.py:1315-1419 — Adam-optimize a small
attribution-refinement parameter against a differentiable insertion/deletion
score).  It is what the multi-chip dryrun compiles: attribution (vmapped IG)
+ soft insertion/deletion curves + psum-mean loss + optax update, all under
one jit over the mesh.

Parallelism coverage vs the required checklist (SURVEY §2.14): DP = image
axis; TP = ViT qkv/MLP sharding (mesh.vit_param_spec); the perturbation axis
(this workload's analog of sequence parallelism) folds into the data axis;
PP/EP have no counterpart in this workload (max 197 tokens, no MoE) and are
documented out of scope.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


def _ig_attr(apply_fn, params, x, target, steps: int):
    """Vectorized IG for one image (alphas folded into batch)."""
    alphas = jnp.linspace(0.0, 1.0, steps).reshape(steps, 1, 1, 1)
    imgs = alphas * x[None]

    def score_sum(xb):
        return apply_fn(params, xb)[:, target].sum()

    grads = jax.grad(score_sum)(imgs)
    return grads.mean(axis=0) * x


def _soft_curves(apply_fn, params, x, attr, target, n_thresh: int,
                 tau: float = 10.0):
    """Differentiable insertion/deletion proxy: soft pixel masks from
    attribution quantile thresholds (the MASCalibrate relaxation)."""
    sal = jnp.abs(attr.sum(-1))
    sal = (sal - sal.min()) / (sal.max() - sal.min() + 1e-8)
    qs = jnp.linspace(0.05, 0.95, n_thresh)

    def probe(q):
        m = jax.nn.sigmoid(tau * (sal - q))[..., None]
        ins = apply_fn(params, (x * m)[None])[0]
        dele = apply_fn(params, (x * (1 - m))[None])[0]
        return (jax.nn.softmax(ins)[target], jax.nn.softmax(dele)[target])

    ins, dele = jax.vmap(probe)(qs)
    return ins, dele


def sharded_eval_step(apply_fn, mesh, param_spec=None):
    """jit a batched (data-sharded) forward returning mean top-1 agreement
    and mean target prob — the sweep's psum-aggregated accumulators."""
    p_sharding = (jax.tree.map(lambda s: NamedSharding(mesh, s), param_spec)
                  if param_spec is not None else NamedSharding(mesh, P()))

    @functools.partial(
        jax.jit,
        in_shardings=(p_sharding, NamedSharding(mesh, P("data")),
                      NamedSharding(mesh, P("data"))),
        out_shardings=NamedSharding(mesh, P()),
    )
    def step(params, images, targets):
        logits = apply_fn(params, images)
        probs = jax.nn.softmax(logits, axis=-1)
        tp = jnp.take_along_axis(probs, targets[:, None], axis=1)[:, 0]
        acc = (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32)
        return {"mean_target_prob": tp.mean(), "accuracy": acc.mean()}

    return step


def make_sharded_train_step(apply_fn, mesh, param_spec=None,
                            ig_steps: int = 4, n_thresh: int = 4,
                            lr: float = 1e-2):
    """Full sharded MAS-calibration training step.

    Returns (step_fn, init_fn). step_fn(params, calib, opt_state, images,
    targets) -> (calib, opt_state, loss). images are data-sharded; params
    follow ``param_spec`` (tensor-parallel) or are replicated.
    """
    opt = optax.adam(lr)

    p_sharding = (jax.tree.map(lambda s: NamedSharding(mesh, s), param_spec)
                  if param_spec is not None else NamedSharding(mesh, P()))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def init_fn():
        calib = {"scale": jnp.ones(()), "bias": jnp.zeros(())}
        return calib, opt.init(calib)

    def loss_fn(calib, params, images, targets):
        def per_image(x, t):
            attr = _ig_attr(apply_fn, params, x, t, ig_steps)
            attr = attr * calib["scale"] + calib["bias"]
            ins, dele = _soft_curves(apply_fn, params, x, attr, t, n_thresh)
            return (1.0 - ins.mean()) + dele.mean()

        losses = jax.vmap(per_image)(images, targets)
        return losses.mean()

    @functools.partial(
        jax.jit,
        in_shardings=(p_sharding, repl, repl, data, data),
        out_shardings=(repl, repl, repl),
        donate_argnums=(2,),
    )
    def step(params, calib, opt_state, images, targets):
        loss, grads = jax.value_and_grad(loss_fn)(calib, params, images,
                                                  targets)
        updates, opt_state = opt.update(grads, opt_state)
        calib = optax.apply_updates(calib, updates)
        return calib, opt_state, loss

    return step, init_fn
