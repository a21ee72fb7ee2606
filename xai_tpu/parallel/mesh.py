"""Device-mesh setup and sharding helpers.

The reference's only real parallelism is process-per-GPU shell fan-out plus
host-chunked "batch of perturbations" loops (SURVEY §2.14).  The TPU-native
treatment: one ``jax.sharding.Mesh`` with a ``data`` axis for images /
perturbation batches and a ``model`` axis for tensor-parallel params; metric
accumulators combine with ``psum`` over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_axis: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"make_mesh: asked for {n} devices but the "
            f"{devs[0].platform!r} backend exposes only {len(devs)}. "
            "For a virtual multi-device mesh on one host, configure "
            "jax.config.update('jax_platforms', 'cpu') and "
            "jax.config.update('jax_num_cpu_devices', n) before first "
            "backend use (see __graft_entry__._ensure_virtual_cpu_mesh).")
    if n % model_axis != 0:
        raise ValueError(
            f"make_mesh: n_devices={n} not divisible by model_axis={model_axis}")
    arr = np.array(devs[:n]).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, x):
    """Shard leading (batch) axis over the data axis."""
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def vit_param_spec(params) -> dict:
    """Tensor-parallel PartitionSpecs for a ViT params pytree: shard the MLP
    hidden dim and the qkv/proj head dim over 'model'; everything else
    replicated. Mirrors the megatron-style column/row split so the pair
    (fc1 col-split, fc2 row-split) needs a single psum per block — XLA
    inserts it from the shardings."""
    def spec_for(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if "mlp_fc1" in name and name.endswith("kernel"):
            return P(None, "model")
        if "mlp_fc1" in name and name.endswith("bias"):
            return P("model")
        if "mlp_fc2" in name and name.endswith("kernel"):
            return P("model", None)
        if "qkv" in name and name.endswith("kernel"):
            return P(None, "model")
        if "qkv" in name and name.endswith("bias"):
            return P("model")
        if "attn/proj" in name and name.endswith("kernel"):
            return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)
