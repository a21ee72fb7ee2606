"""Multi-host sweep support (SURVEY §2.14/§5): the TPU-native replacement
for the reference's GNU-parallel-style shell fan-out with --cuda_num pinning.

Pattern: every host calls :func:`initialize` once, shards its image list by
``jax.process_index()`` (deterministic per-image PRNG keys make sharding
result-invariant), runs its slice with the normal drivers, and combines the
metric accumulators with :func:`allreduce_scores` (a psum over a trivial
1-device-per-host mesh entry; crosses DCN between slices, ICI within).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize passthrough; a no-op for single-process
    runs so drivers can call it unconditionally."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def my_shard(items: list) -> list:
    """Stripe a work list over processes (images, sweep jobs, ...)."""
    import jax

    return list(items)[jax.process_index()::jax.process_count()]


def allreduce_scores(scores: dict, count: int):
    """Sum per-host (score-sums, image counts) across all hosts and return
    global means.  Uses a psum over the global device mesh."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return {k: v / max(count, 1) for k, v in scores.items()}

    keys = sorted(scores)
    local = jnp.asarray([scores[k] for k in keys] + [float(count)])
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local)
    total = np.asarray(gathered).reshape(jax.process_count(), -1).sum(0)
    n = total[-1]
    return {k: float(total[i] / max(n, 1)) for i, k in enumerate(keys)}
