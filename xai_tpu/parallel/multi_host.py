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


_BARRIER_SEQ = [0]


def barrier(name: str = "xai_tpu_sync", timeout_s: float = 1800.0):
    """Coordination-service barrier (NOT a device collective).

    XLA's CPU-gloo (and ICI) collective-clique setup bootstraps through the
    distributed KV store with a HARD-CODED ~30 s deadline; a real sweep's
    processes arrive at their first collective with arbitrary skew (striped
    jobs compile different programs).  Parking the early processes here —
    the coordination service accepts an explicit long timeout — makes the
    subsequent clique setup effectively simultaneous.  All processes must
    call this the same number of times (they do: it is only invoked from
    the allreduce helpers, which every process reaches once per driver
    run); the sequence counter keeps barrier ids unique per call site."""
    import jax

    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    _BARRIER_SEQ[0] += 1
    client.wait_at_barrier(f"{name}_{_BARRIER_SEQ[0]}",
                           timeout_in_ms=int(timeout_s * 1000))


def allreduce_sums(scores: dict, extra: float = 0.0):
    """Sum per-host score-SUMS (plus one scalar, e.g. attribution seconds)
    across all hosts; every host returns the identical global sums.  The
    drivers' CSV writer divides by the shared kept-image count, so after
    this every host writes a byte-identical score table.

    All hosts must pass the same key set (run_battery always emits the
    same 10 keys; a host that scored zero images passes {} and is padded
    with zeros for the union gathered from a designated host)."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return dict(scores), float(extra)

    barrier("allreduce_sums")
    from jax.experimental import multihost_utils

    # agree on the key set: host 0's keys win; a host with extra/missing
    # keys would desynchronize the fixed-size gather below.  The buffer is
    # fixed-size so broadcast_one_to_all sees one shape on every host — a
    # payload over that size would silently become a different shape
    # (ljust does not truncate), so it is a hard error everywhere.
    payload = ",".join(sorted(scores)).encode()
    if len(payload) > 4096:
        raise ValueError(
            f"allreduce_sums key set is {len(payload)} bytes joined; the "
            f"fixed broadcast buffer holds 4096")
    keys = multihost_utils.broadcast_one_to_all(
        np.frombuffer(payload.ljust(4096), np.uint8))
    keys = bytes(np.asarray(keys)).decode().rstrip("\x00 ").split(",")
    keys = [k for k in keys if k]
    stray = set(scores) - set(keys)
    if stray:
        raise ValueError(
            f"host {jax.process_index()} has score keys absent on host 0 "
            f"(would be silently dropped from the global sums): "
            f"{sorted(stray)}")
    local = jnp.asarray([float(scores.get(k, 0.0)) for k in keys]
                        + [float(extra)])
    gathered = multihost_utils.process_allgather(local)
    total = np.asarray(gathered).reshape(jax.process_count(), -1).sum(0)
    return ({k: float(total[i]) for i, k in enumerate(keys)},
            float(total[-1]))


_GATHER_SEQ = [0]


def allgather_obj(obj, name: str = "xai_gather", timeout_s: float = 1800.0):
    """Exchange ONE picklable object per process through the coordination
    service KV store; every process returns the per-process list ordered by
    process index.

    EXACT — no device collective, no dtype cast: the seg driver's int64
    pixel/intersection counters and its variable-length per-image AP/F1
    lists cannot ride the fixed-shape f32 device gather used by
    :func:`allreduce_sums` (JAX's default x64-disabled mode would silently
    downcast int64, and the list lengths differ per process).  Payloads are
    tiny (hundreds of bytes of counters), so a KV-store string round-trip
    is the right tool.  Like :func:`barrier`, all processes must call this
    the same number of times — the sequence counter keys each exchange."""
    import base64
    import pickle

    import jax

    if jax.process_count() == 1:
        return [obj]
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        raise RuntimeError("allgather_obj requires jax.distributed")
    _GATHER_SEQ[0] += 1
    tag = f"{name}_{_GATHER_SEQ[0]}"
    me = jax.process_index()
    client.key_value_set(f"{tag}/{me}",
                         base64.b64encode(pickle.dumps(obj)).decode())
    out = []
    for p in range(jax.process_count()):
        raw = client.blocking_key_value_get(f"{tag}/{p}",
                                            timeout_in_ms=int(timeout_s
                                                              * 1000))
        out.append(pickle.loads(base64.b64decode(raw)))
    return out


def allreduce_scores(scores: dict, count: int):
    """Sum per-host (score-sums, image counts) across all hosts and return
    global means.  Uses a psum over the global device mesh."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return {k: v / max(count, 1) for k, v in scores.items()}

    barrier("allreduce_scores")
    keys = sorted(scores)
    local = jnp.asarray([scores[k] for k in keys] + [float(count)])
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local)
    total = np.asarray(gathered).reshape(jax.process_count(), -1).sum(0)
    n = total[-1]
    return {k: float(total[i] / max(n, 1)) for i, k in enumerate(keys)}
