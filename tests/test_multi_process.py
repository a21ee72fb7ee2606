"""Exercise parallel/multi_host.py with TWO real processes.

The reference's cluster story is shell fan-out with --cuda_num pinning
(SURVEY §2.14); ours is jax.distributed + process-striped work lists +
allgather-mean.  This spawns two python processes that initialize a real
jax.distributed cluster (CPU backend, localhost coordinator), stripe a
6-image work list, and combine per-host score sums — asserting both
processes report the same global means and that they equal the
sequentially-computed truth.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from xai_tpu.parallel import multi_host

pid = int(sys.argv[1]); port = sys.argv[2]
multi_host.initialize(coordinator_address=f"127.0.0.1:{port}",
                      num_processes=2, process_id=pid)
items = list(range(6))
mine = multi_host.my_shard(items)
# fake per-image scores: deterministic functions of the image index
sums = {"MAS_ins": sum(0.1 * i for i in mine),
        "MAS_del": sum(0.05 * i + 1.0 for i in mine)}
out = multi_host.allreduce_scores(sums, len(mine))
print("RESULT " + json.dumps({"pid": pid, "shard": mine, "means": out}),
      flush=True)
"""


def test_two_process_allreduce():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
        line = [ln for ln in out.decode().splitlines()
                if ln.startswith("RESULT ")][0]
        outs.append(json.loads(line[len("RESULT "):]))

    # shards stripe the list disjointly and cover it
    all_items = sorted(outs[0]["shard"] + outs[1]["shard"])
    assert all_items == list(range(6))
    # both processes agree on the global means
    assert outs[0]["means"] == outs[1]["means"]
    # and they equal the sequential truth
    want_ins = sum(0.1 * i for i in range(6)) / 6
    want_del = sum(0.05 * i + 1.0 for i in range(6)) / 6
    got = outs[0]["means"]
    assert abs(got["MAS_ins"] - want_ins) < 1e-6
    assert abs(got["MAS_del"] - want_del) < 1e-6
