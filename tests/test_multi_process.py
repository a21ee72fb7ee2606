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

# ---------------------------------------------------------------------------
# End-to-end distributed sweep (VERDICT r3 #7): the REAL drivers under a
# real 2-process jax.distributed cluster — manifest job striping (sweep.py)
# plus --shard_images image striping with allreduce of the actual battery
# score sums — must produce CSVs identical to a 1-process run.
# ---------------------------------------------------------------------------

E2E_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from xai_tpu.parallel import multi_host

pid = int(sys.argv[1]); port = sys.argv[2]; base = sys.argv[3]
multi_host.initialize(coordinator_address=f"127.0.0.1:{port}",
                      num_processes=2, process_id=pid)

# (a) sweep-runner job striping into a SHARED output dir + manifest
from xai_tpu.runners.sweep import build_parser as sweep_parser, run_sweep
sweep_dir = os.path.join(base, "sweep_shared")
run_sweep(sweep_parser().parse_args([
    "--drivers", "pert", "--models", "TINY_CNN", "--methods", "grad,ig",
    "--image_count", "2", "--synthetic", "2", "--output_dir", sweep_dir]))

# (b) flagship driver with image striping + score-sum allreduce
from xai_tpu.runners.evaluate_perturbation import (build_parser,
                                                   evaluate_perturbation)
out_dir = os.path.join(base, f"pert_p{pid}")
means = evaluate_perturbation(build_parser().parse_args([
    "--model", "TINY_CNN", "--attr_func", "grad", "--image_count", "5",
    "--synthetic", "5", "--shard_images", "--output_dir", out_dir]))

# (c) seg driver with image striping + EXACT int64-counter allgather
from xai_tpu.runners.evaluate_imagenet_seg import (
    build_parser as seg_parser, evaluate_imagenet_seg)
seg = evaluate_imagenet_seg(seg_parser().parse_args([
    "--model", "TINY_CNN", "--attr_func", "grad", "--image_count", "4",
    "--synthetic", "4", "--shard_images",
    "--output_dir", os.path.join(base, f"seg_p{pid}")]))

# (d) sanity driver with image striping + similarity-sum allreduce
from xai_tpu.runners.evaluate_sanity import (
    build_parser as san_parser, evaluate_sanity)
san = evaluate_sanity(san_parser().parse_args([
    "--model", "TINY_CNN", "--attr_func", "grad", "--image_count", "4",
    "--synthetic", "4", "--shard_images",
    "--output_dir", os.path.join(base, f"san_p{pid}")]))

# (e) research seg driver (imagenet_seg_eval: shap/calibrate knobs) with
# the same image striping + exact-counter allgather
from xai_tpu.runners.imagenet_seg_eval import (
    build_parser as ise_parser, run as ise_run)
ise = ise_run(ise_parser().parse_args([
    "--model", "TINY_CNN", "--method", "grad", "--image_count", "4",
    "--synthetic", "4", "--acc_cutoff", "0", "--shard_images",
    "--output_dir", os.path.join(base, f"ise_p{pid}")]))

print("RESULT " + json.dumps({"pid": pid, "means": means, "seg": seg,
                              "san": san, "ise": ise}), flush=True)
"""


def _read_csv(path):
    import csv
    with open(path) as f:
        return {r[0]: r[1] for r in csv.reader(f) if r}


def test_two_process_sweep_and_sharded_driver(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, "-c", E2E_WORKER, str(pid), str(port),
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=repo)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-3000:]
        line = [ln for ln in out.decode().splitlines()
                if ln.startswith("RESULT ")][0]
        outs.append(json.loads(line[len("RESULT "):]))

    # ---- 1-process ground truth (same code, no cluster) ----
    from xai_tpu.runners.sweep import build_parser as sweep_parser, run_sweep
    from xai_tpu.runners.evaluate_perturbation import (build_parser,
                                                       evaluate_perturbation)
    solo_sweep = str(tmp_path / "sweep_solo")
    run_sweep(sweep_parser().parse_args([
        "--drivers", "pert", "--models", "TINY_CNN", "--methods", "grad,ig",
        "--image_count", "2", "--synthetic", "2",
        "--output_dir", solo_sweep]))
    solo_pert = str(tmp_path / "pert_solo")
    solo_means = evaluate_perturbation(build_parser().parse_args([
        "--model", "TINY_CNN", "--attr_func", "grad", "--image_count", "5",
        "--synthetic", "5", "--output_dir", solo_pert]))

    # (a) striped sweep: the SHARED manifest has both jobs ok, split 1/1
    # across processes, and each per-job CSV equals the solo sweep's
    manifest = [json.loads(l) for l in open(
        tmp_path / "sweep_shared" / "sweep_manifest.jsonl")]
    ok = {(r["model"], r["attr_func"]) for r in manifest
          if r["status"] == "ok"}
    assert ok == {("TINY_CNN", "grad"), ("TINY_CNN", "ig")}
    for attr in ("grad", "ig"):
        got = _read_csv(os.path.join(
            str(tmp_path / "sweep_shared"), "TINY_CNN",
            f"{attr}_2_images.csv"))
        want = _read_csv(os.path.join(solo_sweep, "TINY_CNN",
                                      f"{attr}_2_images.csv"))
        for k in want:
            if k in ("Attr Avg Runtime", "Total Runtime"):
                continue
            # f32 battery scores: a live 2-process cluster changes the CPU
            # backend's device topology, so in-jit reduction order (and hence
            # the last few ulps) can differ from the solo run.  Wiring bugs
            # (wrong stripe, wrong normalization) would be off by O(0.1).
            assert abs(float(got[k]) - float(want[k])) < 1e-4, (attr, k)

    # (b) sharded driver: process 0's CSV equals the solo run's — the
    # allreduce made the partial sums global before the write.  Only
    # process 0 writes (a shared output_dir would otherwise see concurrent
    # open('w') on one path); process 1 must NOT have produced a CSV.
    want = _read_csv(os.path.join(solo_pert, "TINY_CNN",
                                  "grad_5_images.csv"))
    got = _read_csv(os.path.join(str(tmp_path / "pert_p0"),
                                 "TINY_CNN", "grad_5_images.csv"))
    for k in want:
        if k in ("Attr Avg Runtime", "Total Runtime"):
            continue
        assert abs(float(got[k]) - float(want[k])) < 1e-4, k
    assert not os.path.exists(os.path.join(
        str(tmp_path / "pert_p1"), "TINY_CNN", "grad_5_images.csv"))
    # but BOTH processes' returned means agree with the solo means — the
    # in-memory result is global everywhere even though only p0 writes
    for k, v in solo_means.items():
        assert abs(outs[0]["means"][k] - v) < 1e-4, k
        assert abs(outs[1]["means"][k] - v) < 1e-4, k

    # (c) sharded seg driver: p0's TXT equals the solo run's (VERDICT r4
    # #7); the int64 counters crossed processes exactly, so only the
    # AP/F1 float-mean order can wiggle the last ulp
    from xai_tpu.runners.evaluate_imagenet_seg import (
        build_parser as seg_parser, evaluate_imagenet_seg)
    solo_seg = evaluate_imagenet_seg(seg_parser().parse_args([
        "--model", "TINY_CNN", "--attr_func", "grad", "--image_count", "4",
        "--synthetic", "4",
        "--output_dir", str(tmp_path / "seg_solo")]))

    def _read_txt(path):
        import re
        with open(path) as f:
            return [float(m) for m in re.findall(r"[-\d.]+(?=%?\n)",
                                                 f.read())]

    got_txt = _read_txt(os.path.join(str(tmp_path / "seg_p0"), "TINY_CNN",
                                     "grad_4_images"))
    want_txt = _read_txt(os.path.join(str(tmp_path / "seg_solo"),
                                      "TINY_CNN", "grad_4_images"))
    assert len(got_txt) == len(want_txt) == 4
    for g, w in zip(got_txt, want_txt):
        assert abs(g - w) < 1e-3, (got_txt, want_txt)
    assert not os.path.exists(os.path.join(
        str(tmp_path / "seg_p1"), "TINY_CNN", "grad_4_images"))
    for k, v in solo_seg.items():
        assert abs(outs[0]["seg"][k] - v) < 1e-4, k
        assert abs(outs[1]["seg"][k] - v) < 1e-4, k

    # (d) sharded sanity driver: p0's CSV equals the solo run's
    from xai_tpu.runners.evaluate_sanity import (
        build_parser as san_parser, evaluate_sanity)
    solo_san = evaluate_sanity(san_parser().parse_args([
        "--model", "TINY_CNN", "--attr_func", "grad", "--image_count", "4",
        "--synthetic", "4",
        "--output_dir", str(tmp_path / "san_solo")]))
    got = _read_csv(os.path.join(str(tmp_path / "san_p0"), "TINY_CNN",
                                 "grad_4_images.csv"))
    want = _read_csv(os.path.join(str(tmp_path / "san_solo"), "TINY_CNN",
                                  "grad_4_images.csv"))
    for k in want:
        if k == "Total Runtime":
            continue
        assert abs(float(got[k]) - float(want[k])) < 1e-4, k
    assert not os.path.exists(os.path.join(
        str(tmp_path / "san_p1"), "TINY_CNN", "grad_4_images.csv"))
    for k, v in solo_san.items():
        assert abs(outs[0]["san"][k] - v) < 1e-4, k
        assert abs(outs[1]["san"][k] - v) < 1e-4, k

    # (e) sharded research seg driver: p0's TXT equals the solo run's,
    # p1 does not write, returned dicts are global on both processes
    from xai_tpu.runners.imagenet_seg_eval import (
        build_parser as ise_parser, run as ise_run)
    solo_ise = ise_run(ise_parser().parse_args([
        "--model", "TINY_CNN", "--method", "grad", "--image_count", "4",
        "--synthetic", "4", "--acc_cutoff", "0",
        "--output_dir", str(tmp_path / "ise_solo")]))
    got_txt = _read_txt(os.path.join(str(tmp_path / "ise_p0"),
                                     "TINY_CNN_grad.txt"))
    want_txt = _read_txt(os.path.join(str(tmp_path / "ise_solo"),
                                      "TINY_CNN_grad.txt"))
    assert len(got_txt) == len(want_txt) == 4
    for g, w in zip(got_txt, want_txt):
        assert abs(g - w) < 1e-3, (got_txt, want_txt)
    assert not os.path.exists(os.path.join(str(tmp_path / "ise_p1"),
                                           "TINY_CNN_grad.txt"))
    for k, v in solo_ise.items():
        assert abs(outs[0]["ise"][k] - v) < 1e-4, k
        assert abs(outs[1]["ise"][k] - v) < 1e-4, k
