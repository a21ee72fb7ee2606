"""Sweep runner: the all{Pert,Sanity,Seg}Tests.txt batch equivalents with a
resumable manifest (SURVEY §5 — per-run result streaming replaces the
reference's re-run-the-shell-line crash recovery) and optional multi-host
sharding (runs striped by jax.process_index()).
"""
from __future__ import annotations

import argparse
import json
import os
import time

# the reference's full paper sweep (allPertTests.txt:1-84 structure)
PERT_SWEEP = {
    "R101": ["grad", "inp_x_grad", "ig", "lig", "idg", "gig", "agi", "sg",
             "xrai", "gc", "gbp", "ggc", "gs", "lime", "fa", "occ"],
    "RNXT": ["grad", "inp_x_grad", "ig", "lig", "idg", "gig", "agi", "sg",
             "xrai", "gc", "gbp", "ggc", "gs", "lime", "fa", "occ"],
    "VIT16": ["attn", "grad", "n_rollout", "rollout", "t_attn", "bi_attn",
              "t_attr", "VIT_CX", "TIS", "InFlow", "MDA"],
    "VIT32": ["attn", "grad", "n_rollout", "rollout", "t_attn", "bi_attn",
              "t_attr", "VIT_CX", "TIS", "InFlow", "MDA"],
    "CLIP16": ["eclip", "eclip_wo", "game", "maskclip", "rollout",
               "selfattn", "surgery", "m2ib", "lrp"],
    "CLIP32": ["eclip", "eclip_wo", "game", "maskclip", "rollout",
               "selfattn", "surgery", "m2ib", "lrp"],
}


def run_sweep(args):
    import jax

    jobs = []
    models = args.models.split(",") if args.models else list(PERT_SWEEP)
    for model in models:
        if args.methods:
            attrs = args.methods.split(",")
        else:
            # CNN models not in the table reuse the R101 method list
            attrs = PERT_SWEEP.get(
                model, PERT_SWEEP["R101"] if model.startswith("R") else [])
        for attr in attrs:
            jobs.append((model, attr))

    # multi-host striping: each process takes every Nth job
    pidx = jax.process_index()
    pcount = jax.process_count()
    jobs = jobs[pidx::pcount]

    manifest_path = os.path.join(args.output_dir, "sweep_manifest.jsonl")
    os.makedirs(args.output_dir, exist_ok=True)
    done = set()
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("status") == "ok":
                    done.add((rec["model"], rec["attr_func"]))

    from .evaluate_perturbation import build_parser as pert_parser
    from .evaluate_perturbation import evaluate_perturbation

    for model, attr in jobs:
        if (model, attr) in done:
            print(f"skip {model}/{attr} (already in manifest)")
            continue
        print(f"=== {model} {attr} ===")
        t0 = time.time()
        sub = pert_parser().parse_args([
            "--model", model, "--attr_func", attr,
            "--image_count", str(args.image_count),
            "--dataset_path", args.dataset_path,
            "--synthetic", str(args.synthetic),
            "--output_dir", args.output_dir,
            "--class_maps_dir", args.class_maps_dir,
        ])
        try:
            scores = evaluate_perturbation(sub)
            rec = {"model": model, "attr_func": attr, "status": "ok",
                   "seconds": round(time.time() - t0, 2), "scores": scores}
        except Exception as e:  # stream failures, keep sweeping
            rec = {"model": model, "attr_func": attr, "status": "error",
                   "error": f"{type(e).__name__}: {e}"}
        with open(manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def build_parser():
    p = argparse.ArgumentParser("sweep")
    p.add_argument("--models", type=str, default="")
    p.add_argument("--methods", type=str, default="",
                   help="comma list overriding the per-model method table")
    p.add_argument("--image_count", type=int, default=1000)
    p.add_argument("--dataset_path", type=str, default="../../../ImageNet")
    p.add_argument("--class_maps_dir", type=str, default="")
    p.add_argument("--output_dir", type=str, default="pert_test_results")
    p.add_argument("--synthetic", type=int, default=0)
    return p


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    run_sweep(args)


if __name__ == "__main__":
    main()
