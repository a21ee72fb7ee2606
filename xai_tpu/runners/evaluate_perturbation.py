"""Flagship driver: attribution -> 10-metric perturbation battery -> CSV.

Same CLI flags and output layout as the reference's
XAI_Survey/evaluations/evaluatePerturbation.py; `--cuda_num` is accepted and
ignored (device selection is JAX's), and `--synthetic N` substitutes a
deterministic random image stream when no ImageNet directory is available.

Per-image flow (reference :520-599): sorted val stream -> correctly-
classified filter -> sanity gates (blur/black predictions) -> class-balance
quota -> attribution via the registry -> run_battery (3 fused device curve
passes instead of 8 metric loops) -> accumulate -> CSV.
"""
from __future__ import annotations

import argparse
import os
import time


import jax
import jax.numpy as jnp
import numpy as np
from jax.numpy import bfloat16 as jnp_bf16

from ..data import ImageNetValStream, load_correct_mask
from ..metrics import run_battery
from ..registry import AttrContext, get_attribution
from .common import (build_bundle, clip_extras, default_blur, image_gates,
                     MODEL_TABLE,
                     normalize_input, write_result_csv)


def _batch_attribute(bundle, family, pend, args, maps_writer=None):
    """Attribute a full pending batch with ONE fused dispatch when the
    method has a batched implementation (methods/batch.py — the ig_batch
    pattern generalized); falls back to the per-image registry path
    otherwise.  Returns ([B, H, W] saliencies, seconds)."""
    from ..methods.batch import batch_attribution

    t = time.time()
    xs = np.stack([p["x"] for p in pend])
    trans = np.stack([p["trans_img"] for p in pend])
    targets = np.array([p["target"] for p in pend])
    keys = np.stack([np.asarray(p["key"]) for p in pend])
    extras = None
    if family == "clip":
        extras = {
            "txt_emb": np.stack([p["extras"]["txt_emb"][0] for p in pend]),
        }
        if "text_tokens" in pend[0]["extras"]:
            extras["text_tokens"] = np.stack(
                [p["extras"]["text_tokens"][0] for p in pend])
    dtype = {"bf16": jnp_bf16, "f32": None}[args.attr_dtype]
    sals = batch_attribution(family, args.attr_func, bundle, xs, trans,
                             targets, keys, extras=extras,
                             img_hw=bundle.meta.img_hw, dtype=dtype)
    if sals is None:        # no batched impl: per-image fused path
        sals = np.stack([
            get_attribution(family, args.attr_func, AttrContext(
                bundle=bundle, x=jnp.asarray(p["x"]),
                trans_img=p["trans_img"], target=p["target"], key=p["key"],
                img_hw=bundle.meta.img_hw, extras=p["extras"],
                dtype=dtype))
            for p in pend])
    dt = time.time() - t
    if maps_writer is not None:
        for p, s in zip(pend, sals):
            maps_writer(p, s)
    return sals, dt


def _flush_batch(bundle, family, pend, blur, result, args, maps_writer=None):
    """Batched attribution + batched curve engine for a full image batch
    (one fused attribution dispatch; battery shards over the mesh when
    more devices are present).  Returns attribution seconds."""
    from ..parallel.mesh import make_mesh
    from ..parallel.sharded_battery import sharded_battery_scores

    sals, attr_dt = _batch_attribute(bundle, family, pend, args, maps_writer)
    mesh = make_mesh(model_axis=1)    # all devices; battery pads-and-masks
    imgs = np.stack([p["x"] for p in pend])
    targets = np.array([p["target"] for p in pend])
    all_scores = sharded_battery_scores(bundle, mesh, imgs, sals, blur,
                                        chunk=45, targets=targets)
    for p, scores in zip(pend, all_scores):
        for k, v in scores.items():
            result[k] = result.get(k, 0.0) + v
        if args.verbose:
            print(f"[batch] {p['name']} MAS_ins={scores['MAS_ins']:.4f}")
    pend.clear()
    return attr_dt


def evaluate_perturbation(args) -> dict:
    family, batch = MODEL_TABLE[args.model]
    bundle = build_bundle(args.model, args.params_path)
    blur = default_blur()

    correct = load_correct_mask(args.class_maps_dir, args.model) \
        if args.class_maps_dir else None

    num_classes = 1000
    images_per_class = int(np.ceil(args.image_count / num_classes))
    classes_used = [0] * num_classes

    stream = ImageNetValStream(args.dataset_path,
                               img_hw=bundle.meta.img_hw,
                               synthetic=args.synthetic)
    # plain-dict accumulation: the reference's `Counter +=` silently drops
    # keys whose running sum is <= 0 (collections.Counter semantics); we keep
    # every metric column
    result = {}
    images_used = 0
    attr_time = 0.0
    maps_store = None
    batch_buf = []
    t0 = time.time()
    attr_dtype = {"bf16": jnp_bf16, "f32": None}[args.attr_dtype]
    gating = not (args.synthetic or args.skip_gates)
    base_key = jax.random.PRNGKey(args.seed)

    # --shard_images under jax.distributed: every process walks the FULL
    # stream and evaluates the correct-mask, gates and class quota
    # identically (3 cheap forwards/image vs ~700 for the battery — the
    # duplication is noise), so the kept list is equal by construction;
    # the expensive attribution + battery then run only for this process's
    # stripe, and the score sums are allreduced before the CSV so every
    # process writes the same table (SURVEY §2.14 distributed story).
    shard = bool(getattr(args, "shard_images", False)) \
        and jax.process_count() > 1
    pidx, pcount = jax.process_index(), jax.process_count()
    kept_rank = 0

    for item in stream:
        if images_used == args.image_count:
            break
        if correct is not None and correct[item.index] == 0:
            continue
        x = normalize_input(item.trans_img, family)
        target, original_pred, ok = image_gates(bundle, x, blur,
                                                gates=gating)
        if not ok and gating:
            continue
        if classes_used[target] == images_per_class:
            continue
        classes_used[target] += 1
        mine = (not shard) or (kept_rank % pcount == pidx)
        kept_rank += 1
        if not mine:
            # counts toward the shared denominator + the loop's break
            images_used += 1
            continue

        key = jax.random.fold_in(base_key, item.index)
        # CLIP: target prompt embedding + real BPE token ids for the probed
        # methods (evaluatePerturbation.py:388, 698-704)
        extras = clip_extras(bundle, target) if family == "clip" else None

        def write_map(saliency, name=item.name, target=target,
                      original_pred=original_pred):
            nonlocal maps_store
            if not args.save_maps:
                return
            if maps_store is None:
                from ..data.voc import ExplanationsHDF5
                os.makedirs(args.output_dir, exist_ok=True)
                maps_store = ExplanationsHDF5(
                    os.path.join(args.output_dir,
                                 f"{args.model}_{args.attr_func}_maps.h5"),
                    mode="w")
            maps_store.write(name, saliency, target=target,
                             original_pred=original_pred)

        if args.image_batch > 1:
            # batched production path: attribution AND battery both run one
            # fused dispatch per --image_batch images
            batch_buf.append({"x": np.asarray(x),
                              "trans_img": np.asarray(item.trans_img),
                              "name": item.name, "target": target,
                              "key": key, "extras": extras,
                              "write_map": write_map})
            images_used += 1
            if len(batch_buf) == args.image_batch:
                attr_time += _flush_batch(
                    bundle, family, batch_buf, blur, result, args,
                    maps_writer=lambda p, s: p["write_map"](s))
            continue

        ctx = AttrContext(bundle=bundle, x=x, trans_img=item.trans_img,
                          target=target, key=key, img_hw=bundle.meta.img_hw,
                          extras=extras, dtype=attr_dtype)
        t = time.time()
        saliency = get_attribution(family, args.attr_func, ctx)
        attr_time += time.time() - t
        write_map(saliency)

        scores = run_battery(bundle.apply, bundle.params, np.asarray(x),
                             saliency, blur, chunk=45, target=target)
        for k, v in scores.items():
            result[k] = result.get(k, 0.0) + v
        images_used += 1
        if args.verbose:
            print(f"[{images_used}/{args.image_count}] {item.name} "
                  f"cls={target} MAS_ins={scores['MAS_ins']:.4f}")

    if batch_buf:
        # score the leftover partial batch one image at a time (the batched
        # path needs a full, shape-stable batch); pass the stored target
        # explicitly so this path can never diverge from the batched one
        for p in batch_buf:
            ctx = AttrContext(bundle=bundle, x=jnp.asarray(p["x"]),
                              trans_img=p["trans_img"], target=p["target"],
                              key=p["key"], img_hw=bundle.meta.img_hw,
                              extras=p["extras"], dtype=attr_dtype)
            t = time.time()
            bsal = get_attribution(family, args.attr_func, ctx)
            attr_time += time.time() - t
            p["write_map"](bsal)
            scores = run_battery(bundle.apply, bundle.params, p["x"], bsal,
                                 blur, chunk=45, target=p["target"])
            for k, v in scores.items():
                result[k] = result.get(k, 0.0) + v
        batch_buf.clear()

    total_time = time.time() - t0
    if maps_store is not None:
        maps_store.close()
    if shard:
        # combine per-process score sums; attribution seconds are globally
        # summed too (the CSV's Attr-Avg-Runtime means "seconds of
        # attribution work per image", fleet-wide)
        from ..parallel.multi_host import allreduce_sums
        result, attr_time = allreduce_sums(result, attr_time)
    # under --shard_images only process 0 writes: the content is identical
    # on every process after the allreduce, but concurrent open('w')+write
    # to one path on a shared filesystem can tear the file
    if images_used and (not shard or jax.process_index() == 0):
        folder = os.path.join(args.output_dir, args.model)
        write_result_csv(folder, f"{args.attr_func}_{args.image_count}_images",
                         result, images_used, attr_time, total_time)
    return {k: v / max(images_used, 1) for k, v in result.items()}


def build_parser():
    p = argparse.ArgumentParser("evaluate_perturbation")
    p.add_argument("--image_count", type=int, default=1000)
    p.add_argument("--model", type=str, default="R101",
                   help="R50, R101, R152, RNXT, VIT16, VIT32")
    p.add_argument("--attr_func", type=str, default="ig")
    p.add_argument("--cuda_num", type=int, default=0,
                   help="accepted for reference-CLI compat; ignored")
    p.add_argument("--dataset_path", type=str, default="../../../ImageNet")
    p.add_argument("--class_maps_dir", type=str, default="")
    p.add_argument("--params_path", type=str, default="",
                   help="converted pretrained pytree (.npz / .msgpack; .pkl opt-in)")
    p.add_argument("--output_dir", type=str, default="pert_test_results")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N deterministic synthetic images (no dataset)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of the run here")
    p.add_argument("--image_batch", type=int, default=1,
                   help="attribute AND score N images per device call (one "
                        "fused dispatch each; shards over all devices when "
                        "N is a multiple of the count)")
    p.add_argument("--attr_dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="precision of the batched attribution sweep; bf16 "
                        "runs the fwd+VJP on the bf16 MXU path (~2x) with "
                        "f32 Riemann accumulation — rank-stable vs f32 "
                        "(tests/test_batch_attr.py)")
    p.add_argument("--save_maps", action="store_true",
                   help="dump every attribution map to an HDF5 store "
                        "(the golden-parity workflow, BASELINE.md)")
    p.add_argument("--skip_gates", action="store_true",
                   help="bypass the blur/black sanity gates (useful with "
                        "random weights; the reference gates assume a "
                        "trained model)")
    p.add_argument("--shard_images", action="store_true",
                   help="under jax.distributed: stripe the kept images "
                        "over processes and allreduce the score sums so "
                        "every process writes the same CSV as a "
                        "single-process run")
    return p


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()
    if getattr(args, "profile_dir", ""):
        import jax
        with jax.profiler.trace(args.profile_dir):
            scores = evaluate_perturbation(args)
    else:
        scores = evaluate_perturbation(args)
    print({k: round(v, 4) for k, v in scores.items()})


if __name__ == "__main__":
    main()
