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
import numpy as np

from ..data import ImageNetValStream, load_correct_mask
from ..metrics import run_battery
from ..registry import AttrContext, get_attribution
from .common import (build_bundle, clip_extras, default_blur, image_gates,
                     MODEL_TABLE,
                     normalize_input, write_result_csv)


def _flush_batch(bundle, batch_buf, blur, result, args):
    """Score a full image batch with the batched curve engine (2.5x the
    sequential path even on one chip; shards over the mesh when more
    devices are present)."""
    from ..parallel.mesh import make_mesh
    from ..parallel.sharded_battery import sharded_battery_scores
    import jax

    mesh = make_mesh(model_axis=1)    # all devices; battery pads-and-masks
    imgs = np.stack([b[0] for b in batch_buf])
    sals = np.stack([b[1] for b in batch_buf])
    targets = np.array([b[3] for b in batch_buf])
    all_scores = sharded_battery_scores(bundle, mesh, imgs, sals, blur,
                                        chunk=45, targets=targets)
    for (_, _, name, _), scores in zip(batch_buf, all_scores):
        for k, v in scores.items():
            result[k] = result.get(k, 0.0) + v
        if args.verbose:
            print(f"[batch] {name} MAS_ins={scores['MAS_ins']:.4f}")
    batch_buf.clear()


def evaluate_perturbation(args) -> dict:
    family, batch = MODEL_TABLE[args.model]
    bundle = build_bundle(args.model, args.params_path)
    blur = default_blur()

    correct = load_correct_mask(args.class_maps_dir, args.model) \
        if args.class_maps_dir else None

    num_classes = 1000
    images_per_class = int(np.ceil(args.image_count / num_classes))
    classes_used = [0] * num_classes

    stream = ImageNetValStream(args.dataset_path, synthetic=args.synthetic)
    # plain-dict accumulation: the reference's `Counter +=` silently drops
    # keys whose running sum is <= 0 (collections.Counter semantics); we keep
    # every metric column
    result = {}
    images_used = 0
    attr_time = 0.0
    maps_store = None
    batch_buf = []
    t0 = time.time()

    for item in stream:
        if images_used == args.image_count:
            break
        if correct is not None and correct[item.index] == 0:
            continue
        x = normalize_input(item.trans_img, family)
        target, original_pred, ok = image_gates(bundle, x, blur)
        if not ok and not args.synthetic and not args.skip_gates:
            continue
        if classes_used[target] == images_per_class:
            continue
        classes_used[target] += 1

        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), item.index)
        # CLIP: target prompt embedding + real BPE token ids for the probed
        # methods (evaluatePerturbation.py:388, 698-704)
        extras = clip_extras(bundle, target) if family == "clip" else None
        ctx = AttrContext(bundle=bundle, x=x, trans_img=item.trans_img,
                          target=target, key=key, img_hw=bundle.meta.img_hw,
                          extras=extras)
        t = time.time()
        saliency = get_attribution(family, args.attr_func, ctx)
        attr_time += time.time() - t

        if args.save_maps:
            if maps_store is None:
                from ..data.voc import ExplanationsHDF5
                os.makedirs(args.output_dir, exist_ok=True)
                maps_store = ExplanationsHDF5(
                    os.path.join(args.output_dir,
                                 f"{args.model}_{args.attr_func}_maps.h5"),
                    mode="w")
            maps_store.write(item.name, saliency, target=target,
                             original_pred=original_pred)

        if args.image_batch > 1:
            batch_buf.append((np.asarray(x), saliency, item.name, target))
            images_used += 1
            if len(batch_buf) == args.image_batch:
                _flush_batch(bundle, batch_buf, blur, result, args)
            continue

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
        for bx, bsal, _, btarget in batch_buf:
            scores = run_battery(bundle.apply, bundle.params, bx, bsal,
                                 blur, chunk=45, target=btarget)
            for k, v in scores.items():
                result[k] = result.get(k, 0.0) + v
        batch_buf.clear()

    total_time = time.time() - t0
    if maps_store is not None:
        maps_store.close()
    if images_used:
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
                   help="score the metric battery for N images per device "
                        "call (2.5x sequential on one chip; shards over "
                        "all devices when N is a multiple of the count)")
    p.add_argument("--save_maps", action="store_true",
                   help="dump every attribution map to an HDF5 store "
                        "(the golden-parity workflow, BASELINE.md)")
    p.add_argument("--skip_gates", action="store_true",
                   help="bypass the blur/black sanity gates (useful with "
                        "random weights; the reference gates assume a "
                        "trained model)")
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
