"""The older ViT-focused segmentation driver
(XAI_Survey/evaluations/imagenet_seg_eval.py): same pixAcc/mIoU/mAP/mF1
accumulation plus the research knobs — ``--method`` covering the ViT
explainers, SHAP (ShapleyValueSampling over the patch grid), MDA variants,
and ``Calibrate_Best_Possible`` (the MASCalibrator upper bound, :172-194) —
with ``--thr`` / ``--kappa`` style options.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.segmentation import ImagenetSegmentation
from ..metrics.seg import best_threshold, eval_batch
from ..registry import AttrContext, get_attribution
from .common import MODEL_TABLE, build_bundle, normalize_input


def _patch_count(bundle) -> int:
    # CNN bundles carry num_patches=None; the reference driver's grid is
    # fixed 14x14 there (imagenet_seg_eval.py:330 segment_count)
    return (bundle.meta.num_patches or 14) ** 2


def _get_attr(args, bundle, family, ctx):
    if args.method == "shap":
        from ..methods.ablation import shapley_sampling
        from ..methods.gradient import to_saliency
        return to_saliency(shapley_sampling(
            ctx.bundle, ctx.x, ctx.target, ctx.key,
            n_samples=args.shap_samples))
    if args.method == "Calibrate_Best_Possible":
        from ..methods.mas_calibrate import refine_attribution
        from ..native import slic
        seg = slic(np.asarray(ctx.trans_img, np.float32),
                   _patch_count(bundle), 10000.0)
        base = np.repeat(
            np.asarray(get_attribution(family, "rollout", ctx))[..., None],
            3, axis=-1)
        refined, smoothed = refine_attribution(
            bundle, np.asarray(ctx.x), base, epochs=args.epochs,
            segments=seg)
        return np.abs(smoothed.sum(-1))
    return get_attribution(family, args.method, ctx)


def run(args) -> dict:
    family, _ = MODEL_TABLE[args.model]
    bundle = build_bundle(args.model, args.params_path)
    ds = ImagenetSegmentation(args.dataset_path,
                              img_hw=bundle.meta.img_hw,
                              synthetic=args.synthetic)

    total_inter = np.zeros(2, np.int64)
    total_union = np.zeros(2, np.int64)
    total_correct = np.int64(0)
    total_label = np.int64(0)
    total_ap, total_f1 = [], []
    skipped = 0
    adt = {"bf16": jnp.bfloat16, "f32": None}[
        getattr(args, "attr_dtype", "f32")]

    def score_one(sal, gt_mask):
        nonlocal total_correct, total_label, total_inter, total_union
        if args.method in ("Calibrate_Best_Possible", "MDA_dense"):
            # per-image best-IoU threshold (imagenet_seg_eval.py:194-222)
            sal, thr = best_threshold(sal, gt_mask)
            correct, labeled, inter, union, ap, f1 = eval_batch(
                sal, gt_mask, thr=thr, normalized=True)
        else:
            # --thr > 0 fixes the fg/bg split; 0 keeps the mean threshold
            correct, labeled, inter, union, ap, f1 = eval_batch(
                sal, gt_mask, thr=args.thr if args.thr > 0 else None)
        total_correct += np.int64(correct)
        total_label += np.int64(labeled)
        total_inter += inter.astype(np.int64)
        total_union += union.astype(np.int64)
        total_ap.append(ap)
        total_f1.append(f1)

    def flush(buf):
        """One fused multi-image attribution dispatch when the method has a
        batched implementation (methods/batch.py); shap /
        Calibrate_Best_Possible and other unbatched methods fall back to
        the per-image path inside the same buffer."""
        from ..methods.batch import batch_attribution
        sals = None
        if args.method not in ("shap", "Calibrate_Best_Possible"):
            sals = batch_attribution(
                family, args.method, bundle,
                np.stack([b["x"] for b in buf]),
                np.stack([b["trans_img"] for b in buf]),
                np.array([b["target"] for b in buf]),
                np.stack([np.asarray(b["key"]) for b in buf]),
                img_hw=bundle.meta.img_hw, dtype=adt)
        if sals is None:
            sals = [_get_attr(args, bundle, family, AttrContext(
                bundle=bundle, x=jnp.asarray(b["x"]),
                trans_img=b["trans_img"], target=b["target"],
                key=b["key"], img_hw=bundle.meta.img_hw, dtype=adt))
                for b in buf]
        for b, sal in zip(buf, sals):
            score_one(np.asarray(sal), b["gt_mask"])
        buf.clear()

    # --shard_images under jax.distributed: stripe the dataset index
    # modulo process count (same contract as evaluate_imagenet_seg — the
    # acc_cutoff skip happens per-image after the stripe, so every process
    # sees a disjoint subset and the union equals the solo run)
    shard = bool(getattr(args, "shard_images", False)) \
        and jax.process_count() > 1
    pidx, pcount = jax.process_index(), jax.process_count()

    buf = []
    base_key = jax.random.PRNGKey(args.seed)
    for i, item in enumerate(ds):
        if args.image_count and i >= args.image_count:
            break
        if shard and i % pcount != pidx:
            continue
        x = normalize_input(item.trans_img, family)
        probs = jax.nn.softmax(bundle.apply(bundle.params, x[None])[0])
        target = int(jnp.argmax(probs))
        # low-confidence skip (imagenet_seg_eval.py:234: percent scale)
        if float(probs[target]) * 100 < args.acc_cutoff:
            skipped += 1
            continue
        key = jax.random.fold_in(base_key, i)
        if args.image_batch > 1:
            buf.append({"x": np.asarray(x),
                        "trans_img": np.asarray(item.trans_img),
                        "target": target, "key": key,
                        "gt_mask": item.gt_mask})
            if len(buf) == args.image_batch:
                flush(buf)
            continue
        ctx = AttrContext(bundle=bundle, x=x, trans_img=item.trans_img,
                          target=target, key=key,
                          img_hw=bundle.meta.img_hw, dtype=adt)
        sal = _get_attr(args, bundle, family, ctx)
        score_one(np.asarray(sal), item.gt_mask)
    if buf:
        flush(buf)

    if shard:
        # exact global accumulators: int64 sums + concatenated AP/F1 lists
        # (same protocol as evaluate_imagenet_seg)
        from ..parallel.multi_host import allgather_obj
        parts = allgather_obj({"inter": total_inter, "union": total_union,
                               "correct": int(total_correct),
                               "label": int(total_label),
                               "ap": total_ap, "f1": total_f1,
                               "skipped": skipped},
                              name="seg_eval_gather")
        total_inter = np.sum([p["inter"] for p in parts],
                             axis=0).astype(np.int64)
        total_union = np.sum([p["union"] for p in parts],
                             axis=0).astype(np.int64)
        total_correct = np.int64(sum(p["correct"] for p in parts))
        total_label = np.int64(sum(p["label"] for p in parts))
        total_ap = [v for p in parts for v in p["ap"]]
        total_f1 = [v for p in parts for v in p["f1"]]
        skipped = sum(p["skipped"] for p in parts)

    pixAcc = float(total_correct / (np.spacing(1) + total_label))
    mIoU = float((total_inter / (np.spacing(1) + total_union)).mean())
    mAp = float(np.mean(total_ap)) if total_ap else 0.0
    mF1 = float(np.mean(total_f1)) if total_f1 else 0.0
    if skipped:
        print(f"skipped {skipped} images below --acc_cutoff "
              f"{args.acc_cutoff}%")
    # under --shard_images only process 0 writes (shared-filesystem
    # safety); the returned dict is global on every process
    if not shard or jax.process_index() == 0:
        os.makedirs(args.output_dir, exist_ok=True)
        with open(os.path.join(
                args.output_dir,
                f"{args.model}_{args.method}.txt"), "w") as fh:
            fh.write("Mean IoU over %d classes: %.4f\n" % (2, mIoU))
            fh.write("Pixel-wise Accuracy: %2.2f%%\n" % (pixAcc * 100))
            fh.write("Mean AP over %d classes: %.4f\n" % (2, mAp))
            fh.write("Mean F1 over %d classes: %.4f\n" % (2, mF1))
    return {"pixAcc": pixAcc, "mIoU": mIoU, "mAP": mAp, "mF1": mF1}


def build_parser():
    p = argparse.ArgumentParser("imagenet_seg_eval")
    p.add_argument("--method", type=str, default="rollout",
                   help="ViT explainers + shap + Calibrate_Best_Possible")
    p.add_argument("--model", type=str, default="VIT16")
    p.add_argument("--image_count", type=int, default=0)
    p.add_argument("--thr", type=float, default=0.0,
                   help="fixed fg/bg threshold; 0 = mean threshold")
    p.add_argument("--kappa", type=float, default=0.005)
    p.add_argument("--acc_cutoff", type=float, default=60.0,
                   help="skip images whose softmax confidence (percent) is "
                        "below this (imagenet_seg_eval.py:234; default 60)")
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--shap_samples", type=int, default=25,
                   help="ShapleyValueSampling permutation count (captum "
                        "default 25, imagenet_seg_eval.py:165)")
    p.add_argument("--dataset_path", type=str, default="gtsegs_ijcv.mat")
    p.add_argument("--params_path", type=str, default="")
    p.add_argument("--output_dir", type=str, default="seg_eval_results")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cuda_num", type=int, default=0)
    p.add_argument("--attr_dtype", type=str, default="f32",
                   choices=("f32", "bf16"),
                   help="attribution sweep dtype (bf16 = opt-in fast path)")
    p.add_argument("--image_batch", type=int, default=1,
                   help="fused multi-image attribution batch size "
                        "(methods with a batched implementation)")
    p.add_argument("--shard_images", action="store_true",
                   help="under jax.distributed: stripe images across "
                        "processes and combine counters exactly; only "
                        "process 0 writes the TXT")
    return p


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()
    print({k: round(v, 4) for k, v in run(args).items()})


if __name__ == "__main__":
    main()
