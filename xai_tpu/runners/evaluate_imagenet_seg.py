"""Segmentation driver: attribution as binary segmentation vs ground-truth
masks -> pixAcc / mIoU / mAP / mF1 -> TXT.

Mirrors XAI_Survey/evaluations/evaluateImageNetSeg.py: per (image, mask):
attribution -> minmax normalize -> threshold at the mean -> binary channels
-> accumulate (:470-573); output TXT format identical.
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
from .common import MODEL_TABLE, build_bundle, clip_extras, normalize_input


def evaluate_imagenet_seg(args) -> dict:
    family, batch = MODEL_TABLE[args.model]
    bundle = build_bundle(args.model, args.params_path)

    ds = ImagenetSegmentation(args.dataset_path,
                              img_hw=bundle.meta.img_hw,
                              synthetic=args.synthetic)
    total_inter = np.zeros(2, np.int64)
    total_union = np.zeros(2, np.int64)
    total_correct = np.int64(0)
    total_label = np.int64(0)
    total_ap, total_f1 = [], []

    def score_one(sal, gt_mask):
        nonlocal total_correct, total_label, total_inter, total_union
        if args.attr_func == "MDA_dense":
            # per-image best-IoU threshold sweep (evaluateImageNetSeg.py:
            # 331-360) instead of the mean threshold
            sal, thr = best_threshold(sal, gt_mask)
            correct, labeled, inter, union, ap, f1 = eval_batch(
                sal, gt_mask, thr=thr, normalized=True)
        else:
            correct, labeled, inter, union, ap, f1 = eval_batch(
                sal, gt_mask)
        total_correct += np.int64(correct)
        total_label += np.int64(labeled)
        total_inter += inter.astype(np.int64)
        total_union += union.astype(np.int64)
        total_ap.append(ap)
        total_f1.append(f1)

    def flush(buf):
        """Batched attribution for a full buffer (one fused dispatch when
        the method supports it — methods/batch.py), then per-image seg
        scoring on host."""
        from ..methods.batch import batch_attribution
        xs = np.stack([b["x"] for b in buf])
        targets = np.array([b["target"] for b in buf])
        keys = np.stack([np.asarray(b["key"]) for b in buf])
        extras = None
        if family == "clip":
            extras = {"txt_emb": np.stack(
                [b["extras"]["txt_emb"][0] for b in buf])}
            if "text_tokens" in buf[0]["extras"]:
                extras["text_tokens"] = np.stack(
                    [b["extras"]["text_tokens"][0] for b in buf])
        adt = {"bf16": jnp.bfloat16, "f32": None}[
            getattr(args, "attr_dtype", "f32")]
        sals = batch_attribution(family, args.attr_func, bundle, xs,
                                 np.stack([b["trans_img"] for b in buf]),
                                 targets, keys, extras=extras,
                                 img_hw=bundle.meta.img_hw, dtype=adt)
        if sals is None:
            sals = [get_attribution(family, args.attr_func, AttrContext(
                bundle=bundle, x=jnp.asarray(b["x"]),
                trans_img=b["trans_img"], target=b["target"], key=b["key"],
                img_hw=bundle.meta.img_hw, extras=b["extras"], dtype=adt))
                for b in buf]
        for b, sal in zip(buf, sals):
            score_one(np.asarray(sal), b["gt_mask"])
        buf.clear()

    # --shard_images under jax.distributed: seg has no gates/quota, so the
    # stripe is simply the dataset index modulo process count; the int64
    # pixel counters + per-image AP/F1 lists are combined EXACTLY with the
    # KV-store allgather before the TXT (reference fan-out: allSegTests.txt
    # job-per-GPU — this distributes a SINGLE run at image granularity)
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
        target = int(jnp.argmax(bundle.logits_fn(bundle.params,
                                                 x[None])[0]))
        key = jax.random.fold_in(base_key, i)
        extras = clip_extras(bundle, target) if family == "clip" else None
        if args.image_batch > 1:
            buf.append({"x": np.asarray(x),
                        "trans_img": np.asarray(item.trans_img),
                        "target": target, "key": key, "extras": extras,
                        "gt_mask": item.gt_mask})
            if len(buf) == args.image_batch:
                flush(buf)
            continue
        ctx = AttrContext(bundle=bundle, x=x, trans_img=item.trans_img,
                          target=target, key=key,
                          img_hw=bundle.meta.img_hw, extras=extras)
        sal = get_attribution(family, args.attr_func, ctx)
        score_one(sal, item.gt_mask)
        if args.verbose:
            pixacc = total_correct / (np.spacing(1) + total_label)
            miou = (total_inter / (np.spacing(1) + total_union)).mean()
            print(f"[{i + 1}] pixAcc {pixacc:.4f} mIoU {miou:.4f}")
    if buf:
        flush(buf)

    if shard:
        # exact global accumulators: int64 sums + concatenated AP/F1 lists
        # (mean is order-invariant; concatenation in process order keeps
        # the float-sum order deterministic)
        from ..parallel.multi_host import allgather_obj
        parts = allgather_obj({"inter": total_inter, "union": total_union,
                               "correct": int(total_correct),
                               "label": int(total_label),
                               "ap": total_ap, "f1": total_f1},
                              name="seg_gather")
        total_inter = np.sum([p["inter"] for p in parts],
                             axis=0).astype(np.int64)
        total_union = np.sum([p["union"] for p in parts],
                             axis=0).astype(np.int64)
        total_correct = np.int64(sum(p["correct"] for p in parts))
        total_label = np.int64(sum(p["label"] for p in parts))
        total_ap = [v for p in parts for v in p["ap"]]
        total_f1 = [v for p in parts for v in p["f1"]]

    pixAcc = float(total_correct / (np.spacing(1) + total_label))
    mIoU = float((total_inter / (np.spacing(1) + total_union)).mean())
    mAp = float(np.mean(total_ap)) if total_ap else 0.0
    mF1 = float(np.mean(total_f1)) if total_f1 else 0.0

    # under --shard_images only process 0 writes (shared-filesystem safety,
    # same contract as evaluate_perturbation); the returned dict is global
    # on every process
    if not shard or jax.process_index() == 0:
        folder = os.path.join(args.output_dir, args.model)
        os.makedirs(folder, exist_ok=True)
        fn = os.path.join(folder,
                          f"{args.attr_func}_{args.image_count}_images")
        with open(fn, "w") as fh:
            fh.write("Mean IoU over %d classes: %.4f\n" % (2, mIoU))
            fh.write("Pixel-wise Accuracy: %2.2f%%\n" % (pixAcc * 100))
            fh.write("Mean AP over %d classes: %.4f\n" % (2, mAp))
            fh.write("Mean F1 over %d classes: %.4f\n" % (2, mF1))
    return {"pixAcc": pixAcc, "mIoU": mIoU, "mAP": mAp, "mF1": mF1}


def build_parser():
    p = argparse.ArgumentParser("evaluate_imagenet_seg")
    p.add_argument("--image_count", type=int, default=0,
                   help="0 = full dataset")
    p.add_argument("--model", type=str, default="R101")
    p.add_argument("--attr_func", type=str, default="ig")
    p.add_argument("--cuda_num", type=int, default=0)
    p.add_argument("--dataset_path", type=str,
                   default="gtsegs_ijcv.mat")
    p.add_argument("--params_path", type=str, default="")
    p.add_argument("--output_dir", type=str, default="seg_test_results")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--attr_dtype", type=str, default="f32",
                   choices=("f32", "bf16"),
                   help="attribution sweep dtype (bf16 = opt-in fast path)")
    p.add_argument("--image_batch", type=int, default=1,
                   help="fused multi-image attribution batch size "
                        "(methods with a batched implementation)")
    p.add_argument("--shard_images", action="store_true",
                   help="under jax.distributed: stripe the dataset over "
                        "processes and combine the pixAcc/IoU/AP/F1 "
                        "accumulators exactly so process 0 writes the "
                        "same TXT as a single-process run")
    return p


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()
    print({k: round(v, 4) for k, v in evaluate_imagenet_seg(args).items()})


if __name__ == "__main__":
    main()
