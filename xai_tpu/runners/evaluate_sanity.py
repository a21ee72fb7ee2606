"""Sanity-check driver: attribution on trained vs weight-randomized model;
SSIM / Spearman / HOG-Spearman similarity -> CSV.

Mirrors XAI_Survey/evaluations/evaluateSanity.py: the randomized model uses
the family-specific re-initialization (:108-145 — CNN: kaiming/xavier on
conv/dense kernels only; ViT: N(0,1) on every param; CLIP: N(0,1) Linear
kernels + zeroed biases + N(0,1) embeddings); the attribution target comes
from each model's own prediction (:460-471).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ImageNetValStream, load_correct_mask
from ..metrics.sanity import evaluate as sanity_evaluate
from ..registry import AttrContext, get_attribution
from .common import MODEL_TABLE, build_bundle, clip_extras, \
    normalize_input, write_result_csv


def _kaiming_uniform(key, shape, dtype):
    fan_in = int(np.prod(shape[:-1]))
    bound = float(np.sqrt(6.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _xavier_uniform(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[-1]
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def randomize_family(params, family: str, key):
    """Family-specific weight randomization (evaluateSanity.py:108-145)."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        k = jax.random.fold_in(key, i)
        if family == "cnn":
            if name.endswith("kernel") and leaf.ndim == 4:
                out.append(_kaiming_uniform(k, leaf.shape, leaf.dtype))
            elif name.endswith("kernel") and leaf.ndim == 2:
                out.append(_xavier_uniform(k, leaf.shape, leaf.dtype))
            else:
                out.append(leaf)
        elif family == "vit":
            out.append(jax.random.normal(k, leaf.shape, leaf.dtype))
        else:  # clip
            if name.endswith("kernel") and leaf.ndim == 2:
                out.append(jax.random.normal(k, leaf.shape, leaf.dtype))
            elif name.endswith("bias"):
                out.append(jnp.zeros_like(leaf))
            elif "token_embedding" in name:
                out.append(jax.random.normal(k, leaf.shape, leaf.dtype))
            else:
                out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _flush_sanity(bundle, rand_bundle, family, buf, args, totals):
    """Batched sanity flush: targets from 2 stacked forwards, attributions
    from (at most) 2 fused batched dispatches — one per weight set — then
    the host SSIM/Spearman/HOG pairs (evaluateSanity.py:460-501 order)."""
    import numpy as np

    from .evaluate_perturbation import _batch_attribute

    xs = jnp.asarray(np.stack([p["x"] for p in buf]))
    tgt = np.asarray(jnp.argmax(bundle.logits_fn(bundle.params, xs), -1))
    tgt_r = np.asarray(jnp.argmax(
        rand_bundle.logits_fn(rand_bundle.params, xs), -1))
    pend = [dict(p, target=int(t),
                 extras=(clip_extras(bundle, int(t))
                         if family == "clip" else None))
            for p, t in zip(buf, tgt)]
    pend_r = [dict(p, target=int(t),
                   extras=(clip_extras(rand_bundle, int(t))
                           if family == "clip" else None))
              for p, t in zip(buf, tgt_r)]
    sals, _ = _batch_attribute(bundle, family, pend, args)
    sals_r, _ = _batch_attribute(rand_bundle, family, pend_r, args)
    out = []
    for a, ar in zip(sals, sals_r):
        ssim_v, spr_v, hog_v = sanity_evaluate(a, ar)
        totals["SSIM"] += ssim_v
        totals["SPR"] += spr_v
        totals["HOG"] += hog_v
        out.append((ssim_v, spr_v, hog_v))
    buf.clear()
    return out


def evaluate_sanity(args) -> dict:
    import dataclasses
    family, batch = MODEL_TABLE[args.model]
    bundle = build_bundle(args.model, args.params_path)
    rand_params = randomize_family(bundle.params, family,
                                   jax.random.PRNGKey(args.seed + 1))
    rand_bundle = dataclasses.replace(bundle, params=rand_params)
    if family == "clip":
        # the reference recomputes the 1000-prompt text table with the
        # RANDOMIZED text tower (evaluateSanity.py:610, used at :463) —
        # without this the randomized bundle's similarity closure and
        # extras would silently keep the trained table
        from ..models import clip as clipmod
        rand_bundle = clipmod.attach_text_table(rand_bundle)

    correct = load_correct_mask(args.class_maps_dir, args.model) \
        if args.class_maps_dir else None
    stream = ImageNetValStream(args.dataset_path, img_hw=bundle.meta.img_hw,
                               synthetic=args.synthetic)
    attr_dtype = {"bf16": jnp.bfloat16, "f32": None}[
        getattr(args, "attr_dtype", "f32")]
    image_batch = getattr(args, "image_batch", 1)

    totals = {"SSIM": 0.0, "SPR": 0.0, "HOG": 0.0}
    images_used = 0
    buf = []
    base_key = jax.random.PRNGKey(args.seed)
    t0 = time.time()

    # --shard_images under jax.distributed: every process applies the same
    # deterministic correct-mask filter, so the kept list is equal by
    # construction; the expensive double attribution (trained + randomized
    # weights) runs only for this process's stripe, and the similarity sums
    # are allreduced before the CSV (same contract as evaluate_perturbation)
    shard = bool(getattr(args, "shard_images", False)) \
        and jax.process_count() > 1
    pidx, pcount = jax.process_index(), jax.process_count()
    kept_rank = 0

    for item in stream:
        if images_used == args.image_count:
            break
        if correct is not None and correct[item.index] == 0:
            continue
        mine = (not shard) or (kept_rank % pcount == pidx)
        kept_rank += 1
        if not mine:
            # counts toward the shared denominator + the loop's break
            images_used += 1
            continue
        x = normalize_input(item.trans_img, family)
        key = jax.random.fold_in(base_key, item.index)

        if image_batch > 1:
            import numpy as np
            buf.append({"x": np.asarray(x),
                        "trans_img": np.asarray(item.trans_img),
                        "key": key})
            images_used += 1
            if len(buf) == image_batch:
                _flush_sanity(bundle, rand_bundle, family, buf, args,
                              totals)
            continue

        # cached jitted dispatch — bundle.apply is a bare (for CLIP even
        # un-jitted) closure and would run eagerly here
        target = int(jnp.argmax(bundle.logits_fn(bundle.params, x[None])[0]))
        target_rand = int(jnp.argmax(
            rand_bundle.logits_fn(rand_bundle.params, x[None])[0]))

        ctx = AttrContext(bundle=bundle, x=x, trans_img=item.trans_img,
                          target=target, key=key,
                          img_hw=bundle.meta.img_hw,
                          extras=(clip_extras(bundle, target)
                                  if family == "clip" else None),
                          dtype=attr_dtype)
        ctx_r = AttrContext(bundle=rand_bundle, x=x,
                            trans_img=item.trans_img, target=target_rand,
                            key=key, img_hw=bundle.meta.img_hw,
                            extras=(clip_extras(rand_bundle, target_rand)
                                    if family == "clip" else None),
                            dtype=attr_dtype)
        attr = get_attribution(family, args.attr_func, ctx)
        attr_r = get_attribution(family, args.attr_func, ctx_r)
        ssim_v, spr_v, hog_v = sanity_evaluate(attr, attr_r)
        totals["SSIM"] += ssim_v
        totals["SPR"] += spr_v
        totals["HOG"] += hog_v
        images_used += 1
        if args.verbose:
            print(f"[{images_used}] SSIM={ssim_v:.4f} SPR={spr_v:.4f} "
                  f"HOG={hog_v:.4f}")

    if buf:
        _flush_sanity(bundle, rand_bundle, family, buf, args, totals)

    total_time = time.time() - t0
    if shard:
        from ..parallel.multi_host import allreduce_sums
        totals, _ = allreduce_sums(totals)
    # under --shard_images only process 0 writes (shared-filesystem safety)
    if images_used and (not shard or jax.process_index() == 0):
        folder = os.path.join(args.output_dir, args.model)
        os.makedirs(folder, exist_ok=True)
        import csv
        fn = os.path.join(folder,
                          f"{args.attr_func}_{args.image_count}_images.csv")
        with open(fn, "w") as f:
            w = csv.writer(f)
            for k in totals:
                w.writerow([k, str(totals[k] / images_used)])
            w.writerow(["Total Runtime", str(total_time)])
    return {k: v / max(images_used, 1) for k, v in totals.items()}


def build_parser():
    p = argparse.ArgumentParser("evaluate_sanity")
    p.add_argument("--image_count", type=int, default=1000)
    p.add_argument("--model", type=str, default="R101")
    p.add_argument("--attr_func", type=str, default="ig")
    p.add_argument("--cuda_num", type=int, default=0)
    p.add_argument("--dataset_path", type=str, default="../../../ImageNet")
    p.add_argument("--class_maps_dir", type=str, default="")
    p.add_argument("--params_path", type=str, default="")
    p.add_argument("--output_dir", type=str, default="sanity_test_results")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--image_batch", type=int, default=1,
                   help="fused multi-image attribution batch (both weight "
                        "sets); 1 = per-image")
    p.add_argument("--attr_dtype", type=str, default="f32",
                   choices=("f32", "bf16"),
                   help="attribution sweep dtype (bf16 = opt-in fast path)")
    p.add_argument("--shard_images", action="store_true",
                   help="under jax.distributed: stripe the kept images "
                        "over processes and allreduce the SSIM/SPR/HOG "
                        "sums so process 0 writes the same CSV as a "
                        "single-process run")
    return p


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()
    print({k: round(v, 4) for k, v in evaluate_sanity(args).items()})


if __name__ == "__main__":
    main()
