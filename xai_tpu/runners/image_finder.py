"""Correctly-classified mask generator — the reference's
util/image_finder/findCorrectlyClassifiedImageNet{,CLIP}.py: classify every
validation image in batches, write the 0/1 mask file that the evaluation
drivers use as their image filter.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ImageNetValStream, load_ground_truth
from ..data.classmaps import save_correct_mask
from .common import MODEL_TABLE, build_bundle, normalize_input


def find_correctly_classified(args):
    if args.model in MODEL_TABLE:
        family, batch = MODEL_TABLE[args.model]
        bundle = build_bundle(args.model, args.params_path)
    else:
        # extended zoo (the reference's 19 image_finder model choices)
        from ..models import get_bundle
        bundle = get_bundle(args.model)
        family = bundle.meta.family
        if args.params_path:
            import pickle
            import dataclasses
            with open(args.params_path, "rb") as f:
                bundle = dataclasses.replace(bundle,
                                             params=pickle.load(f))
    gnd = load_ground_truth(args.ground_truth)
    n_total = args.total or len(gnd)
    mask = np.zeros(n_total, np.int64)

    # the bundle's own input resolution (IV3 is 299, the tiny CI models 64
    # — classifying 224px crops would write a silently-wrong mask)
    stream = ImageNetValStream(args.dataset_path,
                               img_hw=bundle.meta.img_hw,
                               synthetic=args.synthetic)
    buf_x, buf_idx = [], []

    @jax.jit
    def classify(xb):
        return jnp.argmax(bundle.apply(bundle.params, xb), axis=-1)

    def flush():
        if not buf_x:
            return
        xb = jnp.stack(buf_x)
        preds = np.asarray(classify(xb))
        for idx, pred in zip(buf_idx, preds):
            if idx < n_total and pred == gnd[idx]:
                mask[idx] = 1
        buf_x.clear()
        buf_idx.clear()

    for item in stream:
        buf_x.append(normalize_input(item.trans_img, family))
        buf_idx.append(item.index)
        if len(buf_x) == args.batch_size:
            flush()
    flush()

    path = save_correct_mask(args.class_maps_dir, args.model, mask)
    print(f"wrote {path}: {mask.sum()}/{n_total} correctly classified")
    return mask


def build_parser():
    p = argparse.ArgumentParser("image_finder")
    p.add_argument("--model", type=str, default="R101")
    p.add_argument("--dataset_path", type=str, default="../../../ImageNet")
    p.add_argument("--ground_truth", type=str,
                   default="ILSVRC2012_validation_ground_truth.txt")
    p.add_argument("--class_maps_dir", type=str, default="class_maps")
    p.add_argument("--params_path", type=str, default="")
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--total", type=int, default=0)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--cuda_num", type=int, default=0)
    return p


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()
    find_correctly_classified(args)


if __name__ == "__main__":
    main()
