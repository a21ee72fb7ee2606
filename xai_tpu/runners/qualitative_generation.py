"""Qualitative figure grids: all attribution methods for one image rendered
as a panel (XAI_Survey/evaluations/qualitativeGeneration.py — 16-panel CNN /
11-panel ViT / CLIP grids).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ImageNetValStream
from ..registry import AttrContext, get_attribution, CNN_METHODS
from ..utils.visualization import attr_to_subplot
from .common import MODEL_TABLE, build_bundle, clip_extras, normalize_input

# the reference's panel lists (qualitativeGeneration.py:104-231)
CNN_PANEL = ["grad", "inp_x_grad", "ig", "lig", "idg", "gig", "agi", "sg",
             "xrai", "gc", "gbp", "ggc", "gs", "lime", "fa", "occ"]
VIT_PANEL = ["attn", "grad", "n_rollout", "rollout", "t_attn", "bi_attn",
             "t_attr", "VIT_CX", "TIS", "InFlow", "MDA"]
CLIP_PANEL = ["eclip", "eclip_wo", "maskclip", "rollout", "selfattn",
              "game", "lrp", "surgery", "m2ib"]


def generate(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    family, _ = MODEL_TABLE[args.model]
    bundle = build_bundle(args.model, args.params_path)
    panel = {"cnn": CNN_PANEL, "vit": VIT_PANEL,
             "clip": CLIP_PANEL}[family]
    if args.methods:
        panel = args.methods.split(",")

    stream = ImageNetValStream(args.dataset_path, img_hw=bundle.meta.img_hw,
                               synthetic=args.synthetic)
    os.makedirs(args.output_dir, exist_ok=True)

    done = 0
    for item in stream:
        if done >= args.image_count:
            break
        x = normalize_input(item.trans_img, family)
        target = int(jnp.argmax(bundle.logits_fn(bundle.params, x[None])[0]))
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), item.index)

        n = len(panel) + 1
        cols = min(n, 6)
        rows = (n + cols - 1) // cols
        fig, axs = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
        axs = np.atleast_2d(axs)
        attr_to_subplot(item.trans_img, "input", axs[0, 0],
                        original_image=True)
        for j, name in enumerate(panel, start=1):
            ax = axs[j // cols, j % cols]
            try:
                extras = (clip_extras(bundle, target)
                          if family == "clip" else None)
                ctx = AttrContext(bundle=bundle, x=x,
                                  trans_img=item.trans_img, target=target,
                                  key=key, img_hw=bundle.meta.img_hw,
                                  extras=extras)
                sal = get_attribution(family, name, ctx)
                attr_to_subplot(sal[..., None], name, ax)
            except Exception as e:  # pragma: no cover - robustness for grids
                ax.set_title(f"{name}: failed")
                print(f"{name} failed: {e}")
        for j in range(n, rows * cols):
            axs[j // cols, j % cols].axis("off")
        out = os.path.join(args.output_dir,
                           f"{args.model}_{item.name}.png")
        fig.tight_layout()
        fig.savefig(out, dpi=100)
        plt.close(fig)
        print(f"wrote {out}")
        done += 1


def build_parser():
    p = argparse.ArgumentParser("qualitative_generation")
    p.add_argument("--image_count", type=int, default=1)
    p.add_argument("--model", type=str, default="R101")
    p.add_argument("--methods", type=str, default="",
                   help="comma list; default = full family panel")
    p.add_argument("--cuda_num", type=int, default=0)
    p.add_argument("--dataset_path", type=str, default="../../../ImageNet")
    p.add_argument("--params_path", type=str, default="")
    p.add_argument("--output_dir", type=str, default="qualitative_results")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()
    generate(args)


if __name__ == "__main__":
    main()
