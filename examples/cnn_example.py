"""CNN walkthrough — the XAI_Survey/notebooks/CNN_example.ipynb equivalent:
gradient / IG / LIG / IDG attributions on a ResNet, rendered as a panel and
scored with the perturbation battery.

Run: python examples/cnn_example.py [--image path.jpg] [--params params.pkl]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

from xai_tpu.methods import gradient as G
from xai_tpu.metrics import run_battery
from xai_tpu.models import resnet
from xai_tpu.ops import make_blur_fn
from xai_tpu.ops.preprocess import load_and_preprocess


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default="")
    p.add_argument("--params", default="")
    p.add_argument("--model", default="R50")
    p.add_argument("--out", default="cnn_example.png")
    args = p.parse_args()

    params = None
    if args.params:
        import pickle
        with open(args.params, "rb") as f:
            params = pickle.load(f)
    bundle = resnet.make_bundle(args.model, params=params)

    if args.image:
        trans_img, x = load_and_preprocess(args.image)
        x = x[0]
    else:
        key = jax.random.PRNGKey(0)
        trans_img = np.asarray(jax.random.uniform(key, (224, 224, 3)))
        x = (trans_img - np.array([0.485, 0.456, 0.406])) / \
            np.array([0.229, 0.224, 0.225])

    target, prob = bundle.predict(np.asarray(x)[None])
    print(f"predicted class {target} (p={prob:.4f})")

    maps = {
        "grad": G.to_saliency(G.grad(bundle, x, target)),
        "ig": G.to_saliency(G.ig(bundle, x, target, steps=50)),
        "lig": G.to_saliency(G.ig(bundle, x, target, steps=50,
                                  alpha_star=0.9)),
        "idg": G.to_saliency(G.idg(bundle, x, target, steps=50)),
    }

    blur = make_blur_fn()
    for name, sal in maps.items():
        scores = run_battery(bundle.apply, bundle.params, np.asarray(x),
                             sal, blur)
        print(f"{name:5s} MAS_ins={scores['MAS_ins']:.4f} "
              f"MAS_del={scores['MAS_del']:.4f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from xai_tpu.utils.visualization import attr_to_subplot

        fig, axs = plt.subplots(1, len(maps) + 1, figsize=(15, 3))
        attr_to_subplot(trans_img, "input", axs[0], original_image=True)
        for ax, (name, sal) in zip(axs[1:], maps.items()):
            attr_to_subplot(sal[..., None], name, ax)
        fig.tight_layout()
        fig.savefig(args.out, dpi=100)
        print(f"wrote {args.out}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
