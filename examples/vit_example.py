"""ViT walkthrough — the ViT_example.ipynb equivalent: attention rollouts,
bidirectional attribution and MDA (with the adaptive blur) on ViT-B/16.

Run: python examples/vit_example.py [--image path.jpg] [--params params.pkl]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from xai_tpu.methods import vit_explain as VE
from xai_tpu.methods.mda import mda
from xai_tpu.models import vit
from xai_tpu.ops import make_blur_fn
from xai_tpu.ops.resize import resize_bilinear


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default="")
    p.add_argument("--params", default="")
    p.add_argument("--with_mda", action="store_true")
    args = p.parse_args()

    params = None
    if args.params:
        import pickle
        with open(args.params, "rb") as f:
            params = pickle.load(f)
    bundle = vit.make_bundle("VIT16", params=params)

    if args.image:
        from xai_tpu.ops.preprocess import load_and_preprocess, VIT_MEAN, \
            VIT_STD
        trans_img, x = load_and_preprocess(args.image, mean=VIT_MEAN,
                                           std=VIT_STD)
        x = x[0]
    else:
        trans_img = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(0), (224, 224, 3)))
        x = jnp.asarray(trans_img * 2 - 1)

    target = int(jnp.argmax(bundle.apply(bundle.params,
                                         jnp.asarray(x)[None])[0]))
    print("target:", target)

    for name, fn in [
        ("raw attn", lambda: VE.raw_attn(bundle, x)),
        ("rollout", lambda: VE.rollout(bundle, x)),
        ("t_attn", lambda: VE.transition_attention(bundle, x, target)),
        ("bi_attn", lambda: VE.bidirectional(bundle, x, target)),
        ("InFlow", lambda: VE.rave(bundle, x, target)),
    ]:
        m = np.abs(np.asarray(resize_bilinear(fn(), (224, 224))))
        print(f"{name:8s} map sum={m.sum():.4f} peak={m.max():.6f}")

    if args.with_mda:
        prior = VE.bidirectional(bundle, x, target)
        prior3 = np.repeat(np.asarray(
            resize_bilinear(prior, (224, 224)))[..., None], 3, -1)
        m = mda(bundle, trans_img, x, prior3, 196, make_blur_fn(),
                target=target)
        print("MDA map sum:", float(np.abs(m).sum()))


if __name__ == "__main__":
    main()
