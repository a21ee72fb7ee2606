"""CLIP walkthrough — the CLIP_example.ipynb equivalent: Grad-ECLIP /
MaskCLIP heatmaps for a caption.

Run: python examples/clip_example.py [--image path.jpg] [--params params.pkl]
     [--bpe bpe_simple_vocab_16e6.txt.gz --caption "a photo of a cat"]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from xai_tpu.methods import clip_explain as CE
from xai_tpu.models import clip as clipmod


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default="")
    p.add_argument("--params", default="")
    p.add_argument("--bpe", default="")
    p.add_argument("--caption", default="a photo of a dog")
    args = p.parse_args()

    params = None
    if args.params:
        import pickle
        with open(args.params, "rb") as f:
            params = pickle.load(f)
    bundle = clipmod.make_bundle("CLIP16", params=params)

    if args.image:
        from xai_tpu.ops.preprocess import (CLIP_MEAN, CLIP_STD,
                                            load_and_preprocess)
        _, x = load_and_preprocess(args.image, mean=CLIP_MEAN, std=CLIP_STD)
        x = x[0]
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (224, 224, 3)) * 0.5

    if args.bpe:
        from xai_tpu.data.tokenizer import SimpleTokenizer
        tok = SimpleTokenizer(args.bpe)
        tokens = jnp.asarray(tok.tokenize([args.caption]))
        model = bundle.extras["model"]
        txt = model.apply({"params": bundle.params}, tokens,
                          method=clipmod.CLIP.encode_text)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    else:
        # no vocab file: use a row of the (random) class table as stand-in
        txt = bundle.extras["text_embeddings"][:1]
        tokens = jnp.asarray([[49406, 320, 49407, 0]], jnp.int32)

    for name, m in [
        ("grad_eclip", CE.grad_eclip(bundle, x, txt)),
        ("maskclip", CE.mask_clip(bundle, x, txt)),
        ("selfattn", CE.self_attn(bundle, x)),
        ("game", CE.game(bundle, x, tokens)),
    ]:
        arr = np.asarray(m)
        print(f"{name:10s} [P,P]={arr.shape} sum={arr.sum():.5f}")


if __name__ == "__main__":
    main()
