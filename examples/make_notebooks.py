"""Generate the .ipynb mirrors of the three example walkthroughs
(XAI_Survey/notebooks/{CNN,ViT,CLIP}_example.ipynb equivalents).

Run: python examples/make_notebooks.py  (rewrites examples/*.ipynb)
"""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def nb(cells):
    out = {"cells": [], "metadata": {
        "kernelspec": {"display_name": "Python 3", "language": "python",
                       "name": "python3"},
        "language_info": {"name": "python", "version": "3.12"}},
        "nbformat": 4, "nbformat_minor": 5}
    for kind, src in cells:
        lines = src.strip("\n").splitlines(keepends=True)
        if kind == "md":
            out["cells"].append({"cell_type": "markdown", "metadata": {},
                                 "source": lines})
        else:
            out["cells"].append({"cell_type": "code", "metadata": {},
                                 "execution_count": None, "outputs": [],
                                 "source": lines})
    return out


SETUP = """
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()) if os.path.basename(os.getcwd()) == "examples" else os.getcwd())
import jax, jax.numpy as jnp
import numpy as np
"""

CNN = [
    ("md", """
# CNN attribution walkthrough (xai_tpu)

The `XAI_Survey/notebooks/CNN_example.ipynb` equivalent: gradient / IG /
LIG / IDG attributions on a ResNet, rendered and scored with the
perturbation battery.  Pass a converted pretrained pytree for real
predictions; random init demonstrates the full pipeline mechanics.
"""),
    ("code", SETUP + """
from xai_tpu.models import resnet
from xai_tpu.methods import gradient as G

bundle = resnet.make_bundle("R50")   # params=... for converted weights
"""),
    ("code", """
# an input image: load_and_preprocess("dog.jpg") with a real file
key = jax.random.PRNGKey(0)
trans_img = np.asarray(jax.random.uniform(key, (224, 224, 3)))
x = (trans_img - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
target, prob = bundle.predict(np.asarray(x)[None])
print(f"predicted class {target} (p={prob:.4f})")
"""),
    ("code", """
maps = {
    "grad": G.to_saliency(G.grad(bundle, x, target)),
    "ig":   G.to_saliency(G.ig(bundle, x, target, steps=50)),
    "lig":  G.to_saliency(G.ig(bundle, x, target, steps=50, alpha_star=0.9)),
    "idg":  G.to_saliency(G.idg(bundle, x, target, steps=50)),
}
"""),
    ("code", """
from xai_tpu.metrics import run_battery
from xai_tpu.ops import make_blur_fn
blur = make_blur_fn()
for name, sal in maps.items():
    scores = run_battery(bundle.apply, bundle.params, np.asarray(x), sal, blur)
    print(f"{name:5s} MAS_ins={scores['MAS_ins']:.4f} MAS_del={scores['MAS_del']:.4f}")
"""),
    ("code", """
import matplotlib.pyplot as plt
from xai_tpu.utils.visualization import attr_to_subplot
fig, axs = plt.subplots(1, len(maps) + 1, figsize=(15, 3))
attr_to_subplot(trans_img, "input", axs[0], original_image=True)
for ax, (name, sal) in zip(axs[1:], maps.items()):
    attr_to_subplot(sal[..., None], name, ax)
fig.tight_layout()
"""),
]

VIT = [
    ("md", """
# ViT attribution walkthrough (xai_tpu)

The `ViT_example.ipynb` equivalent: attention explainers (raw attention,
rollout, transition attention, bidirectional, InFlow) and MDA with the
driver's adaptive blur on a ViT-B/16.
"""),
    ("code", SETUP + """
from xai_tpu.models import vit
from xai_tpu.methods import vit_explain as VE
from xai_tpu.ops.resize import resize_bilinear

bundle = vit.make_bundle("VIT16")
trans_img = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (224, 224, 3)))
x = jnp.asarray(trans_img * 2 - 1)
target = int(jnp.argmax(bundle.apply(bundle.params, x[None])[0]))
print("target:", target)
"""),
    ("code", """
maps = {
    "raw attn": VE.raw_attn(bundle, x),
    "rollout":  VE.rollout(bundle, x),
    "t_attn":   VE.transition_attention(bundle, x, target),
    "bi_attn":  VE.bidirectional(bundle, x, target),
    "InFlow":   VE.rave(bundle, x, target),
}
for name, m in maps.items():
    up = np.abs(np.asarray(resize_bilinear(m, (224, 224))))
    print(f"{name:8s} map sum={up.sum():.4f} peak={up.max():.6f}")
"""),
    ("code", """
# MDA with the driver's adaptive blur (evaluatePerturbation.py:243-263)
from xai_tpu.methods.mda import mda
from xai_tpu.ops import make_blur_fn

klen = 31
while True:
    blur_fn = jax.jit(make_blur_fn(klen, float(klen)))
    probs = jax.nn.softmax(bundle.apply(bundle.params, blur_fn(x[None]))[0])
    if float(probs[target]) * 100 <= 1 or klen > 101:
        break
    klen += 4
prior = VE.bidirectional(bundle, x, target)
prior3 = np.repeat(np.asarray(resize_bilinear(prior, (224, 224)))[..., None], 3, -1)
m = mda(bundle, trans_img, x, prior3, 16, blur_fn, target=target)  # 196 for paper budget
print("MDA map sum:", float(np.abs(m).sum()))
"""),
]

CLIP = [
    ("md", """
# CLIP attribution walkthrough (xai_tpu)

The `CLIP_example.ipynb` equivalent: Grad-ECLIP / MaskCLIP / self-attention
/ GAME heatmaps for an (image, caption) pair on CLIP ViT-B/16.
"""),
    ("code", SETUP + """
from xai_tpu.models import clip as clipmod
from xai_tpu.methods import clip_explain as CE

bundle = clipmod.make_bundle("CLIP16")
x = jax.random.normal(jax.random.PRNGKey(0), (224, 224, 3)) * 0.5
"""),
    ("code", """
# caption embedding: with the bundled BPE vocab this is the real tokenizer
from xai_tpu.data.tokenizer import SimpleTokenizer
tok = SimpleTokenizer()   # bundled BPE vocab
tokens = jnp.asarray(tok.tokenize(["a photo of a dog"]))
model = bundle.extras["model"]
txt = model.apply({"params": bundle.params}, tokens, method=clipmod.CLIP.encode_text)
txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
"""),
    ("code", """
for name, m in [
    ("grad_eclip", CE.grad_eclip(bundle, x, txt)),
    ("maskclip",   CE.mask_clip(bundle, x, txt)),
    ("selfattn",   CE.self_attn(bundle, x)),
    ("game",       CE.game(bundle, x, tokens)),
]:
    arr = np.asarray(m)
    print(f"{name:10s} [P,P]={arr.shape} sum={arr.sum():.5f}")
"""),
]


def main():
    for name, cells in [("cnn_example.ipynb", CNN),
                        ("vit_example.ipynb", VIT),
                        ("clip_example.ipynb", CLIP)]:
        path = os.path.join(HERE, name)
        with open(path, "w") as f:
            json.dump(nb(cells), f, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()
