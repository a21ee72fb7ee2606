"""Shared runner plumbing: model construction by CLI name, per-image gates,
result CSV writing — the L5 layer (SURVEY §2.13) with the reference's flags.
"""
from __future__ import annotations

import csv
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import resnet, vit
from ..models import clip as clipmod
from ..ops.blur import make_blur_fn
from ..ops.preprocess import (CLIP_MEAN, CLIP_STD, IMAGENET_MEAN,
                              IMAGENET_STD, VIT_MEAN, VIT_STD, normalize)

# reference per-model batch sizes (evaluatePerturbation.py:627-677)
MODEL_TABLE = {
    "R50": ("cnn", 50), "R101": ("cnn", 50), "R152": ("cnn", 50),
    "RNXT": ("cnn", 25),
    "VIT16": ("vit", 25), "VIT32": ("vit", 50),
    "CLIP16": ("clip", 25), "CLIP32": ("clip", 50),
    # test-sized models (1-block-per-stage ResNet / depth-2 ViT) for fast
    # CI runs of the full driver paths
    "TINY_CNN": ("cnn", 50), "TINY_VIT": ("vit", 25),
    # 1-block-per-stage ResNet at 64px, weight-convertible from a torch
    # twin — the driver-vs-driver golden-parity model
    # (tests/test_driver_csv_parity.py)
    "TINY_R": ("cnn", 50),
}


def build_bundle(model_name: str, params_path: Optional[str] = None,
                 seed: int = 0):
    """Construct the bundle for a reference CLI model name.  Pretrained
    weights load from a converted pytree .npz/.msgpack if given; otherwise
    deterministic random init (weights are irrelevant for the engine's
    mechanics and for parity of the pipelines' structure)."""
    family, batch = MODEL_TABLE[model_name]
    key = jax.random.PRNGKey(seed)
    if model_name == "TINY_CNN":
        import dataclasses

        from ..models.common import init_on_cpu

        model = resnet.ResNet(layers=(1, 1, 1, 1))
        p = init_on_cpu(lambda: model.init(
            key, jnp.zeros((1, 224, 224, 3)))["params"])
        b = resnet.make_bundle("resnet50", params=p, batch_size=batch)
        # jit-wrap like jit_bundle does — bare closures here ran the tiny
        # models op-by-op eagerly at every bare bundle.apply call site
        b = dataclasses.replace(
            b, apply=jax.jit(lambda pp, x: model.apply({"params": pp}, x)),
            apply_taps=jax.jit(lambda pp, x: model.apply({"params": pp}, x,
                                                         taps=True)),
            apply_probed=jax.jit(lambda pp, x, pr: model.apply(
                {"params": pp}, x, taps=True, probes=pr)),
            extras={"model": model})
    elif model_name == "TINY_R":
        import dataclasses

        from ..models.common import init_on_cpu, ModelMeta

        model = resnet.ResNet(layers=(1, 1, 1, 1))
        p = init_on_cpu(lambda: model.init(
            key, jnp.zeros((1, 64, 64, 3)))["params"])
        b = resnet.make_bundle("resnet50", params=p, batch_size=batch)
        b = dataclasses.replace(
            b,
            meta=ModelMeta(name="TINY_R", family="cnn", img_hw=64,
                           batch_size=batch),
            apply=jax.jit(lambda pp, x: model.apply({"params": pp}, x)),
            apply_taps=jax.jit(lambda pp, x: model.apply({"params": pp}, x,
                                                         taps=True)),
            apply_probed=jax.jit(lambda pp, x, pr: model.apply(
                {"params": pp}, x, taps=True, probes=pr)),
            extras={"model": model})
    elif model_name == "TINY_VIT":
        b = vit.make_bundle("vit_tiny_patch16_224", key=key,
                            batch_size=batch)
    elif family == "cnn":
        b = resnet.make_bundle(model_name, key=key, batch_size=batch)
    elif family == "clip":
        b = clipmod.make_bundle(model_name, key=key, batch_size=batch)
    else:
        b = vit.make_bundle(model_name, key=key, batch_size=batch)
    if params_path:
        import dataclasses
        b = dataclasses.replace(b, params=load_params(params_path))
    if family == "clip":
        # real class-prompt table (BPE-tokenized + text-tower encoded) —
        # must happen after any params swap so the table uses those weights
        b = clipmod.attach_text_table(b)
    return b


def load_params(path: str):
    """Load a converted params pytree: .npz (flat 'a/b/c' keys), .msgpack
    (flax.serialization), or .pkl/.pickle (explicit opt-in only — pickle
    executes arbitrary code; never feed it untrusted checkpoints)."""
    if path.endswith(".npz"):
        flat = np.load(path)
        tree = {}
        for k, v in flat.items():
            node = tree
            *parents, leaf = k.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = jnp.asarray(v)
        return tree
    if path.endswith(".msgpack"):
        import flax.serialization
        with open(path, "rb") as f:
            return jax.tree.map(jnp.asarray,
                                flax.serialization.msgpack_restore(f.read()))
    if path.endswith((".pkl", ".pickle")):
        import pickle
        with open(path, "rb") as f:
            return pickle.load(f)
    raise ValueError(f"unsupported params format: {path} "
                     "(expected .npz, .msgpack, .pkl)")


def save_params(params, path: str) -> str:
    """Write a params pytree as flat .npz or flax .msgpack."""
    if path.endswith(".npz"):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        arrays = {"/".join(str(getattr(p, "key", p)) for p in kp):
                  np.asarray(v) for kp, v in flat}
        np.savez(path, **arrays)
    elif path.endswith(".msgpack"):
        import flax.serialization
        with open(path, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(
                jax.tree.map(np.asarray, params)))
    else:
        raise ValueError(f"unsupported params format: {path}")
    return path


def clip_extras(bundle, target: int) -> dict:
    """Per-image CLIP attribution context: the target class-prompt embedding
    plus its REAL BPE token ids (the reference tokenizes the caption
    "a photo of a {label}" at evaluatePerturbation.py:388)."""
    te = bundle.extras["text_embeddings"]
    ex = {"txt_emb": te[target][None]}
    tok = bundle.extras.get("text_tokens_table")
    if tok is not None:
        ex["text_tokens"] = tok[target][None]
    return ex


def family_stats(family: str):
    if family == "vit":
        return VIT_MEAN, VIT_STD
    if family == "clip":
        return CLIP_MEAN, CLIP_STD
    return IMAGENET_MEAN, IMAGENET_STD


def normalize_input(trans_img: np.ndarray, family: str) -> jnp.ndarray:
    mean, std = family_stats(family)
    return normalize(jnp.asarray(trans_img), mean, std)


def image_gates(bundle, x, blur_fn, gates: bool = True):
    """The reference's per-image sanity gates
    (evaluatePerturbation.py:561-570): predictions for the original, blurred
    and black images; the image is usable iff blur/black confidences are
    lower and classes differ.  ``gates=False`` (--skip_gates / synthetic
    runs) returns after the first forward — the blur + black probes' ok
    verdict would be discarded anyway."""
    import numpy as _np
    # three jitted dispatches via the bundle's cached probs_fn (eager
    # softmax chains here used to cost ~10 round-trips per image)
    probs = _np.asarray(bundle.probs_fn(bundle.params, x[None])[0])
    target = int(probs.argmax())
    original_pred = float(probs[target])
    if not gates:
        return target, original_pred, True
    bl = _np.asarray(bundle.probs_fn(bundle.params, blur_fn(x[None]))[0])
    blur_class = int(bl.argmax())
    blur_own = float(bl[blur_class])
    bk = _np.asarray(bundle.probs_fn(bundle.params,
                                     jnp.zeros_like(x)[None])[0])
    black_class = int(bk.argmax())
    black_own = float(bk[black_class])
    ok = not (blur_own >= original_pred or black_own >= original_pred
              or target == black_class or target == blur_class)
    return target, original_pred, ok


def write_result_csv(folder: str, file_name: str, counters: dict,
                     images_used: int, attr_time: float, total_time: float):
    """Identical CSV layout to the reference (evaluatePerturbation.py:606-618)."""
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, file_name + ".csv"), "w") as f:
        w = csv.writer(f)
        for k in counters:
            w.writerow([k, str(counters[k] / images_used)])
        w.writerow(["Attr Avg Runtime", str(attr_time / images_used)])
        w.writerow(["Total Runtime", str(total_time)])


def default_blur():
    return jax.jit(make_blur_fn(31, 31.0))


def enable_compilation_cache(path: str = "~/.cache/xai_tpu_jax"):
    """Opt into JAX's persistent compilation cache.  Driver startup is
    compile-dominated (each distinct jit signature is a fresh XLA compile;
    a cold flagship run spends minutes there) — on TPU VMs the cache makes
    repeat runs start in seconds.  A no-op on backends whose PJRT plugin
    can't serialize executables (the remote-tunnel dev backend)."""
    import os
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:                                  # pragma: no cover
        pass
