"""Full-driver CPU smoke runs with the TINY model entries: exercises the
complete CLI -> stream -> gates -> attribution -> battery -> CSV paths."""
import csv
import os

import numpy as np
import pytest


def test_evaluate_perturbation_tiny(tmp_path):
    from xai_tpu.runners.evaluate_perturbation import (build_parser,
                                                       evaluate_perturbation)
    args = build_parser().parse_args(
        ["--model", "TINY_CNN", "--attr_func", "grad", "--image_count",
         "2", "--synthetic", "2", "--output_dir", str(tmp_path)])
    scores = evaluate_perturbation(args)
    assert set(scores) >= {"MAS_ins", "MAS_del", "MONO_pos"}
    csv_path = tmp_path / "TINY_CNN" / "grad_2_images.csv"
    assert csv_path.exists()
    rows = dict()
    with open(csv_path) as f:
        for k, v in csv.reader(f):
            rows[k] = float(v)
    assert "Attr Avg Runtime" in rows and "Total Runtime" in rows
    assert abs(rows["MAS_ins"] - scores["MAS_ins"]) < 1e-9


def test_evaluate_sanity_tiny(tmp_path):
    from xai_tpu.runners.evaluate_sanity import build_parser, evaluate_sanity
    args = build_parser().parse_args(
        ["--model", "TINY_CNN", "--attr_func", "grad", "--image_count",
         "1", "--synthetic", "1", "--output_dir", str(tmp_path)])
    out = evaluate_sanity(args)
    assert set(out) == {"SSIM", "SPR", "HOG"}
    assert all(np.isfinite(v) for v in out.values())


def test_evaluate_imagenet_seg_tiny(tmp_path):
    from xai_tpu.runners.evaluate_imagenet_seg import (build_parser,
                                                       evaluate_imagenet_seg)
    args = build_parser().parse_args(
        ["--model", "TINY_CNN", "--attr_func", "grad", "--image_count",
         "2", "--synthetic", "2", "--output_dir", str(tmp_path)])
    out = evaluate_imagenet_seg(args)
    assert set(out) == {"pixAcc", "mIoU", "mAP", "mF1"}
    txt = tmp_path / "TINY_CNN" / "grad_2_images"
    assert txt.exists()
    assert "Mean IoU" in txt.read_text()


def test_randomize_family_branches():
    import jax
    import jax.numpy as jnp
    from xai_tpu.runners.evaluate_sanity import randomize_family

    params = {
        "conv": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.zeros(8)},
        "fc": {"kernel": jnp.ones((8, 4)), "bias": jnp.ones(4)},
        "token_embedding": jnp.ones((10, 4)),
    }
    key = jax.random.PRNGKey(0)

    cnn = randomize_family(params, "cnn", key)
    assert not np.allclose(np.asarray(cnn["conv"]["kernel"]), 1.0)
    assert not np.allclose(np.asarray(cnn["fc"]["kernel"]), 1.0)
    # CNN randomization keeps biases/embeddings (reference only re-inits
    # conv/linear weights, evaluateSanity.py:108-120)
    assert np.allclose(np.asarray(cnn["fc"]["bias"]), 1.0)
    assert np.allclose(np.asarray(cnn["token_embedding"]), 1.0)

    vit = randomize_family(params, "vit", key)
    for leaf in [vit["conv"]["kernel"], vit["fc"]["bias"],
                 vit["token_embedding"]]:
        assert not np.allclose(np.asarray(leaf), np.asarray(leaf) * 0 + 1)

    clip = randomize_family(params, "clip", key)
    assert not np.allclose(np.asarray(clip["fc"]["kernel"]), 1.0)
    assert np.allclose(np.asarray(clip["fc"]["bias"]), 0.0)  # zeroed
    assert not np.allclose(np.asarray(clip["token_embedding"]), 1.0)
    # conv (4-D) untouched for CLIP
    assert np.allclose(np.asarray(clip["conv"]["kernel"]), 1.0)


def test_evaluate_imagenet_seg_batched_matches(tmp_path):
    """--image_batch fused attribution path == sequential seg scores
    (incl. a partial tail batch: 3 images, batch 2)."""
    from xai_tpu.runners.evaluate_imagenet_seg import (build_parser,
                                                       evaluate_imagenet_seg)
    base = ["--model", "TINY_CNN", "--attr_func", "ig", "--image_count",
            "3", "--synthetic", "3"]
    seq = evaluate_imagenet_seg(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "a")]))
    bat = evaluate_imagenet_seg(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "b"), "--image_batch", "2"]))
    for k in seq:
        assert abs(seq[k] - bat[k]) < 1e-6, (k, seq[k], bat[k])


def test_qualitative_generation_tiny(tmp_path):
    from xai_tpu.runners.qualitative_generation import build_parser, generate
    args = build_parser().parse_args(
        ["--model", "TINY_CNN", "--image_count", "1", "--synthetic", "1",
         "--methods", "grad,ig", "--output_dir", str(tmp_path)])
    generate(args)
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert len(pngs) == 1
