"""--image_batch path: batched scores must equal the sequential run."""
import numpy as np


def test_image_batch_matches_sequential(tmp_path):
    import jax
    from xai_tpu.runners.evaluate_perturbation import (build_parser,
                                                       evaluate_perturbation)

    base = ["--model", "TINY_CNN", "--attr_func", "grad", "--image_count",
            "4", "--synthetic", "4"]
    seq = evaluate_perturbation(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "seq")]))
    bat = evaluate_perturbation(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "bat"),
                "--image_batch", "2"]))
    assert set(seq) == set(bat)
    for k in seq:
        assert abs(seq[k] - bat[k]) < 2e-5, (k, seq[k], bat[k])


def test_image_batch_ig_with_tail(tmp_path):
    """Batched IG (fused sweep) + a partial tail batch == sequential."""
    from xai_tpu.runners.evaluate_perturbation import (build_parser,
                                                       evaluate_perturbation)

    base = ["--model", "TINY_CNN", "--attr_func", "ig", "--image_count",
            "5", "--synthetic", "5"]
    seq = evaluate_perturbation(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "seq")]))
    bat = evaluate_perturbation(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "bat"),
                "--image_batch", "2"]))
    for k in seq:
        assert abs(seq[k] - bat[k]) < 5e-4, (k, seq[k], bat[k])


def test_image_batch_bf16_close(tmp_path):
    """--attr_dtype bf16 battery scores stay close to f32 (AUCs are
    integrals over 225-point curves; bf16 sweep noise barely moves them)."""
    from xai_tpu.runners.evaluate_perturbation import (build_parser,
                                                       evaluate_perturbation)

    base = ["--model", "TINY_CNN", "--attr_func", "ig", "--image_count",
            "2", "--synthetic", "2", "--image_batch", "2"]
    f32 = evaluate_perturbation(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "a")]))
    b16 = evaluate_perturbation(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "b"),
                "--attr_dtype", "bf16"]))
    for k in f32:
        assert abs(f32[k] - b16[k]) < 0.05, (k, f32[k], b16[k])


def test_sanity_image_batch_matches_sequential(tmp_path):
    """evaluate_sanity --image_batch (batched attribution on BOTH weight
    sets + tail flush) == the sequential loop."""
    from xai_tpu.runners.evaluate_sanity import build_parser, evaluate_sanity

    base = ["--model", "TINY_CNN", "--attr_func", "ig", "--image_count",
            "3", "--synthetic", "3"]
    seq = evaluate_sanity(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "seq")]))
    bat = evaluate_sanity(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "bat"),
                "--image_batch", "2"]))
    assert set(seq) == set(bat) == {"SSIM", "SPR", "HOG"}
    for k in seq:
        assert abs(seq[k] - bat[k]) < 5e-4, (k, seq[k], bat[k])
