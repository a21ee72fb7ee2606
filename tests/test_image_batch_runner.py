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
