"""Sweep-runner coverage of all three drivers (allPertTests/allSanityTests/
allSegTests equivalents) and the old seg driver's --thr / --acc_cutoff flag
semantics (imagenet_seg_eval.py:234,270,393-437)."""
import json

import numpy as np

from xai_tpu.metrics.seg import MAG_VALS, best_threshold, eval_batch


def test_sweep_tables_match_reference_counts():
    from xai_tpu.runners.sweep import PERT_SWEEP, SANITY_SWEEP, SEG_SWEEP
    assert sum(map(len, PERT_SWEEP.values())) == 72   # 84 rows - 12 dead
    assert sum(map(len, SANITY_SWEEP.values())) == 72
    assert sum(map(len, SEG_SWEEP.values())) == 73    # 76 rows - 3 dupes
    # the reference's per-driver MDA-variant choices
    assert "MDA" in PERT_SWEEP["VIT32"]
    assert "MDA_dense" in SANITY_SWEEP["VIT32"]
    assert "MDA" in SANITY_SWEEP["VIT16"]
    assert set(SEG_SWEEP["VIT16"]) >= {"MDA", "MDA_dense"}


def test_sweep_all_drivers_resumable(tmp_path):
    from xai_tpu.runners.sweep import build_parser, run_sweep
    argv = ["--drivers", "all", "--models", "TINY_CNN",
            "--methods", "grad", "--image_count", "1",
            "--synthetic", "1", "--output_dir", str(tmp_path)]
    run_sweep(build_parser().parse_args(argv))

    manifest = tmp_path / "sweep_manifest.jsonl"
    recs = [json.loads(l) for l in manifest.read_text().splitlines()]
    assert {r["driver"] for r in recs} == {"pert", "sanity", "seg"}
    assert all(r["status"] == "ok" for r in recs), recs
    assert all(r["model"] == "TINY_CNN" and r["attr_func"] == "grad"
               for r in recs)

    # resume: a second invocation adds nothing (all three already ok)
    run_sweep(build_parser().parse_args(argv))
    assert len(manifest.read_text().splitlines()) == len(recs)


def test_eval_batch_fixed_threshold_differs_from_mean():
    rs = np.random.RandomState(0)
    sal = rs.rand(16, 16)
    gt = (rs.rand(16, 16) > 0.5).astype(int)
    mean_out = eval_batch(sal, gt)
    thr_out = eval_batch(sal, gt, thr=0.95)
    # a 0.95 threshold marks far fewer fg pixels than the mean threshold
    assert not np.array_equal(mean_out[2], thr_out[2])


def test_best_threshold_picks_separating_magnitude():
    H = 8
    gt = np.zeros((H, H), int)
    gt[:4, :] = 1
    sal = np.zeros((H, H))
    sal[:4, :] = 1.0      # signal exactly on gt
    sal[4:6, :] = 0.6     # distractor band
    scaled, thr = best_threshold(sal, gt)
    assert thr in MAG_VALS
    # chosen threshold must cut the distractor band but keep the signal:
    # rescaled signal = 1/0.65*0.5 ~ 0.769, band ~ 0.462
    assert 0.462 < thr < 0.769
    out = eval_batch(scaled, gt, thr=thr, normalized=True)
    inter, union = out[2], out[3]
    assert np.allclose(inter / union, 1.0)  # perfect IoU at that threshold


def test_seg_eval_acc_cutoff_and_thr(tmp_path):
    from xai_tpu.runners.imagenet_seg_eval import build_parser, run
    base = ["--model", "TINY_CNN", "--method", "grad", "--image_count", "2",
            "--synthetic", "2", "--dataset_path", "unused",
            "--output_dir", str(tmp_path)]
    # random-weight TINY_CNN is never >99.999% confident -> all skipped
    skipped = run(build_parser().parse_args(
        base + ["--acc_cutoff", "99.999"]))
    assert skipped["pixAcc"] == 0.0 and skipped["mAP"] == 0.0
    # cutoff 0 processes the images
    out = run(build_parser().parse_args(base + ["--acc_cutoff", "0"]))
    assert out["pixAcc"] > 0.0
    # --thr fixes the fg/bg split away from the mean threshold
    out_thr = run(build_parser().parse_args(
        base + ["--acc_cutoff", "0", "--thr", "0.95"]))
    assert out_thr != out


def test_patch_count_cnn_fallback():
    from xai_tpu.runners.imagenet_seg_eval import _patch_count

    class _Meta:
        num_patches = None

    class _Bundle:
        meta = _Meta()

    assert _patch_count(_Bundle()) == 196
    _Meta.num_patches = 7
    assert _patch_count(_Bundle()) == 49

def test_seg_driver_image_batch_matches_sequential(tmp_path):
    """evaluate_imagenet_seg --image_batch (fused attribution + tail flush)
    == the sequential loop, down to the TXT artifact (VERDICT r3 #6)."""
    from xai_tpu.runners.evaluate_imagenet_seg import (build_parser,
                                                       evaluate_imagenet_seg)
    base = ["--model", "TINY_CNN", "--attr_func", "ig", "--image_count",
            "3", "--synthetic", "3", "--dataset_path", "unused"]
    seq = evaluate_imagenet_seg(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "seq")]))
    bat = evaluate_imagenet_seg(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "bat"),
                "--image_batch", "2"]))
    assert set(seq) == set(bat) == {"pixAcc", "mIoU", "mAP", "mF1"}
    for k in seq:
        assert abs(seq[k] - bat[k]) < 5e-4, (k, seq[k], bat[k])
    txt_s = (tmp_path / "seq" / "TINY_CNN" / "ig_3_images").read_text()
    txt_b = (tmp_path / "bat" / "TINY_CNN" / "ig_3_images").read_text()
    assert txt_s == txt_b


def test_seg_eval_image_batch_matches_sequential(tmp_path):
    """imagenet_seg_eval --image_batch == sequential (acc_cutoff gate runs
    BEFORE buffering, so the batch sees exactly the kept images)."""
    from xai_tpu.runners.imagenet_seg_eval import build_parser, run
    base = ["--model", "TINY_CNN", "--method", "ig", "--image_count", "3",
            "--synthetic", "3", "--dataset_path", "unused",
            "--acc_cutoff", "0"]
    seq = run(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "seq")]))
    bat = run(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "bat"),
                "--image_batch", "2"]))
    for k in seq:
        assert abs(seq[k] - bat[k]) < 5e-4, (k, seq[k], bat[k])
    txt_s = (tmp_path / "seq" / "TINY_CNN_ig.txt").read_text()
    txt_b = (tmp_path / "bat" / "TINY_CNN_ig.txt").read_text()
    assert txt_s == txt_b


def test_seg_eval_image_batch_unbatched_method_fallback(tmp_path):
    """A method with no batched implementation (shap) under --image_batch
    falls back to the per-image path inside the buffer, same scores."""
    from xai_tpu.runners.imagenet_seg_eval import build_parser, run
    base = ["--model", "TINY_CNN", "--method", "shap", "--image_count", "2",
            "--synthetic", "2", "--dataset_path", "unused",
            "--acc_cutoff", "0", "--shap_samples", "2"]
    seq = run(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "seq")]))
    bat = run(build_parser().parse_args(
        base + ["--output_dir", str(tmp_path / "bat"),
                "--image_batch", "2"]))
    for k in seq:
        assert abs(seq[k] - bat[k]) < 5e-4, (k, seq[k], bat[k])
