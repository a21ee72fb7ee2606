"""CI guard for the packaged real-weights golden-parity workflow
(xai_tpu.tools.golden_parity, VERDICT r3 #5).

Pretrained checkpoints cannot be downloaded in this environment, so the
tool is exercised end-to-end on random-init twins saved as torch
checkpoints: the same load -> convert -> build-bundle -> reference-vs-
rebuild -> report path a weight-bearing machine runs, minus the weights.
"""
import json
import os

import numpy as np
import pytest
import torch


def _run(args_list):
    from xai_tpu.tools.golden_parity import build_parser, run_golden_parity
    return run_golden_parity(build_parser().parse_args(args_list))


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpts")
    torch.manual_seed(0)
    from tests.torch_oracles import TorchResNet
    tm = TorchResNet((1, 1, 1, 1), num_classes=1000).eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    torch.save(tm.state_dict(), d / "TINY_R.pth")

    from tests import reference_loader as rl
    vt = rl.load_vit_new_timm()
    vm = vt.VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                              depth=3, num_heads=4, num_classes=13).eval()
    with torch.no_grad():
        vm.cls_token.normal_(0, 0.5)
        vm.pos_embed.normal_(0, 0.5)
        vm.head.weight.normal_(0, 0.2)
        vm.head.bias.normal_(0, 0.2)
    torch.save(vm.state_dict(), d / "TINY_V.pth")

    # openai-format CLIP twin through the Game_MM fork's own class (same
    # shape-inference path _build_tiny_c uses); saved HALF like the real
    # openai checkpoints so the fp16-checkpoint load path is exercised
    mm = rl.load_mm_clip_model()
    torch.manual_seed(0)
    cm = mm.CLIP(16, 32, 6, 64, 8, 12, 50, 64, 1, 2)
    torch.save({k: v.half() for k, v in cm.state_dict().items()},
               d / "TINY_C.pth")
    return d


def test_golden_parity_cnn_twin(ckpt_dir, tmp_path):
    out = str(tmp_path / "report_cnn")
    res = _run(["--checkpoints", str(ckpt_dir), "--models", "TINY_R",
                "--methods", "ig,lig,idgi,agi", "--synthetic", "2",
                "--steps", "6", "--out", out])
    assert res["ok"], res["summary"]
    rows = [json.loads(l) for l in open(out + ".jsonl")]
    assert len(rows) == 8 and all("error" not in r for r in rows)
    assert all(r["rel_linf"] <= 1e-3 or r["method"] == "agi"
               for r in rows), rows
    md = open(out + ".md").read()
    assert "PASS" in md and "FAIL" not in md


def test_golden_parity_vit_twin(ckpt_dir, tmp_path):
    out = str(tmp_path / "report_vit")
    res = _run(["--checkpoints", str(ckpt_dir), "--models", "TINY_V",
                "--methods", "rollout,cam_attn,bi_attn,t_attr",
                "--synthetic", "1", "--steps", "5", "--out", out])
    assert res["ok"], res["summary"]
    rows = [json.loads(l) for l in open(out + ".jsonl")]
    assert len(rows) == 4 and all("error" not in r for r in rows)
    assert all(r["spearman"] > 0.99 for r in rows), rows


def test_golden_parity_cnn_registry_surface(ckpt_dir, tmp_path):
    """The VERDICT-r4 #3 extension: reference-in-repo rows verify, captum
    rows surface as documented SKIPs on captum-less machines."""
    out = str(tmp_path / "report_cnn2")
    res = _run(["--checkpoints", str(ckpt_dir), "--models", "TINY_R",
                "--methods", "idg,sg,gig,xrai,lime,gc", "--synthetic", "1",
                "--steps", "6", "--out", out])
    assert res["ok"], res["summary"]
    rows = [json.loads(l) for l in open(out + ".jsonl")]
    by = {r["method"]: r for r in rows}
    assert "error" not in by["idg"] and "error" not in by["xrai"]
    assert by["lime"]["rel_linf"] <= 2e-3
    try:
        # mirror the tool's predicate: a sys.modules stub without __file__
        # (installed by reference_loader for earlier driver-parity tests)
        # is NOT a usable captum
        import captum.attr as _ca
        have_captum = bool(getattr(_ca, "__file__", None))
    except ImportError:
        have_captum = False
    if have_captum:
        assert "rel_linf" in by["gc"]
    else:
        assert "captum" in by["gc"]["skip"]


def test_golden_parity_vit_method_families(ckpt_dir, tmp_path):
    """TIS/ViT-CX/MDA/calibrate/mac/InFlow golden rows on the tiny twin
    (shared-centroid / shared-noise / shared-segment protocols)."""
    out = str(tmp_path / "report_vit2")
    res = _run(["--checkpoints", str(ckpt_dir), "--models", "TINY_V",
                "--methods", "TIS,VIT_CX,MDA,calibrate,mac,InFlow",
                "--synthetic", "1", "--steps", "5", "--out", out])
    assert res["ok"], res["summary"]
    rows = [json.loads(l) for l in open(out + ".jsonl")]
    assert len(rows) == 6 and all("error" not in r for r in rows)


def test_golden_parity_clip_family(ckpt_dir, tmp_path):
    """The full CLIP registry surface on the fp16 tiny twin; m2ib is the
    one documented SKIP (HF-format model, PARITY.md)."""
    out = str(tmp_path / "report_clip")
    res = _run(["--checkpoints", str(ckpt_dir), "--models", "TINY_C",
                "--synthetic", "1", "--steps", "5", "--out", out])
    assert res["ok"], res["summary"]
    rows = [json.loads(l) for l in open(out + ".jsonl")]
    assert all("error" not in r for r in rows)
    skips = {r["method"] for r in rows if "skip" in r}
    assert skips == {"m2ib"}
    verdicts = {r["method"] for r in rows if "rel_linf" in r}
    assert len(verdicts) == 11, verdicts


def test_golden_parity_missing_checkpoint_is_skipped(ckpt_dir, tmp_path):
    """A model without a checkpoint is reported as skipped, not a crash —
    but a run where EVERY model was skipped verified nothing and must not
    report success (ADVICE r4)."""
    out = str(tmp_path / "report_none")
    res = _run(["--checkpoints", str(ckpt_dir), "--models", "R101",
                "--synthetic", "1", "--steps", "4", "--out", out])
    assert res["summary"] == {} and not res["ok"]


def test_golden_parity_partial_skip_stays_ok(ckpt_dir, tmp_path):
    """One verified model + one skipped model: per-model skip is non-fatal."""
    out = str(tmp_path / "report_partial")
    res = _run(["--checkpoints", str(ckpt_dir), "--models", "TINY_R,R101",
                "--methods", "ig", "--synthetic", "1", "--steps", "4",
                "--out", out])
    assert res["ok"] and list(res["summary"]) == ["TINY_R/ig"]
