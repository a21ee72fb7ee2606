"""Classic metric-class wrappers + tokenizer + sweep manifest tests."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xai_tpu.metrics.classic import (AICMetric, MASMetric, MonotonicityMetric,
                                     PositiveNegativePerturbation,
                                     RISEMetric)
from xai_tpu.metrics import run_battery
from xai_tpu.ops.blur import make_blur_fn

from tiny_models import tiny_bundle

HW = 16


@pytest.fixture(scope="module")
def setup():
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(0)
    x = rs.randn(HW, HW, 3).astype(np.float32)
    sal = rs.rand(HW, HW)
    return b, x, sal


def test_classic_wrappers_match_battery(setup):
    """The class API must reproduce the fused battery's scores."""
    b, x, sal = setup
    blur = make_blur_fn(5, 5.0)
    scores = run_battery(b.apply, b.params, x, sal, blur, chunk=17)

    from xai_tpu.ops.stats import auc
    mas_ins = MASMetric(b, HW * HW, "ins", HW, blur)
    _, corrected, _, _, norm = mas_ins.single_run(x, sal)
    assert float(auc(corrected)) == pytest.approx(scores["MAS_ins"],
                                                  abs=1e-5)
    assert float(auc(norm)) == pytest.approx(scores["RISE_ins"], abs=1e-5)

    zeros = lambda im: im * 0.0
    mas_del = MASMetric(b, HW * HW, "del", HW, zeros)
    _, corrected, _, _, norm = mas_del.single_run(x, sal)
    assert float(auc(corrected)) == pytest.approx(scores["MAS_del"],
                                                  abs=1e-5)

    aic = AICMetric(b, HW * HW, "ins", HW, blur)
    _, resp = aic.single_run(x, sal)
    assert float(auc(resp)) == pytest.approx(scores["AIC_ins"], abs=1e-5)

    lerf = PositiveNegativePerturbation(b, HW * HW, "lerf", HW, zeros)
    _, resp = lerf.single_run(x, sal)
    assert float(auc(resp)) == pytest.approx(scores["LERF_res"], abs=1e-5)

    mono = MonotonicityMetric(b, HW * HW, "positive", HW, blur)
    _, m = mono.single_run(x, sal)
    assert m == pytest.approx(scores["MONO_pos"], abs=1e-5)

    rise = RISEMetric(b, HW * HW, "del", HW, zeros)
    n, ent, norm = rise.single_run(x, sal)
    assert n == HW + 1
    assert np.isfinite(ent).all()


def test_aic_decision_flip(setup):
    b, x, sal = setup
    zeros = lambda im: im * 0.0
    aic = AICMetric(b, HW * HW, "del", HW, zeros)
    score, resp = aic.single_run(x, sal, decision_flip=True)
    assert 0.0 <= score <= 1.0


def test_tokenizer_without_vocab_roundtrip(tmp_path):
    """Build a minimal BPE vocab and verify encode/tokenize mechanics."""
    import gzip
    from xai_tpu.data.tokenizer import SimpleTokenizer, bytes_to_unicode

    merges = ["#version", "h e", "he l", "hel l", "hell o</w>"]
    p = tmp_path / "bpe.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(merges))
    tok = SimpleTokenizer(str(p), context_length=10)
    ids = tok.tokenize(["hello hello"])
    assert ids.shape == (1, 10)
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    assert ids[0, 0] == sot
    assert eot in ids[0]
    # 'hello' fully merges to one token, twice
    hello_id = tok.encoder["hello</w>"]
    assert list(ids[0][1:3]) == [hello_id, hello_id]


def test_sweep_manifest_resume(tmp_path, monkeypatch):
    from xai_tpu.runners import sweep

    calls = []

    def fake_eval(args):
        calls.append((args.model, args.attr_func))
        return {"MAS_ins": 0.5}

    monkeypatch.setattr("xai_tpu.runners.evaluate_perturbation."
                        "evaluate_perturbation", fake_eval)
    args = sweep.build_parser().parse_args(
        ["--models", "R101", "--image_count", "1", "--synthetic", "1",
         "--output_dir", str(tmp_path)])
    # pre-populate manifest marking the first job done
    with open(tmp_path / "sweep_manifest.jsonl", "w") as f:
        f.write(json.dumps({"model": "R101", "attr_func": "grad",
                            "status": "ok"}) + "\n")
    sweep.run_sweep(args)
    assert ("R101", "grad") not in calls          # resumed past it
    assert ("R101", "ig") in calls
    with open(tmp_path / "sweep_manifest.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert sum(r["status"] == "ok" for r in recs) == len(recs)
