"""Cross-round golden regression fixtures: deterministic method outputs and
battery scores for fixed seeds, frozen in tests/golden/.  Catches silent
semantic drift between build rounds.  Regenerate (deliberately) with:
    python tests/test_golden.py --regen
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from tiny_models import tiny_bundle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_methods.npz")
HW = 16


def _compute():
    from xai_tpu.methods import gradient as G
    from xai_tpu.metrics import run_battery
    from xai_tpu.ops.blur import make_blur_fn

    b = tiny_bundle(hw=HW, seed=7)
    rs = np.random.RandomState(123)
    x = jnp.asarray(rs.randn(HW, HW, 3), jnp.float32)
    t = 4
    out = {
        "ig": np.asarray(G.ig(b, x, t, steps=20, chunk=10)),
        "lig": np.asarray(G.ig(b, x, t, steps=20, alpha_star=0.9,
                               chunk=10)),
        "idg": np.asarray(G.idg(b, x, t, steps=20, chunk=10)),
        "idgi": np.asarray(G.idgi(b, x, t, steps=20, baseline=0.1,
                                  chunk=10)),
        "grad": np.asarray(G.grad(b, x, t)),
    }
    sal = G.to_saliency(out["ig"])
    scores = run_battery(b.apply, b.params, np.asarray(x), sal,
                         make_blur_fn(5, 5.0), chunk=17)
    out["battery"] = np.asarray([scores[k] for k in sorted(scores)])
    return out


def test_golden_methods():
    # a missing fixture is a FAILURE, not a seed opportunity: silently
    # regenerating would turn this regression test into a no-op
    assert os.path.exists(GOLDEN), (
        f"golden fixture {GOLDEN} missing — it is committed to the repo; "
        "regenerate deliberately with: python tests/test_golden.py --regen")
    got = _compute()
    want = np.load(GOLDEN)
    for k in want.files:
        np.testing.assert_allclose(got[k], want[k], rtol=0, atol=2e-4,
                                   err_msg=k)


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **_compute())
        print("regenerated", GOLDEN)
