"""Cross-round golden fixtures for the ViT explainer stack."""
import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "vit_methods.npz")


def _bundle():
    from xai_tpu.models import vit as vitmod
    from xai_tpu.models.common import ModelBundle, ModelMeta
    cfg = vitmod.ViTConfig(patch=8, embed_dim=32, depth=3, num_heads=4,
                           num_classes=13, img_hw=32)
    model = vitmod.VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(11),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    meta = ModelMeta(name="g", family="vit", img_hw=32, num_classes=13,
                     num_patches=4)
    return ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: model.apply({"params": p}, x),
        apply_taps=lambda p, x: model.apply({"params": p}, x, taps=True),
        apply_probed=lambda p, x, pr: model.apply({"params": p}, x,
                                                  probes=pr, taps=True),
        extras=cfg)


def _compute():
    from xai_tpu.methods import vit_explain as VE
    from xai_tpu.methods.vit_lrp import transformer_attribution

    b = _bundle()
    x = jnp.asarray(np.random.RandomState(42).randn(1, 32, 32, 3),
                    jnp.float32)
    t = 6
    return {
        "rollout": np.asarray(VE.rollout(b, x)),
        "n_rollout": np.asarray(VE.naive_rollout(b, x)),
        "bi_attn": np.asarray(VE.bidirectional(b, x, t, steps=4,
                                               start_layer=2)),
        "t_attn": np.asarray(VE.transition_attention(b, x, t, steps=4)),
        "rave": np.asarray(VE.rave(b, x, t)),
        "t_attr": np.asarray(transformer_attribution(b, x, t)),
    }


def test_golden_vit_methods():
    assert os.path.exists(GOLDEN), (
        f"golden fixture {GOLDEN} missing — regenerate deliberately with: "
        "python tests/test_golden_vit.py --regen")
    got = _compute()
    want = np.load(GOLDEN)
    for k in want.files:
        np.testing.assert_allclose(got[k], want[k], rtol=0, atol=5e-4,
                                   err_msg=k)


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **_compute())
        print("regenerated", GOLDEN)
