"""Cross-round golden fixtures for the CLIP explainer stack."""
import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "clip_methods.npz")


def _bundle():
    from xai_tpu.models import clip as clipmod
    from xai_tpu.models.common import ModelBundle, ModelMeta

    cfg = clipmod.CLIPConfig(patch=8, vision_width=32, vision_layers=2,
                             vision_heads=4, embed_dim=16, text_width=16,
                             text_heads=2, text_layers=2, vocab_size=50,
                             context_length=12, img_hw=32)
    jm = clipmod.CLIP(cfg)
    params = jm.init(jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 3)),
                     jnp.zeros((1, 8), jnp.int32))["params"]
    te = jax.random.normal(jax.random.PRNGKey(6), (10, cfg.embed_dim))
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    meta = ModelMeta(name="gclip", family="clip", img_hw=32, num_patches=4,
                     num_classes=10)

    def encode_image(p, x):
        return jm.apply({"params": p}, x,
                        method=clipmod.CLIP.encode_image)[:, 0]

    return ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: encode_image(p, x) @ te.T / 0.1,
        apply_taps=lambda p, x: jm.apply({"params": p}, x, taps=True,
                                         method=clipmod.CLIP.encode_image),
        extras={"cfg": cfg, "model": jm, "text_embeddings": te,
                "encode_image": encode_image})


def _compute():
    from xai_tpu.methods import clip_explain as CE
    from xai_tpu.methods.clip_surgery import surgery_map

    b = _bundle()
    x = jnp.asarray(np.random.RandomState(77).randn(32, 32, 3), jnp.float32)
    txt = b.extras["text_embeddings"][:4]
    toks = jnp.asarray([[49406 % 50, 3, 49, 0]], jnp.int32)
    return {
        "grad_eclip": np.asarray(CE.grad_eclip(b, x, txt[0])),
        "mask_clip": np.asarray(CE.mask_clip(b, x, txt)),
        "self_attn": np.asarray(CE.self_attn(b, x)),
        "game": np.asarray(CE.game(b, x, toks)),
        "clip_rollout": np.asarray(CE.clip_rollout(b, x, toks)),
        "surgery": np.asarray(surgery_map(b, x, txt)),
    }


def test_golden_clip_methods():
    assert os.path.exists(GOLDEN), (
        f"golden fixture {GOLDEN} missing — regenerate deliberately with: "
        "python tests/test_golden_clip.py --regen")
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
