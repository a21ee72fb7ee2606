"""Real-vocab CLIP tokenization + text-table attachment.

The vocab is the bundled ``bpe_simple_vocab_16e6.txt.gz`` (the public data
file every CLIP fork vendors); the oracle is the reference's OWN vendored
tokenizer (CLIP_Surgery/clip/simple_tokenizer.py) imported directly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests import reference_loader as rl
from xai_tpu.data.tokenizer import (class_prompts, default_tokenizer,
                                    imagenet_class_names)


def test_known_openai_token_ids():
    tok = default_tokenizer()
    # golden ids from openai-CLIP's tokenizer for this canonical prompt
    row = tok.tokenize(["a photo of a cat"])[0]
    assert row[:7].tolist() == [49406, 320, 1125, 539, 320, 2368, 49407]
    assert (row[7:] == 0).all()
    assert tok.encoder["<|startoftext|>"] == 49406
    assert tok.encoder["<|endoftext|>"] == 49407


def test_all_class_prompts_match_reference_tokenizer():
    ref = rl.load_clip_tokenizer().SimpleTokenizer()
    tok = default_tokenizer()
    names = imagenet_class_names()
    assert len(names) == 1000
    for p in class_prompts():
        assert tok.encode(p) == ref.encode(p), p


def test_attach_text_table_tiny_clip():
    """attach_text_table rebinds the similarity closure to the encoded
    prompt table and exposes the token table for token-consuming methods."""
    from tests.test_clip import small_pair  # reuse the tiny CLIP pair
    import xai_tpu.models.clip as clipmod
    from xai_tpu.models.common import ModelBundle, ModelMeta

    torch = pytest.importorskip("torch")
    _, jm, params, cfg = small_pair.__wrapped__()

    meta = ModelMeta(name="smallclip", family="clip", img_hw=32,
                     num_patches=4, num_classes=6)

    def encode_image(p, x):
        return jm.apply({"params": p}, x,
                        method=clipmod.CLIP.encode_image)[:, 0]

    def apply(p, x):
        raise AssertionError("must be rebound by attach_text_table")

    bundle = ModelBundle(meta=meta, params=params, apply=apply,
                         extras={"cfg": cfg, "model": jm,
                                 "text_embeddings": None,
                                 "encode_image": encode_image})
    # 6 fake prompts within the tiny vocab (vocab=50, ctx=12)
    tokens = np.zeros((6, 12), np.int32)
    rng = np.random.RandomState(0)
    for i in range(6):
        n = rng.randint(3, 8)
        tokens[i, :n] = rng.randint(1, 48, n)
        tokens[i, n] = 49 % 50  # EOT-like max id for argmax pooling

    b2 = clipmod.attach_text_table(bundle, tokens=tokens, chunk=4)
    assert b2.extras["text_tokens_table"].shape == (6, 12)
    te = b2.extras["text_embeddings"]
    assert te.shape == (6, cfg.embed_dim)
    assert np.allclose(np.linalg.norm(np.asarray(te), axis=-1), 1.0,
                       atol=1e-5)

    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3),
                    jnp.float32)
    sims = np.asarray(b2.apply(params, x))
    expect = np.asarray(encode_image(params, x)) @ np.asarray(te).T / 0.1
    assert np.abs(sims - expect).max() < 1e-5
