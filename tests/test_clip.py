"""CLIP model parity (torch oracle) + explainer tests on a small config."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from xai_tpu.convert import clip_from_torch
from xai_tpu.models import clip as clipmod
from xai_tpu.methods import clip_explain as CE


# ---------------------------------------------------------------------------
# torch oracle: minimal openai-CLIP-compatible model (naming + eval math)
# ---------------------------------------------------------------------------

class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class OracleBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d, d * 4))
        self.mlp.add_module("gelu", QuickGELU())
        self.mlp.add_module("c_proj", nn.Linear(d * 4, d))

    def forward(self, x, mask=None):  # x: LND
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class OracleCLIP(nn.Module):
    def __init__(self, patch=8, w=32, layers=2, heads=4, e=16, tw=16,
                 th=2, tl=2, vocab=50, ctx=12, img=32):
        super().__init__()
        self.visual = nn.Module()
        self.visual.conv1 = nn.Conv2d(3, w, patch, patch, bias=False)
        n = (img // patch) ** 2 + 1
        self.visual.class_embedding = nn.Parameter(torch.randn(w) * 0.02)
        self.visual.positional_embedding = nn.Parameter(
            torch.randn(n, w) * 0.02)
        self.visual.ln_pre = nn.LayerNorm(w)
        self.visual.transformer = nn.Module()
        self.visual.transformer.resblocks = nn.ModuleList(
            [OracleBlock(w, heads) for _ in range(layers)])
        self.visual.ln_post = nn.LayerNorm(w)
        self.visual.proj = nn.Parameter(torch.randn(w, e) * 0.05)
        self.token_embedding = nn.Embedding(vocab, tw)
        self.positional_embedding = nn.Parameter(torch.randn(ctx, tw) * 0.01)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [OracleBlock(tw, th) for _ in range(tl)])
        self.ln_final = nn.LayerNorm(tw)
        self.text_projection = nn.Parameter(torch.randn(tw, e) * 0.05)
        self.logit_scale = nn.Parameter(torch.tensor(4.6052))

    def encode_image(self, x):
        v = self.visual
        y = v.conv1(x).flatten(2).transpose(1, 2)
        cls = v.class_embedding[None, None].expand(y.shape[0], 1, -1)
        y = torch.cat([cls, y], 1) + v.positional_embedding
        y = v.ln_pre(y).permute(1, 0, 2)
        for blk in v.transformer.resblocks:
            y = blk(y)
        y = y.permute(1, 0, 2)
        return v.ln_post(y) @ v.proj

    def encode_text(self, t):
        y = self.token_embedding(t) + self.positional_embedding[:t.shape[1]]
        L = t.shape[1]
        mask = torch.full((L, L), float("-inf")).triu(1)
        y = y.permute(1, 0, 2)
        for blk in self.transformer.resblocks:
            y = blk(y, mask)
        y = self.ln_final(y.permute(1, 0, 2))
        eot = t.argmax(-1)
        return y[torch.arange(t.shape[0]), eot] @ self.text_projection


@pytest.fixture(scope="module")
def small_pair():
    torch.manual_seed(0)
    tm = OracleCLIP().eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    params = clip_from_torch(sd, vision_layers=2, text_layers=2)
    cfg = clipmod.CLIPConfig(patch=8, vision_width=32, vision_layers=2,
                             vision_heads=4, embed_dim=16, text_width=16,
                             text_heads=2, text_layers=2, vocab_size=50,
                             context_length=12, img_hw=32)
    jm = clipmod.CLIP(cfg)
    return tm, jm, params, cfg


def test_clip_image_tower_parity(small_pair):
    tm, jm, params, cfg = small_pair
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm.encode_image(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x),
                              method=clipmod.CLIP.encode_image))
    assert np.max(np.abs(got - ref)) < 2e-4, np.max(np.abs(got - ref))


def test_clip_text_tower_parity(small_pair):
    tm, jm, params, cfg = small_pair
    t = np.array([[1, 5, 9, 49, 0, 0], [3, 7, 49, 0, 0, 0]], np.int64)
    with torch.no_grad():
        ref = tm.encode_text(torch.from_numpy(t)).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(t),
                              method=clipmod.CLIP.encode_text))
    assert np.max(np.abs(got - ref)) < 2e-4, np.max(np.abs(got - ref))


@pytest.fixture(scope="module")
def clip_bundle(small_pair):
    _, jm, params, cfg = small_pair
    key = jax.random.PRNGKey(3)
    te = jax.random.normal(key, (10, cfg.embed_dim))
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    from xai_tpu.models.common import ModelBundle, ModelMeta
    meta = ModelMeta(name="smallclip", family="clip", img_hw=32,
                     num_patches=4, num_classes=10)

    def encode_image(p, x):
        return jm.apply({"params": p}, x,
                        method=clipmod.CLIP.encode_image)[:, 0]

    def apply(p, x):
        return encode_image(p, x) @ te.T / 0.1

    def apply_taps(p, x):
        return jm.apply({"params": p}, x, taps=True,
                        method=clipmod.CLIP.encode_image)

    extras = {"cfg": cfg, "model": jm, "text_embeddings": te,
              "encode_image": encode_image}
    return ModelBundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, extras=extras)


def test_encode_dense_consistency(clip_bundle):
    """The decomposed last block with 1-head attention must reproduce the
    clip_encode_dense contract: outputs from the dense path use 1-head attn
    so they differ from the true forward, but shapes/finiteness hold and
    v_final excludes CLS."""
    x = jnp.asarray(np.random.RandomState(1).randn(32, 32, 3), jnp.float32)
    d = CE.encode_dense(clip_bundle, x)
    N = clip_bundle.extras["cfg"].tokens
    assert d.outputs.shape == (1, N, 16)
    assert d.v_final.shape == (1, N - 1, 16)
    assert d.attn.shape == (1, N, N)
    assert np.allclose(np.asarray(d.attn.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.parametrize("fn,kwargs", [
    ("grad_eclip", {}),
    ("grad_eclip", {"withgrad": False}),
    ("grad_eclip", {"withksim": False}),
    ("mask_clip", {}),
    ("clip_grad_cam", {}),
])
def test_dense_explainers(clip_bundle, fn, kwargs):
    x = jnp.asarray(np.random.RandomState(2).randn(32, 32, 3), jnp.float32)
    txt = clip_bundle.extras["text_embeddings"][0]
    m = getattr(CE, fn)(clip_bundle, x, txt, **kwargs)
    assert m.shape == (4, 4)
    assert np.isfinite(np.asarray(m)).all()


def test_selfattn_and_game_and_lrp(clip_bundle):
    x = jnp.asarray(np.random.RandomState(3).randn(32, 32, 3), jnp.float32)
    m = CE.self_attn(clip_bundle, x)
    assert m.shape == (4, 4)
    toks = jnp.asarray([[1, 4, 9, 49, 0, 0]], jnp.int32)
    g = CE.game(clip_bundle, x, toks)
    assert g.shape == (4, 4)
    assert np.isfinite(np.asarray(g)).all()
    _, rel = CE.clip_lrp(clip_bundle, x, toks)
    assert rel.shape == (4, 4)
    ro = CE.clip_rollout(clip_bundle, x, toks)
    assert ro.shape == (4, 4)
