"""Flax CLIP (image + text towers) with tap/probe APIs for the CLIP
explainer stack.

Replaces four vendored CLIP forks (util/attribution_methods/CLIP/
{Game_MM_CLIP, CLIP_Surgery, CLIP_lrp, M2IB} — 6.2k LoC): ONE model serves
all of them because attention maps/gradients come from probes and the
"dense" last-block decomposition (clip_encode_dense,
generate_emap.py:309-377) is a pure function over taps.

Architecture = openai CLIP ViT: visual tower (patch conv, class embedding,
ln_pre, pre-norm blocks with QuickGELU MLPs, ln_post, projection) and text
tower (token embedding, causal blocks, ln_final, projection at the EOT
position).  Weight conversion from the openai state dict naming in
convert/torch_import.py (clip_from_torch).

Classification protocol (evaluatePerturbation.py:68-74): 1000 normalized
"a photo of a {label}" text embeddings; prediction =
softmax(image_embedding @ text_embeddings.T / 0.1) — note the reference
does NOT normalize the image embedding there; reproduced.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ModelBundle, ModelMeta, jit_bundle


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    patch: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    vocab_size: int = 49408
    context_length: int = 77
    img_hw: int = 224

    @property
    def tokens(self) -> int:
        return (self.img_hw // self.patch) ** 2 + 1

    @property
    def grid(self) -> int:
        return self.img_hw // self.patch


CONFIGS = {
    "clip_vit_b16": CLIPConfig(patch=16),
    "clip_vit_b32": CLIPConfig(patch=32),
}
CLI_ARCH = {"CLIP16": "clip_vit_b16", "CLIP32": "clip_vit_b32"}


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None, probe=None):
        B, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="in_proj")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        # attention accumulates/stores in the compute dtype (see
        # vit.Attention): exact f32 in f32 mode, bf16 end-to-end in the
        # opt-in fast path
        pet = x.dtype
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=pet) * hd ** -0.5
        if mask is not None:
            logits = logits + mask.astype(logits.dtype)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        if probe is not None:
            attn = attn + probe.astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=pet).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(self.dim, name="out_proj")(out)
        return out, {"attn": attn, "q": q, "k": k, "v": v}


class CLIPBlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None, probe=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        a, tap = CLIPAttention(self.dim, self.num_heads, name="attn")(
            h, mask, probe)
        x = x + a
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.dim * 4, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.dim, name="mlp_c_proj")(h)
        out = x + h
        tap["block_out"] = out
        return out, tap


class CLIPVisual(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, x, probes=None, taps: bool = False,
                 stop_before_last: bool = False):
        cfg = self.cfg
        B = x.shape[0]
        y = nn.Conv(cfg.vision_width, (cfg.patch, cfg.patch),
                    strides=(cfg.patch, cfg.patch), use_bias=False,
                    name="conv1")(x)
        y = y.reshape(B, -1, cfg.vision_width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.vision_width,))
        y = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.vision_width)), y], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.tokens, cfg.vision_width))
        y = y + pos
        y = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(y)

        tap_list = []
        n_blocks = cfg.vision_layers - (1 if stop_before_last else 0)
        for i in range(n_blocks):
            probe = None
            if probes is not None and "attn" in probes:
                probe = probes["attn"][i]
            y, tap = CLIPBlock(cfg.vision_width, cfg.vision_heads,
                               name=f"block{i}")(y, probe=probe)
            tap_list.append(tap)
        if stop_before_last:
            return y

        y = nn.LayerNorm(epsilon=1e-5, name="ln_post")(y)
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (cfg.vision_width, cfg.embed_dim))
        emb = y @ proj
        if taps:
            stacked = {k: jnp.stack([t[k] for t in tap_list])
                       for k in tap_list[0]}
            return emb, stacked
        return emb


class CLIPText(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, text, probes=None, taps: bool = False):
        cfg = self.cfg
        B, L = text.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.text_width))
        y = tok[text]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.text_width))
        y = y + pos[:L]
        mask = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)

        tap_list = []
        for i in range(cfg.text_layers):
            probe = None
            if probes is not None and "attn" in probes:
                probe = probes["attn"][i]
            y, tap = CLIPBlock(cfg.text_width, cfg.text_heads,
                               name=f"block{i}")(y, mask=mask, probe=probe)
            tap_list.append(tap)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_final")(y)
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (cfg.text_width, cfg.embed_dim))
        eot = jnp.argmax(text, axis=-1)
        emb = y[jnp.arange(B), eot] @ proj
        if taps:
            stacked = {k: jnp.stack([t[k] for t in tap_list])
                       for k in tap_list[0]}
            return emb, stacked
        return emb


class CLIP(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.visual = CLIPVisual(self.cfg)
        self.text = CLIPText(self.cfg)
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(4.6052), ())

    def encode_image(self, x, probes=None, taps=False,
                     stop_before_last=False):
        return self.visual(x, probes=probes, taps=taps,
                           stop_before_last=stop_before_last)

    def encode_text(self, t, probes=None, taps=False):
        return self.text(t, probes=probes, taps=taps)

    def __call__(self, x, t, vis_probes=None, txt_probes=None,
                 taps: bool = False):
        if taps:
            img, vtap = self.visual(x, probes=vis_probes, taps=True)
            txt, ttap = self.text(t, probes=txt_probes, taps=True)
        else:
            img = self.visual(x, probes=vis_probes)
            txt = self.text(t, probes=txt_probes)
        img_n = img[:, 0] / jnp.linalg.norm(img[:, 0], axis=-1,
                                            keepdims=True)
        txt_n = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img_n @ txt_n.T
        if taps:
            return logits_per_image, logits_per_image.T, vtap, ttap
        return logits_per_image, logits_per_image.T


def zero_probes(cfg: CLIPConfig, tower: str = "visual", batch: int = 1,
                seq: Optional[int] = None) -> dict:
    if tower == "visual":
        return {"attn": jnp.zeros((cfg.vision_layers, batch,
                                   cfg.vision_heads, cfg.tokens,
                                   cfg.tokens))}
    seq = seq or cfg.context_length
    return {"attn": jnp.zeros((cfg.text_layers, batch, cfg.text_heads, seq,
                               seq))}


def make_bundle(arch_or_cli: str, params=None, key=None, text_embeddings=None,
                batch_size: int = 25) -> ModelBundle:
    """text_embeddings: [1000, embed_dim] normalized class-prompt table.
    The bundle's ``apply`` returns similarities / 0.1 as 'logits' so the
    generic metric battery (softmax of logits) reproduces get_CLIP_pred."""
    arch = CLI_ARCH.get(arch_or_cli, arch_or_cli)
    cfg = CONFIGS[arch]
    model = CLIP(cfg)
    if params is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        # init on CPU: avoids a slow accelerator compile of the init graph
        from .common import init_on_cpu
        params = init_on_cpu(lambda: model.init(
            key, jnp.zeros((1, cfg.img_hw, cfg.img_hw, 3)),
            jnp.zeros((1, 8), jnp.int32))["params"])
    meta = ModelMeta(name=arch_or_cli, family="clip", img_hw=cfg.img_hw,
                     num_patches=cfg.grid, batch_size=batch_size,
                     mean=(0.48145466, 0.4578275, 0.40821073),
                     std=(0.26862954, 0.26130258, 0.27577711))

    def encode_image(p, x):
        emb = model.apply({"params": p}, x, method=CLIP.encode_image)
        return emb[:, 0]

    if text_embeddings is None:
        key2 = jax.random.PRNGKey(7)
        te = jax.random.normal(key2, (1000, cfg.embed_dim))
        text_embeddings = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    text_embeddings = jnp.asarray(text_embeddings)

    def apply(p, x):
        # similarities at temperature 0.1 (evaluatePerturbation.py:68-74)
        return encode_image(p, x) @ text_embeddings.T / 0.1

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True,
                           method=CLIP.encode_image)

    def apply_probed(p, x, probes):
        return model.apply({"params": p}, x, probes=probes, taps=True,
                           method=CLIP.encode_image)

    extras = {"cfg": cfg, "model": model,
              "text_embeddings": text_embeddings,
              "encode_image": encode_image}
    return jit_bundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, apply_probed=apply_probed,
                       extras=extras)


def class_prompt_tokens(labels=None) -> "jnp.ndarray":
    """Tokenize the reference's 1000-class prompt table "a photo of a
    {label}" with the real BPE vocab (evaluatePerturbation.py:698-704)."""
    from ..data.tokenizer import default_tokenizer, imagenet_class_names
    labels = labels if labels is not None else imagenet_class_names()
    return default_tokenizer().tokenize(
        [f"a photo of a {label}" for label in labels])


def attach_text_table(bundle: ModelBundle, tokens=None,
                      chunk: int = 125) -> ModelBundle:
    """Build the real class-prompt text-embedding table and rebind the
    bundle's similarity closure to it.

    The reference encodes 1000 "a photo of a {label}" prompts once at driver
    startup and classifies via softmax(img·textᵀ/0.1)
    (evaluatePerturbation.py:698-704, 68-74).  Here the per-prompt loop is a
    chunked jitted text-tower batch.  Also stores the [1000, 77] token table
    in ``extras['text_tokens_table']`` so token-consuming explainers
    (game/lrp/rollout) receive the REAL prompt ids instead of round-1's
    placeholders.
    """
    import dataclasses

    import numpy as np

    model = bundle.extras["model"]
    if tokens is None:
        tokens = class_prompt_tokens()
    tokens = np.asarray(tokens, np.int32)

    enc = jax.jit(lambda p, t: model.apply({"params": p}, t,
                                           method=CLIP.encode_text))
    embs = []
    for i in range(0, len(tokens), chunk):
        embs.append(np.asarray(enc(bundle.params,
                                   jnp.asarray(tokens[i:i + chunk]))))
    te = jnp.asarray(np.concatenate(embs))
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)

    encode_image = bundle.extras["encode_image"]

    def apply(p, x):
        return encode_image(p, x) @ te.T / 0.1

    extras = dict(bundle.extras)
    extras.update(text_embeddings=te, text_tokens_table=tokens)
    return dataclasses.replace(bundle, apply=apply, extras=extras)
