"""M2IB — multi-modal information bottleneck attribution
(util/attribution_methods/CLIP/M2IB/scripts/{iba,methods}.py).

A variational bottleneck t = lambda*h + (1-lambda)*eps (eps ~ N(0,1)) is
inserted after visual block `vlayer` (default 9); lambda = sigmoid(alpha) is
Adam-optimized (lr=1, 10 steps, 10 noise samples) against
beta * KL[N(lambda*h, (1-lambda)^2) || N(0,1)] - cos(text_emb, image_emb);
the saliency is the per-token KL capacity, CLS dropped, upsampled and
minmax-normalized (iba.py:89-196, methods.py:46-70).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import clip as clipmod


def _visual_prefix(model, cfg, params, x, n_blocks):
    """Run embedding + first n_blocks of the visual tower -> hidden [B,N,W].

    Reuses the model by running all blocks but capturing the tap; cheap
    enough and keeps one source of truth for the math."""
    _, taps = model.apply({"params": params}, x, taps=True,
                          method=clipmod.CLIP.encode_image)
    return taps["block_out"][n_blocks - 1]


def _visual_suffix(cfg, params, h, start_block):
    from .clip_surgery import _ln, _mlp, _mha
    vp = params["visual"]
    y = h
    for i in range(start_block, cfg.vision_layers):
        blk = vp[f"block{i}"]
        hh = _ln(y, blk["ln_1"])
        _, a_ori = _mha(hh, blk["attn"], cfg.vision_heads)
        y = y + a_ori
        y = y + _mlp(_ln(y, blk["ln_2"]), blk)
    y = _ln(y, vp["ln_post"]) @ vp["proj"]
    return y[:, 0]


def vision_heatmap_iba(bundle, x, txt_emb, vlayer: int = 9,
                       beta: float = 0.1, steps: int = 10, lr: float = 1.0,
                       batch_size: int = 10, key=None, noises=None,
                       out_hw: int = None) -> np.ndarray:
    """m2ib_clip_map equivalent. Returns the minmax-normalized [H, W] map.

    ``noises`` ([steps, batch_size, N, W]) injects the per-step bottleneck
    eps draws — the torch-RNG-capture oracle pattern
    (tests/test_reference_parity_m2ib.py); default fresh jax PRNG samples.
    ``out_hw`` sets the upsample size (the reference hardcodes 224,
    iba.py:155; default: the input's resolution)."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    key = key if key is not None else jax.random.PRNGKey(0)
    cfg = bundle.extras["cfg"]
    model = bundle.extras["model"]
    txt = jnp.asarray(txt_emb)
    if txt.ndim == 1:
        txt = txt[None]
    out_hw = out_hw or x.shape[1]
    if noises is None:
        h_shape = (cfg.tokens, cfg.vision_width)
        keys = jax.random.split(key, steps)
        noises = jax.vmap(lambda k: jax.random.normal(
            k, (batch_size,) + h_shape))(keys)

    up = np.asarray(_iba_jit(model, cfg, vlayer, steps, beta,
                             lr, out_hw, bundle.params, x, txt,
                             jnp.asarray(noises)))
    return (up - up.min()) / (up.max() - up.min())


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _iba_jit(model, cfg, vlayer, steps, beta, lr, hw, params, x, txt,
             noises):
    """The whole IBA optimization as one dispatch: prefix encode, a
    lax.scan of `steps` Adam updates on the bottleneck, saliency from the
    capacity of the LAST forward — i.e. the alpha before the final update,
    exactly what the reference's buffer_capacity retains after its loop
    (iba.py:180-188: forward -> backward -> step, buffer from the forward)."""
    h = _visual_prefix(model, cfg, params, x, vlayer + 1)         # [1,N,W]
    alpha0 = jnp.full((1,) + h.shape[1:], 5.0)
    opt = optax.adam(lr)

    def capacity(lam):
        mu = h * lam
        var = (1 - lam) ** 2
        return -0.5 * (1 + jnp.log(var) - mu ** 2 - var)

    def loss_fn(a, eps):
        lam = jax.nn.sigmoid(a)
        cap = capacity(lam)
        t = h * lam + (1 - lam) * eps
        emb = _visual_suffix(cfg, params, t, vlayer + 1)
        emb_n = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        txt_n = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        fitting = (emb_n * txt_n).sum(-1).mean()
        return beta * cap.mean() - fitting

    def step(carry, eps):
        alpha, opt_state = carry
        cap_fwd = capacity(jax.nn.sigmoid(alpha))   # this forward's buffer
        g = jax.grad(loss_fn)(alpha, eps)
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(alpha, updates), opt_state), cap_fwd

    (_, _), caps = jax.lax.scan(step, (alpha0, opt.init(alpha0)), noises)

    cap = caps[-1][0]                              # [N, W]
    sal = jnp.nan_to_num(cap).sum(-1)[1:]          # drop CLS
    p = cfg.grid
    sal = sal.reshape(1, p, p)
    return jax.image.resize(sal, (1, hw, hw), method="linear")[0]
