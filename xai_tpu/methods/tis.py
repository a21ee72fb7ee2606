"""TIS — Transformer Input Sampling (util/attribution_methods/TIS.py,
vendored from aenglebert/Transformer_Input_Sampling).

Pipeline (TIS.py:59-365): concat all block outputs along features ->
[n_activations, n_tokens] -> KMeans(n_masks clusters) on activation rows ->
centroid top-50% tokens as binary masks -> score each mask by a forward
that KEEPS only CLS+selected tokens (token dropping after pos embed) ->
saliency = score-weighted mask sum / coverage, minmax-normalized.

TPU design: KMeans is jitted Lloyd iterations on device; the token-drop
forwards batch via vmap over the mask axis (every mask keeps the same
token count, so shapes are static).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3))
def kmeans(points, key, n_clusters: int, iters: int = 50):
    """Lloyd's algorithm, euclidean, random-point init — the functional
    equivalent of fast_pytorch_kmeans (TIS.py:151-155).
    points: [P, D] -> centroids [n_clusters, D]."""
    P = points.shape[0]
    idx = jax.random.choice(key, P, (n_clusters,), replace=False)
    centroids = points[idx]

    def step(c, _):
        # argmin of ||p - c||^2 == argmin of (||c||^2 - 2 p.c): the matmul
        # form rides the MXU; the broadcast-subtract form materializes a
        # [P, K, D] intermediate (~7 GB/iter for ViT-B's 9216x1024x196).
        # HIGHEST precision: ||c||^2 and 2 p.c are both ~||p||^2 while
        # their difference is tiny, so default-precision (bf16-pass)
        # matmul error can flip near-tie assignments even in f32 mode.
        d = (c * c).sum(-1)[None, :] - 2.0 * jnp.matmul(
            points, c.T, precision=jax.lax.Precision.HIGHEST)   # [P, K]
        assign = jnp.argmin(d, axis=1)
        one = jax.nn.one_hot(assign, c.shape[0], dtype=points.dtype)
        counts = one.sum(0)
        sums = one.T @ points
        newc = jnp.where(counts[:, None] > 0, sums /
                         jnp.maximum(counts[:, None], 1), c)
        return newc, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


@functools.partial(jax.jit, static_argnums=(0, 4))
def _token_drop_scores(apply_tokens, params, x, indices, chunk, target):
    """indices: [M, K] token indices to keep; returns softmax[target] per
    mask via chunked vmapped token-dropped forwards."""
    M = indices.shape[0]

    def one_chunk(idx_b):
        def fwd(idx):
            logits = apply_tokens(params, x, idx)
            return jax.nn.softmax(logits[0])[target]
        return jax.vmap(fwd)(idx_b)

    return jax.lax.map(one_chunk,
                       indices.reshape((M // chunk, chunk) +
                                       indices.shape[1:])).reshape(M)


def tis(bundle, x, target=None, n_masks: int = 1024,
        tokens_ratio: float = 0.5, batch_size: int = 64,
        key=None, normalise: bool = True, centroids=None,
        dtype=None) -> jnp.ndarray:
    """Returns the [P, P] token saliency map (TIS.__call__).

    ``centroids`` ([n_masks, n_tokens]) bypasses the on-device KMeans —
    the shared-centroid oracle pattern (tests/test_reference_parity_tis.py;
    kmeans outputs aren't comparable across libraries, everything after
    them is).

    ``dtype=jnp.bfloat16`` runs the 1024 token-dropped scoring forwards
    (the dominant cost) in bf16; the tap forward, KMeans, mask build and
    the weighted sum stay f32."""
    x = jnp.asarray(x)
    if x.ndim == 3:
        x = x[None]
    key = key if key is not None else jax.random.PRNGKey(0)

    logits, taps = bundle.apply_taps(bundle.params, x)
    if target is None:
        target = int(jnp.argmax(logits[0]))

    # encoder activations: concat block outputs on features, drop CLS,
    # transpose -> [L*D, n_tokens] (TIS.py:129-148)
    blocks = taps["block_out"]                      # [L, B, N, D]
    acts = jnp.concatenate([blocks[i, 0] for i in range(blocks.shape[0])],
                           axis=-1)                 # [N, L*D]
    acts = acts[1:].T                               # [L*D, n_tokens]

    n_tokens_total = acts.shape[1]
    if centroids is None:
        centroids = kmeans(acts, key, n_masks)      # [n_masks, n_tokens]
    else:
        centroids = jnp.asarray(centroids)

    k = int(tokens_ratio * n_tokens_total)
    top = jax.lax.top_k(centroids, k)[1]            # [n_masks, k] indices
    masks = jnp.zeros((n_masks, n_tokens_total))
    masks = jax.vmap(lambda m, i: m.at[i].set(1.0))(masks, top)

    chunk = batch_size
    while n_masks % chunk:
        chunk -= 1
    params, x_s = bundle.params, x
    if dtype is not None:
        from .gradient import _cast_params_cached
        params = _cast_params_cached(bundle, dtype)
        x_s = x.astype(dtype)
    scores = _token_drop_scores(bundle.apply_tokens, params, x_s,
                                top, chunk, target)

    raw = jnp.einsum("m,mt->t", scores, masks)
    coverage = masks.sum(axis=0)
    # a token in no centroid's top-k has raw == 0 AND coverage == 0; the
    # reference's raw/coverage (TIS.py:358) turns that into a NaN that
    # poisons the whole map through the max-normalize — clamp so the dead
    # token scores 0 instead (covered tokens have integer coverage >= 1,
    # so this changes nothing for them)
    sal = raw / jnp.maximum(coverage, 1.0)
    p = int(n_tokens_total ** 0.5)
    sal = sal.reshape(p, p)
    if normalise:
        sal = sal - sal.min()
        sal = sal / sal.max()
    return sal
