"""ViT-CX — causal explanation via clustered feature-map masks
(util/attribution_methods/ViT_CX/: ViT_CX.py + causal_score.py, vendored
from vaynexie/CausalX-ViT).

Pipeline: feature maps = last block's norm1 output tokens reshaped to
[D, P, P] -> bilinear upsample to input size -> per-row minmax masks ->
pairwise cosine similarity -> complete-linkage agglomerative clustering at
distance threshold 0.1 (sklearn, host) -> cluster-sum masks, row-normalized
-> causal scoring: softmax(x*M + noise*(1-M)) - softmax(x + noise*(1-M)) +
class_p, mask-weighted (causal_score.py:18-59).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.cluster import AgglomerativeClustering


def _norm_rows(m):
    mn = m.min(axis=1, keepdims=True)
    mx = m.max(axis=1, keepdims=True)
    return (m - mn) / (mx - mn)


@functools.partial(jax.jit, static_argnums=(0, 5))
def _causal_scores(apply_fn, params, x, masks, noise, chunk, class_p,
                   target):
    """masks: [K, H, W]; returns saliency [H, W] for target."""
    K, H, W = masks.shape

    def probs(xb):
        return jax.nn.softmax(apply_fn(params, xb), axis=-1)

    def one_chunk(args):
        mb, nb = args
        noisy = nb * (1.0 - mb[..., None])
        masked = x[None] * mb[..., None] + noisy
        orig = x[None] + noisy
        pm = probs(masked)[:, target]
        po = probs(orig)[:, target]
        return pm - po + class_p

    pad = (-K) % chunk
    masks_p = jnp.concatenate([masks, jnp.zeros((pad, H, W))])
    noise_p = jnp.concatenate([noise, jnp.zeros((pad, H, W, 3))])
    diffs = jax.lax.map(
        one_chunk,
        (masks_p.reshape((-1, chunk, H, W)),
         noise_p.reshape((-1, chunk, H, W, 3)))).reshape(-1)[:K]

    mask_div = masks / masks.sum(axis=0, keepdims=True)
    sal = jnp.einsum("k,khw->hw", diffs, mask_div)
    return sal / K


def vit_cx(bundle, x, target=None, distance_threshold: float = 0.1,
           gpu_batch: int = 50, key=None, noise=None) -> np.ndarray:
    """Returns the minmax-normalized [H, W] map the driver consumes
    (evaluatePerturbation.py:231-235).

    ``noise``: optional pre-drawn [K, H, W, 3] Gaussian noise (already
    scaled by 0.1) overriding the key-based draw — used by the direct
    parity test to share torch.randn samples with the reference's
    causal_score (causal_score.py:30)."""
    x = jnp.asarray(x)
    if x.ndim == 4:
        x = x[0]
    H = x.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)

    logits, taps = bundle.apply_taps(bundle.params, x[None])
    probs0 = jax.nn.softmax(logits[0])
    if target is None:
        target = int(jnp.argmax(probs0))
    class_p = float(probs0[target])

    # feature maps: last block norm1 output, tokens -> [D, P, P]
    feat = taps["norm1_out"][-1][0, 1:]             # [P*P, D]
    P = int(feat.shape[0] ** 0.5)
    fmap = feat.reshape(P, P, -1).transpose(2, 0, 1)  # [D, P, P]
    up = jax.image.resize(fmap, (fmap.shape[0], H, H), method="linear")
    masks = _norm_rows(np.asarray(up.reshape(fmap.shape[0], H * H)))

    # pairwise cosine similarity -> distance -> complete-link clustering
    norms = np.linalg.norm(masks, axis=1)
    sim = (masks @ masks.T) / np.maximum(np.outer(norms, norms), 1e-12)
    sim = np.nan_to_num(sim)
    dist = 1.0 - sim
    cl = AgglomerativeClustering(n_clusters=None,
                                 distance_threshold=distance_threshold,
                                 metric="precomputed", linkage="complete")
    labels = cl.fit(dist).labels_
    K = labels.max() + 1
    cluster_masks = np.zeros((K, H * H), dtype=np.float32)
    for i, l in enumerate(labels):
        cluster_masks[l] += masks[i]
    cluster_masks = _norm_rows(cluster_masks).reshape(K, H, H)

    if noise is None:
        noise = jax.random.normal(key, (K, H, H, 3)) * 0.1
    else:
        noise = jnp.asarray(noise)
        assert noise.shape == (K, H, H, 3), (noise.shape, K)
    chunk = min(gpu_batch, K)
    sal = _causal_scores(bundle.apply, bundle.params, x,
                         jnp.asarray(cluster_masks), noise, chunk, class_p,
                         target)
    sal = np.asarray(sal)
    return (sal - sal.min()) / (sal.max() - sal.min())
