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
                   target, real_k=None):
    """masks: [K, H, W]; returns saliency [H, W] for target.  ``real_k``:
    number of REAL masks when the stack is zero-padded to a bucket size
    (zero masks contribute nothing to the einsum; only the final 1/K
    normalization must use the true count)."""
    K, H, W = masks.shape
    real_k = K if real_k is None else real_k

    def probs(xb):
        return jax.nn.softmax(apply_fn(params, xb).astype(jnp.float32),
                              axis=-1)

    def one_chunk(args):
        mb, nb = args
        noisy = nb * (1.0 - mb[..., None])
        masked = x[None] * mb[..., None] + noisy
        orig = x[None] + noisy
        pm = probs(masked)[:, target]
        po = probs(orig)[:, target]
        return pm - po + class_p

    pad = (-K) % chunk
    masks_p = jnp.concatenate([masks, jnp.zeros((pad, H, W), masks.dtype)])
    noise_p = jnp.concatenate([noise, jnp.zeros((pad, H, W, 3),
                                                noise.dtype)])
    diffs = jax.lax.map(
        one_chunk,
        (masks_p.reshape((-1, chunk, H, W)),
         noise_p.reshape((-1, chunk, H, W, 3)))).reshape(-1)[:K]

    mask_div = masks / masks.sum(axis=0, keepdims=True)
    sal = jnp.einsum("k,khw->hw", diffs, mask_div)
    return sal / real_k


@functools.partial(jax.jit, static_argnums=(0, 3))
def _masks_and_sim_jit(apply_taps, params, xb, H):
    """-> (row-minmaxed masks [D, H*H], cosine similarity [D, D], probs)."""
    logits, taps = apply_taps(params, xb)
    probs0 = jax.nn.softmax(logits[0])
    feat = taps["norm1_out"][-1][0, 1:]             # [P*P, D]
    P = int(feat.shape[0] ** 0.5)
    fmap = feat.reshape(P, P, -1).transpose(2, 0, 1)  # [D, P, P]
    up = jax.image.resize(fmap, (fmap.shape[0], H, H), method="linear")
    m = up.reshape(fmap.shape[0], H * H)
    mn = m.min(axis=1, keepdims=True)
    mx = m.max(axis=1, keepdims=True)
    masks = (m - mn) / (mx - mn)
    norms = jnp.linalg.norm(masks, axis=1)
    sim = (masks @ masks.T) / jnp.maximum(jnp.outer(norms, norms), 1e-12)
    return masks, sim, probs0


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _cluster_and_score_jit(apply_fn, chunk, Kp, params, x, masks, labels,
                           noise, class_p, target, real_k):
    """Cluster-sum masks via segment_sum (padded to Kp), row-minmax, then
    the causal scoring sweep — all one dispatch."""
    cm = jax.ops.segment_sum(masks, labels, num_segments=Kp)
    mn = cm.min(axis=1, keepdims=True)
    mx = cm.max(axis=1, keepdims=True)
    cm = jnp.where(mx > mn, (cm - mn) / jnp.where(mx > mn, mx - mn, 1.0),
                   0.0)
    H = x.shape[0]
    return _causal_scores(apply_fn, params, x, cm.reshape(Kp, H, H), noise,
                          chunk, class_p, target, real_k=real_k)


def vit_cx(bundle, x, target=None, distance_threshold: float = 0.1,
           gpu_batch: int = 50, key=None, noise=None,
           dtype=None) -> np.ndarray:
    """Returns the minmax-normalized [H, W] map the driver consumes
    (evaluatePerturbation.py:231-235).

    ``noise``: optional pre-drawn [K, H, W, 3] Gaussian noise (already
    scaled by 0.1) overriding the key-based draw — used by the direct
    parity test to share torch.randn samples with the reference's
    causal_score (causal_score.py:30).

    ``dtype=jnp.bfloat16`` runs the ~2K causal-scoring forwards (the
    roofline: ~380 ViT-B forwards per image, >95% of the method's time) on
    the bf16 MXU path; softmaxes and the mask-weighted sum stay f32.
    Saliency orderings are rank-stable; keep f32 for bit-parity work."""
    x = jnp.asarray(x)
    if x.ndim == 4:
        x = x[0]
    H = x.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)

    # masks + their pairwise cosine similarity stay ON DEVICE: the
    # upsampled feature-map masks are [D, H, H] (~150 MB for ViT-B) and the
    # similarity matmul is ~60 GFLOP — transferring the masks to host and
    # multiplying in numpy used to cost ~9 s/image; only the [D, D]
    # similarity (2 MB) comes back for sklearn's clustering.
    masks, sim, probs0 = _masks_and_sim_jit(bundle.apply_taps,
                                            bundle.params, x[None], H)
    if target is None:
        target = int(jnp.argmax(probs0))
    class_p = float(probs0[target])
    dist = 1.0 - np.nan_to_num(np.asarray(sim))
    # sklearn's complete-linkage clusterer, exactly as the reference
    # (ViT_CX.py:92-107).  scipy's fcluster computes the same algorithm
    # ~5x faster but the feature-map masks are tie-rich (near-identical
    # columns), and tie-breaking order changes cluster membership — the
    # direct oracle pins the sklearn behavior.
    cl = AgglomerativeClustering(n_clusters=None,
                                 distance_threshold=distance_threshold,
                                 metric="precomputed", linkage="complete")
    labels = cl.fit(dist).labels_
    K = int(labels.max()) + 1
    # pad the cluster count to a bucket so the jit shapes repeat across
    # images (K varies per image; every distinct K would recompile the
    # scoring sweep).  Padded slots sum zero masks and contribute nothing.
    bucket = 64
    Kp = ((K + bucket - 1) // bucket) * bucket

    if noise is None:
        noise_b = jax.random.normal(key, (Kp, H, H, 3)) * 0.1
    else:
        noise = jnp.asarray(noise)
        assert noise.shape == (K, H, H, 3), (noise.shape, K)
        noise_b = jnp.concatenate(
            [noise, jnp.zeros((Kp - K, H, H, 3))])
    chunk = min(gpu_batch, bucket)
    params = bundle.params
    if dtype is not None:
        from .gradient import _cast_params_cached
        params = _cast_params_cached(bundle, dtype)
        x = x.astype(dtype)
        masks = masks.astype(dtype)
        noise_b = noise_b.astype(dtype)
    sal = _cluster_and_score_jit(bundle.apply, chunk, Kp, params, x,
                                 masks, jnp.asarray(labels, jnp.int32),
                                 noise_b, class_p, target, K)
    sal = np.asarray(sal)
    return (sal - sal.min()) / (sal.max() - sal.min())
