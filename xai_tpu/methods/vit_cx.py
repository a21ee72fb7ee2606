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


def _sim_and_masks(feat, H):
    """feat [P*P, D] -> (row-minmaxed masks [D, H*H], cosine sim [D, D])."""
    P = int(feat.shape[0] ** 0.5)
    fmap = feat.reshape(P, P, -1).transpose(2, 0, 1)  # [D, P, P]
    up = jax.image.resize(fmap, (fmap.shape[0], H, H), method="linear")
    m = up.reshape(fmap.shape[0], H * H)
    mn = m.min(axis=1, keepdims=True)
    mx = m.max(axis=1, keepdims=True)
    masks = (m - mn) / (mx - mn)
    norms = jnp.linalg.norm(masks, axis=1)
    sim = (masks @ masks.T) / jnp.maximum(jnp.outer(norms, norms), 1e-12)
    return masks, sim


@functools.partial(jax.jit, static_argnums=(0, 3))
def _masks_and_sim_jit(apply_taps, params, xb, H):
    """-> (masks [D, H*H], TRIANGLE-PACKED sim [D*(D-1)/2], probs).

    Only the upper triangle of the [D, D] cosine-similarity matrix leaves
    the chip: the matrix is symmetric and complete-linkage clustering reads
    only off-diagonal pairs, so the packed form is bit-identical input at
    half the transfer (1.18 MB vs 2.36 MB for ViT-B's D=768 — the download
    was the single largest cost of the method on the tunnel link)."""
    logits, taps = apply_taps(params, xb)
    probs0 = jax.nn.softmax(logits[0])
    feat = taps["norm1_out"][-1][0, 1:]             # [P*P, D]
    masks, sim = _sim_and_masks(feat, H)
    D = sim.shape[0]
    iu, ju = np.triu_indices(D, k=1)
    tri = sim[jnp.asarray(iu), jnp.asarray(ju)]
    return masks, tri, probs0


def _unpack_tri(tri_h: np.ndarray, D: int) -> np.ndarray:
    """Host inverse of the triangle packing -> symmetric [D, D] with unit
    diagonal (diagonal is ignored by the clusterer)."""
    m = np.ones((D, D), np.float32)
    iu, ju = np.triu_indices(D, k=1)
    m[iu, ju] = tri_h
    m[ju, iu] = tri_h
    return m


def _hc_cut(n_clusters: int, children: np.ndarray,
            n_leaves: int) -> np.ndarray:
    """Exact transliteration of sklearn's ``_hc_cut`` tree cut (heap of
    negated node ids, enumerated in FINAL HEAP ORDER — the numbering is
    part of the contract: cluster index selects the per-cluster noise
    slot downstream)."""
    from heapq import heappush, heappushpop
    nodes = [-(max(children[-1]) + 1)]
    for _ in range(n_clusters - 1):
        these = children[-nodes[0] - n_leaves]
        heappush(nodes, -these[0])
        heappushpop(nodes, -these[1])
    label = np.zeros(n_leaves, dtype=np.intp)
    for i, node in enumerate(nodes):
        stack = [-node]
        desc = []
        while stack:
            nd = stack.pop()
            if nd < n_leaves:
                desc.append(nd)
            else:
                stack.extend(children[nd - n_leaves])
        label[desc] = i
    return label


def _cluster_host(tri_h: np.ndarray, D: int,
                  distance_threshold: float) -> np.ndarray:
    """Complete-linkage agglomerative clustering at a distance threshold,
    label-for-label identical to the reference's sklearn call
    (ViT_CX.py:92-107) — sklearn's precomputed/complete path itself
    delegates the merge tree to ``scipy.cluster.hierarchy.linkage`` and
    labels via ``_hc_cut``; calling scipy directly skips sklearn's
    validate/copy overhead (~2x on the per-image critical path).
    Equality vs sklearn is pinned by test_vit_cx_cluster_matches_sklearn."""
    from scipy.cluster import hierarchy
    from scipy.spatial.distance import squareform

    dist = 1.0 - np.nan_to_num(_unpack_tri(tri_h, D))
    np.fill_diagonal(dist, 0.0)
    out = hierarchy.linkage(squareform(dist, checks=False),
                            method="complete")
    children = out[:, :2].astype(np.intp)
    n_clusters = int(np.count_nonzero(out[:, 2] >= distance_threshold) + 1)
    return _hc_cut(n_clusters, children, D)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _cluster_and_score_jit(apply_fn, chunk, Kp, params, x, masks, labels,
                           noise, class_p, target, real_k):
    """Cluster-sum masks via segment_sum (padded to Kp), row-minmax, then
    the causal scoring sweep and the final minmax normalization — all one
    dispatch (the map comes back already normalized; normalizing on host
    cost an extra blocking read of an un-normalized array)."""
    # cluster-sum as a one-hot matmul rather than segment_sum: the scatter
    # form cost ~33 ms on the [768, 50176] mask stack vs ~7 ms on the MXU
    # (HIGHEST keeps f32-exact accumulation for the oracle tolerances)
    oh = jax.nn.one_hot(labels, Kp, dtype=jnp.float32)       # [D, Kp]
    cm = jnp.einsum("dk,dn->kn", oh, masks.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST).astype(masks.dtype)
    mn = cm.min(axis=1, keepdims=True)
    mx = cm.max(axis=1, keepdims=True)
    cm = jnp.where(mx > mn, (cm - mn) / jnp.where(mx > mn, mx - mn, 1.0),
                   0.0)
    H = x.shape[0]
    sal = _causal_scores(apply_fn, params, x, cm.reshape(Kp, H, H), noise,
                         chunk, class_p, target, real_k=real_k)
    return (sal - sal.min()) / (sal.max() - sal.min())


def _chunk_for(Kp: int, gpu_batch: int) -> int:
    """Largest divisor of Kp that is <= gpu_batch: `lax.map` pads the mask
    stack to a chunk multiple, and with the reference's gpu_batch=50 on a
    64-bucket the padding was 100 scored forwards for 64 real masks."""
    for c in range(min(gpu_batch, Kp), 0, -1):
        if Kp % c == 0:
            return c
    return 1


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
    # multiplying in numpy used to cost ~9 s/image; only the triangle-packed
    # similarity (1.18 MB) comes back for sklearn's clustering.
    masks, tri, probs0 = _masks_and_sim_jit(bundle.apply_taps,
                                            bundle.params, x[None], H)
    if target is None:
        target = int(jnp.argmax(probs0))
    class_p = float(probs0[target])
    # sklearn's complete-linkage clusterer, exactly as the reference
    # (ViT_CX.py:92-107).  scipy's fcluster computes the same algorithm
    # ~5x faster but the feature-map masks are tie-rich (near-identical
    # columns), and tie-breaking order changes cluster membership — the
    # direct oracle pins the sklearn behavior.
    labels = _cluster_host(np.asarray(tri), masks.shape[0],
                           distance_threshold)
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
    chunk = _chunk_for(Kp, gpu_batch)
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
    return np.asarray(sal)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _masks_and_sim_batch_jit(apply_taps, params, H, xb):
    """Vmapped stage A: xb [B, H, W, 3] -> (masks [B, D, H*H],
    packed sims [B, D*(D-1)/2], softmax probs [B, n_classes]) — probs stay
    on device; both the predicted-class and the explicit-targets paths
    read them without another forward."""
    logits, taps = apply_taps(params, xb)
    probs = jax.nn.softmax(logits, axis=-1)
    feats = taps["norm1_out"][-1][:, 1:]            # [B, P*P, D]
    masks, sims = jax.vmap(lambda f: _sim_and_masks(f, H))(feats)
    D = sims.shape[1]
    iu, ju = np.triu_indices(D, k=1)
    tris = sims[:, jnp.asarray(iu), jnp.asarray(ju)]
    return masks, tris, probs


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _cluster_and_score_batch_jit(apply_fn, chunk, Kp, params, xb, masks,
                                 labels, noise, class_p, targets, real_k):
    """Stage B vmapped over images — every image shares the Kp bucket, so
    one dispatch scores B × Kp masks."""
    return jax.vmap(
        lambda x, m, l, n, cp, t, rk: _cluster_and_score_jit.__wrapped__(
            apply_fn, chunk, Kp, params, x, m, l, n, cp, t, rk)
    )(xb, masks, labels, noise, class_p, targets, real_k)


def vit_cx_batch(bundle, xs, targets=None, distance_threshold: float = 0.1,
                 gpu_batch: int = 64, key=None, keys=None,
                 dtype=None) -> np.ndarray:
    """Cross-image batched ViT-CX -> [B, H, W] normalized maps.

    Same math as ``vit_cx`` per image (clustering still host, fed by one
    batched triangle download); the two jits and the two transfers are
    amortized over the batch, which is what the tunnel latency (~30 ms per
    blocking read) punishes hardest.  Cluster counts vary per image — all
    images pad to one shared Kp bucket so stage B is a single vmapped
    dispatch.

    ``keys``: optional per-image PRNG key data [B, 2] — each image's noise
    is drawn exactly as the single-image path draws it (same key, same
    PER-IMAGE bucket, zero-padded to the shared Kp), so batched ==
    sequential even when cluster counts straddle bucket boundaries.
    ``key`` draws one batch-wide stream instead."""
    xs = jnp.asarray(xs)
    B, H = xs.shape[0], xs.shape[1]
    key = key if key is not None else jax.random.PRNGKey(0)

    masks, tris, probs = _masks_and_sim_batch_jit(
        bundle.apply_taps, bundle.params, H, xs)
    tris_h = np.asarray(tris)                       # one blocking download
    D = masks.shape[1]
    labels = np.stack([_cluster_host(tris_h[i], D, distance_threshold)
                       for i in range(B)])
    Ks = labels.max(axis=1) + 1
    bucket = 64
    Kp = int(((Ks.max() + bucket - 1) // bucket) * bucket)

    # both target modes ride the stage-A probs — no extra forward
    if targets is None:
        targets_a = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    else:
        targets_a = jnp.asarray(targets, jnp.int32)
    class_p = jnp.take_along_axis(probs, targets_a[:, None], 1)[:, 0]

    if keys is not None:
        # draw each image's noise at ITS OWN bucket (what the sequential
        # path draws), zero-padded to the shared Kp: with one shared-bucket
        # draw, a single K>64 image would silently change every other
        # image's noise stream vs the sequential run
        keys_a = jnp.asarray(keys, jnp.uint32)
        noise = jnp.zeros((B, Kp, H, H, 3))
        for kp_i in sorted({int(((k + bucket - 1) // bucket) * bucket)
                            for k in Ks}):
            rows = [i for i in range(B)
                    if int(((Ks[i] + bucket - 1) // bucket) * bucket)
                    == kp_i]
            draw = jax.vmap(lambda kk: jax.random.normal(
                kk, (kp_i, H, H, 3)))(keys_a[jnp.asarray(rows)]) * 0.1
            noise = noise.at[jnp.asarray(rows), :kp_i].set(draw)
    else:
        noise = jax.random.normal(key, (B, Kp, H, H, 3)) * 0.1
    params = bundle.params
    if dtype is not None:
        from .gradient import _cast_params_cached
        params = _cast_params_cached(bundle, dtype)
        xs = xs.astype(dtype)
        masks = masks.astype(dtype)
        noise = noise.astype(dtype)
    chunk = _chunk_for(Kp, gpu_batch)
    sal = _cluster_and_score_batch_jit(
        bundle.apply, chunk, Kp, params, xs, masks,
        jnp.asarray(labels, jnp.int32), noise, class_p, targets_a,
        jnp.asarray(Ks, jnp.int32))
    return np.asarray(sal)
