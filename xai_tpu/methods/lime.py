"""LIME image explanation — native reimplementation of the vendored LIME
(util/attribution_methods/lime/: limeAttr.py + lime_image.py + lime_base.py).

Pipeline (driver config, limeAttr.py:23-36): quickshift segments
(kernel_size=4, max_dist=200, ratio=0.2) -> 1000 random binary segment masks
(first = all-on) -> fudged images (off segments -> hide_color 0) -> batched
softmax probs on device -> cosine-distance exponential kernel weights
(width 0.25) -> weighted Ridge (alpha=1, intercept) per top-5 label ->
binary mask of the top-5 positive-weight segments of the top label.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..native import quickshift


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def _lime_probs_jit(apply_fn, params, img, fudged, seg, rows, chunk,
                    normalize_fn):
    """Fused sample scoring: each chunk BUILDS its masked images inside the
    jit (round-2 materialized all 1000 fudged 224^2 images eagerly — a
    ~600 MB round-trip before the forwards even started) and runs the
    softmax forward.  rows: [S, n_features] 0/1.

    The per-pixel on/off plane is ``rows @ one_hot(seg).T`` — a [chunk, F]
    x [F, HW] matmul on the MXU — rather than a 50k-element ``row[seg]``
    gather per sample (TPU gathers serialize; the one-hot products are
    exact 0/1 in any dtype)."""
    n = rows.shape[0]
    H, W = img.shape[:2]
    oh = jax.nn.one_hot(seg.reshape(-1), rows.shape[1], dtype=img.dtype)

    def one(rows_b):
        on = (rows_b.astype(img.dtype) @ oh.T).reshape(-1, H, W)
        xb = jnp.where(on[..., None] > 0.5, img, fudged)
        if normalize_fn is not None:
            xb = normalize_fn(xb)
        return jax.nn.softmax(
            apply_fn(params, xb).astype(jnp.float32), axis=-1)

    probs = jax.lax.map(one, rows.reshape(
        (n // chunk, chunk) + rows.shape[1:])).reshape(n, -1)
    # select the explained label ON DEVICE: the full [S, n_classes] probs
    # matrix is ~4 MB and the device->host link (the axon tunnel) is slow;
    # the ridge only needs the top-label column + the all-on row
    label = jnp.argmax(probs[0])
    return probs[0], probs[:, label], label


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def _lime_probs_batch_jit(apply_fn, params, imgs, fudged, segs, rows, chunk,
                          normalize_fn):
    """Vmapped-over-images form of ``_lime_probs_jit``: imgs [B, H, W, 3],
    segs [B, H, W], rows [B, S, F] (all images padded to one F bucket).
    Each ``lax.map`` step builds and scores a [B * chunk] device batch, so
    B images ride one dispatch instead of B."""
    B, S = rows.shape[:2]
    H, W = imgs.shape[1:3]
    # MXU one-hot matmul instead of a per-sample row[seg] gather (see
    # _lime_probs_jit)
    oh = jax.nn.one_hot(segs.reshape(B, -1), rows.shape[-1],
                        dtype=imgs.dtype)               # [B, HW, F]

    def one(rows_c):                                    # [B, chunk, F]
        on = jnp.einsum("bcf,bnf->bcn", rows_c.astype(imgs.dtype),
                        oh).reshape(B, -1, H, W)
        xb = jnp.where(on[..., None] > 0.5, imgs[:, None], fudged[:, None])
        if normalize_fn is not None:
            xb = normalize_fn(xb)
        flat = xb.reshape((-1,) + xb.shape[2:])
        probs = jax.nn.softmax(
            apply_fn(params, flat).astype(jnp.float32), axis=-1)
        return probs.reshape(B, rows_c.shape[1], -1)

    probs = jax.lax.map(
        one, rows.reshape(B, S // chunk, chunk, -1).transpose(1, 0, 2, 3))
    probs = probs.transpose(1, 0, 2, 3).reshape(B, S, -1)   # [B, S, C]
    labels = jnp.argmax(probs[:, 0, :], axis=-1)            # [B]
    y = jax.vmap(lambda p, l: p[:, l])(probs, labels)       # [B, S]
    return y


def lime_batch(bundle, imgs, keys, num_samples: int = 1000,
               num_features: int = 5, kernel_width: float = 0.25,
               hide_color: float = 0.0, chunk: int = 64,
               normalize_input=None, dtype=None) -> np.ndarray:
    """Cross-image batched LIME: same per-image semantics as ``lime`` with
    ``segmenter='device'`` (same host RNG stream per key), but the
    quickshift stencils and the 1000-sample scoring sweep for all B images
    are each ONE device dispatch.  imgs: [B, H, W, 3] in [0, 1] host array;
    keys: [B, 2] uint32 (or PRNG keys).  Returns [B, H, W] binary masks."""
    from ..ops.quickshift_jax import quickshift_device_batch
    imgs = np.asarray(imgs, dtype=np.float32)
    B = imgs.shape[0]
    # Pallas stencil parents -> one int32 download -> host compaction.
    # (A fully on-device compaction was tried and measured SLOWER: TPU
    # sort/searchsorted/gather on 50k-element maps cost ~96 ms vs ~45 ms
    # download + ~8 ms host numpy; uint8 downloads are pathologically slow
    # over the tunnel, so transfers stay int32.)
    segs = quickshift_device_batch(imgs)                    # [B, H, W]
    n_feats = [int(s.max()) + 1 for s in segs]
    bucket = max(n_feats)
    bucket += (-bucket) % 64

    pad = (-num_samples) % chunk
    # int8 rows: 4x smaller upload, the gather/compare in the jit is
    # dtype-agnostic
    rows_np = np.zeros((B, num_samples + pad, bucket), np.int8)
    datas = []
    for b in range(B):
        karr = jnp.asarray(keys[b])
        if jnp.issubdtype(karr.dtype, jax.dtypes.prng_key):
            karr = jax.random.key_data(karr)
        kw = np.asarray(karr).ravel()
        rs = np.random.RandomState(int(kw[-1]) % (2 ** 31 - 1))
        data = rs.randint(0, 2, num_samples * n_feats[b]).reshape(
            (num_samples, n_feats[b]))
        data[0, :] = 1
        datas.append(data)
        rows_np[b, :num_samples, :n_feats[b]] = data
        rows_np[b, num_samples:, :n_feats[b]] = 1

    params = bundle.params
    imgs_d = jnp.asarray(imgs)
    if dtype is not None:
        from .gradient import _cast_params_cached
        params = _cast_params_cached(bundle, dtype)
        imgs_d = imgs_d.astype(dtype)
    fudged = jnp.full_like(imgs_d, hide_color)
    y = np.asarray(_lime_probs_batch_jit(
        bundle.apply, params, imgs_d, fudged, jnp.asarray(segs),
        jnp.asarray(rows_np), chunk, normalize_input))[:, :num_samples]

    masks = np.zeros(segs.shape, dtype=np.float32)
    for b in range(B):
        data = datas[b]
        norm = np.linalg.norm(data, axis=1)
        cos = data @ data[0] / np.maximum(
            norm * np.linalg.norm(data[0]), 1e-12)
        weights = np.sqrt(np.exp(-((1.0 - cos) ** 2) / kernel_width ** 2))
        coef, _ = _weighted_ridge(data.astype(np.float64), y[b], weights)
        order = np.argsort(np.abs(coef))[::-1]
        count = 0
        for f in order:
            if coef[f] > 0:
                masks[b][segs[b] == f] = 1.0
                count += 1
            if count == num_features:
                break
    return masks


def _weighted_ridge(X, y, w, alpha=1.0):
    """sklearn Ridge(alpha, fit_intercept=True) with sample weights."""
    sw = np.sqrt(w)
    Xw = X * sw[:, None]
    yw = y * sw
    # center by weighted means (intercept handling)
    xm = (X * w[:, None]).sum(0) / w.sum()
    ym = (y * w).sum() / w.sum()
    Xc = (X - xm) * sw[:, None]
    yc = (y - ym) * sw
    A = Xc.T @ Xc + alpha * np.eye(X.shape[1])
    coef = np.linalg.solve(A, Xc.T @ yc)
    intercept = ym - xm @ coef
    return coef, intercept


def lime(bundle, img, key, num_samples: int = 1000, top_labels: int = 5,
         num_features: int = 5, kernel_width: float = 0.25,
         hide_color: float = 0.0, chunk: int = 100,
         normalize_input=None, dtype=None,
         segmenter: str = "device") -> np.ndarray:
    """img: [H, W, 3] float in [0, 1] (the driver feeds the *unnormalized*
    trans_img, limeAttr batch_predict re-normalizes implicitly via model —
    actually the reference feeds raw [0,1] images straight to the model;
    we apply ``normalize_input`` if given to match the bundle's expectations).
    Returns [H, W] binary mask of the top positive segments."""
    img = np.asarray(img, dtype=np.float32)
    if segmenter == "device":
        # quickshift's density + parent stencils run on the chip (~5 ms vs
        # ~150 ms at this host's single-core exp wall); identical segments
        # (tests/test_segment_methods.py device-vs-native check)
        from ..ops.quickshift_jax import quickshift_device
        segments = quickshift_device(img, ratio=0.2, kernel_size=4.0,
                                     max_dist=200.0)
    else:
        segments = quickshift(img, ratio=0.2, kernel_size=4.0,
                              max_dist=200.0)
    seg = jnp.asarray(segments)
    n_features = int(segments.max()) + 1

    # seed host numpy straight from the key's raw words — the former
    # jax.random.randint was an eager device op, i.e. one full tunnel
    # round-trip per attribution just to make a seed
    karr = jnp.asarray(key)
    if jnp.issubdtype(karr.dtype, jax.dtypes.prng_key):
        karr = jax.random.key_data(karr)
    kw = np.asarray(karr).ravel()
    rs = np.random.RandomState(int(kw[-1]) % (2 ** 31 - 1))
    data = rs.randint(0, 2, num_samples * n_features).reshape(
        (num_samples, n_features))
    data[0, :] = 1

    # per-chunk masked-image build + forward, all inside ONE jit
    imgs_base = jnp.asarray(img)
    fudged = jnp.full_like(imgs_base, hide_color)

    # Pad on HOST: data is already host numpy, and an eager jnp.concatenate
    # here has an image-dependent shape (n_features varies per image), so it
    # recompiled a fresh concat program per image (~1.2 s each over the
    # tunnel).  Bucket the segment count so the fused jit compiles once per
    # bucket, not once per image.
    pad = (-num_samples) % chunk
    col_pad = (-n_features) % 64
    rows_np = np.zeros((num_samples + pad, n_features + col_pad), np.int8)
    rows_np[:num_samples, :n_features] = data
    rows_np[num_samples:, :n_features] = 1
    rows_p = jnp.asarray(rows_np)

    params = bundle.params
    if dtype is not None:
        from .gradient import _cast_params_cached
        params = _cast_params_cached(bundle, dtype)
        imgs_base = imgs_base.astype(dtype)
        fudged = fudged.astype(dtype)
    probs0, y, _label = _lime_probs_jit(bundle.apply, params, imgs_base,
                                        fudged, seg, rows_p, chunk,
                                        normalize_input)
    y = np.asarray(y)[:num_samples]

    # cosine distances to the all-on row
    norm = np.linalg.norm(data, axis=1)
    cos = data @ data[0] / np.maximum(norm * np.linalg.norm(data[0]), 1e-12)
    distances = 1.0 - cos
    weights = np.sqrt(np.exp(-(distances ** 2) / kernel_width ** 2))

    coef, _ = _weighted_ridge(data.astype(np.float64), y, weights)

    order = np.argsort(np.abs(coef))[::-1]
    mask = np.zeros(segments.shape, dtype=np.float32)
    count = 0
    for f in order:
        if coef[f] > 0:
            mask[segments == f] = 1.0
            count += 1
        if count == num_features:
            break
    return mask
