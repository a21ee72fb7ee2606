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
    softmax forward.  rows: [S, n_features] 0/1."""
    n = rows.shape[0]

    def one(rows_b):
        def build(row):
            on = row[seg]                             # [H, W] 0/1
            x = jnp.where(on[..., None] == 1, img, fudged)
            if normalize_fn is not None:
                x = normalize_fn(x)
            return x

        xb = jax.vmap(build)(rows_b)
        return jax.nn.softmax(
            apply_fn(params, xb).astype(jnp.float32), axis=-1)

    probs = jax.lax.map(one, rows.reshape(
        (n // chunk, chunk) + rows.shape[1:])).reshape(n, -1)
    # select the explained label ON DEVICE: the full [S, n_classes] probs
    # matrix is ~4 MB and the device->host link (the axon tunnel) is slow;
    # the ridge only needs the top-label column + the all-on row
    label = jnp.argmax(probs[0])
    return probs[0], probs[:, label], label


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
    seg = jnp.asarray(segments)
    imgs_base = jnp.asarray(img)
    fudged = jnp.full_like(imgs_base, hide_color)
    rows = jnp.asarray(data, dtype=jnp.int32)

    pad = (-num_samples) % chunk
    rows_p = jnp.concatenate([rows, jnp.ones((pad, n_features), jnp.int32)])
    # bucket the (image-dependent) segment count so the fused jit compiles
    # once per bucket, not once per image
    col_pad = (-n_features) % 64
    if col_pad:
        rows_p = jnp.concatenate(
            [rows_p, jnp.zeros((rows_p.shape[0], col_pad), jnp.int32)],
            axis=1)

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
