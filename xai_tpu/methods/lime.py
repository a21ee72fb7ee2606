"""LIME image explanation — native reimplementation of the vendored LIME
(util/attribution_methods/lime/: limeAttr.py + lime_image.py + lime_base.py).

Pipeline (driver config, limeAttr.py:23-36): quickshift segments
(kernel_size=4, max_dist=200, ratio=0.2) -> 1000 random binary segment masks
(first = all-on) -> fudged images (off segments -> hide_color 0) -> batched
softmax probs on device -> cosine-distance exponential kernel weights
(width 0.25) -> weighted Ridge (alpha=1, intercept) per top label ->
binary mask of the top positive-weight segments of the top label.

TPU design: the WHOLE pipeline is one fused jit per image batch —
quickshift stencils (Pallas on TPU), sort-free label compaction
(cumsum-of-roots), on-device mask sampling (threefry), the chunked
scoring sweep, the weighted-ridge normal-equations solve ([F, F] SPD,
F = 512 bucket), top-positive-segment selection, and mask rendering.
The only transfers are the [B, H, W, 3] image upload and a bit-packed
[B, H, W/32] mask download (~25 KB for a 224px batch of 4).  Round 2
moved ~2.6 MB/batch over the ~8 MB/s tunnel (parents down, segments up,
sample rows up, probs down) — the transfer bill alone capped LIME at
~4 attr/s; keeping every intermediate on the chip removes it entirely.

Sampling uses JAX threefry streams (deterministic per key).  The
reference's np.random masks are a different RNG stream by construction;
parity with lime_base.py is distributional + the exact ridge algebra
(test_reference_parity2.py::test_lime_ridge_matches_sklearn drives the
host mirror `_weighted_ridge` against sklearn's Ridge).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# segment-count bucket: quickshift(kernel_size=4, max_dist=200) yields
# ~50-250 segments on 224px natural images; 512 keeps one compile for any
# realistic image (overflow segments merge into the last bucket entry)
_F_MAX = 512

# driver quickshift config (limeAttr.py:23-36)
_QS_RATIO = 0.2
_QS_KERNEL = 4.0
_QS_MAXDIST = 200.0


@functools.partial(jax.jit,
                   static_argnums=(0, 4, 5, 6, 7, 8, 9, 10, 11, 16))
def _lime_fused_jit(apply_fn, params, imgs, keys_u32, normalize_fn,
                    S, chunk, num_features, w, wd, pack, fwd_dtype,
                    hide_color, kernel_width, alpha, rows_inj=None,
                    return_coef=False):
    """imgs: [B, H, W, 3] f32 in [0, 1]; keys_u32: [B, 2] uint32 threefry
    key data.  Returns bit-packed [B, H, W//32] uint32 masks (``pack``)
    or [B, H, W] f32 masks.  ``rows_inj`` ([B, S, F] int8) injects the
    binary sample matrix (golden-parity protocol: the reference vendored
    lime's random_state.randint draws, lime_image.py data_labels).
    ``return_coef`` additionally returns the per-segment signed ridge
    coefficients [B, F] (the quantity the mask selection derives from)."""
    from ..ops.quickshift_jax import (_parents_batch,
                                      parents_to_labels_batch)

    B, H, W = imgs.shape[:3]
    F = _F_MAX

    # 1. segmentation (stencils + sort-free compaction, all on device)
    parents = _parents_batch(
        imgs, w, wd, jnp.float32(_QS_RATIO),
        jnp.float32(1.0 / (2.0 * _QS_KERNEL * _QS_KERNEL)),
        jnp.float32(_QS_MAXDIST * _QS_MAXDIST))
    labels, counts = parents_to_labels_batch(parents)       # [B, HW], [B]
    labels = jnp.minimum(labels, F - 1)

    # 2. per-image binary sample rows (row 0 = all-on, lime_image.py:175)
    def sample(k, cnt):
        key = jax.random.wrap_key_data(k, impl="threefry2x32")
        r = jax.random.randint(key, (S, F), 0, 2,
                               dtype=jnp.int32).astype(jnp.int8)
        colok = (jnp.arange(F) < cnt).astype(jnp.int8)
        r = r * colok
        return r.at[0].set(colok)

    rows = (jax.vmap(sample)(keys_u32, counts) if rows_inj is None
            else jnp.asarray(rows_inj, jnp.int8))           # [B, S, F]

    # 3. chunked scoring sweep: each step BUILDS its masked images on
    # device and runs the softmax forward.  The per-pixel on/off plane is
    # ``rows @ one_hot(labels)^T`` — a [chunk, F] x [F, HW] MXU matmul
    # instead of a 50k-element gather per sample (TPU gathers serialize;
    # the one-hot products are exact 0/1 in any dtype).
    pad = (-S) % chunk
    rows_p = jnp.concatenate(
        [rows, jnp.zeros((B, pad, F), jnp.int8)], axis=1)
    oh = jax.nn.one_hot(labels, F, dtype=fwd_dtype)         # [B, HW, F]
    imgs_c = imgs.astype(fwd_dtype)
    fudged = jnp.full_like(imgs_c, hide_color)

    def one(rows_c):                                        # [B, chunk, F]
        on = jnp.einsum("bcf,bnf->bcn", rows_c.astype(fwd_dtype),
                        oh).reshape(B, -1, H, W)
        xb = jnp.where(on[..., None] > 0.5, imgs_c[:, None],
                       fudged[:, None])
        if normalize_fn is not None:
            xb = normalize_fn(xb)
        flat = xb.reshape((-1,) + xb.shape[2:])
        pr = jax.nn.softmax(
            apply_fn(params, flat).astype(jnp.float32), axis=-1)
        return pr.reshape(B, rows_c.shape[1], -1)

    probs = jax.lax.map(
        one, rows_p.reshape(B, (S + pad) // chunk, chunk,
                            F).transpose(1, 0, 2, 3))
    probs = probs.transpose(1, 0, 2, 3).reshape(B, S + pad, -1)[:, :S]
    cls = jnp.argmax(probs[:, 0, :], axis=-1)               # [B]
    y = jax.vmap(lambda p, l: p[:, l])(probs, cls)          # [B, S]

    # 4. weighted ridge (alpha=1, intercept) via normal equations; padded
    # columns are all-zero -> A's diagonal alpha forces their coef to 0
    def ridge(r, yb, cnt):
        X = r.astype(jnp.float32)
        nrm = jnp.linalg.norm(X, axis=1)
        cos = (X @ (jnp.arange(F) < cnt).astype(jnp.float32)) / \
            jnp.maximum(nrm * jnp.sqrt(cnt.astype(jnp.float32)), 1e-12)
        wgt = jnp.sqrt(jnp.exp(-((1.0 - cos) ** 2) / kernel_width ** 2))
        wsum = wgt.sum()
        xm = (X * wgt[:, None]).sum(0) / wsum
        ym = (yb * wgt).sum() / wsum
        sw = jnp.sqrt(wgt)
        Xc = (X - xm) * sw[:, None]
        yc = (yb - ym) * sw
        A = Xc.T @ Xc + alpha * jnp.eye(F, dtype=jnp.float32)
        return jax.scipy.linalg.solve(A, Xc.T @ yc, assume_a="pos")

    coef = jax.vmap(ridge)(rows, y, counts)                 # [B, F]

    # 5. top-|coef| positive segments until num_features (lime tail)
    def select(c):
        order = jnp.argsort(-jnp.abs(c))
        pos = c[order] > 0
        keep = pos & (jnp.cumsum(pos.astype(jnp.int32)) <= num_features)
        return jnp.zeros((F,), jnp.float32).at[order].set(
            keep.astype(jnp.float32))

    chosen = jax.vmap(select)(coef)                         # [B, F]
    mask = jnp.take_along_axis(chosen, labels, axis=1).reshape(B, H, W)

    if not pack:
        return (mask, coef) if return_coef else mask
    bits = mask.reshape(B, H, W // 32, 32).astype(jnp.uint32)
    weights = jnp.asarray(
        np.uint32(1) << np.arange(32, dtype=np.uint32), jnp.uint32)
    packed = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)
    return (packed, coef) if return_coef else packed


def _key_words(key) -> np.ndarray:
    """PRNGKey / raw [2] uint32 / typed key -> [2] uint32 host words."""
    karr = jnp.asarray(key)
    if jnp.issubdtype(karr.dtype, jax.dtypes.prng_key):
        karr = jax.random.key_data(karr)
    return np.asarray(karr, np.uint32).ravel()[-2:]


def lime_segments(img) -> tuple:
    """The fused pipeline's quickshift labels, exported for the
    golden-parity protocol (the reference run consumes the SAME
    segmentation via segmentation_fn).  Returns ([H, W] int labels,
    segment count), with the same F_MAX clamp the jit applies."""
    from ..ops.quickshift_jax import _parents_batch, parents_to_labels_batch
    imgs = jnp.asarray(np.asarray(img, np.float32))[None]
    w = max(1, int(3.0 * _QS_KERNEL))
    wd = min(w, int(np.ceil(_QS_MAXDIST)))
    parents = _parents_batch(
        imgs, w, wd, jnp.float32(_QS_RATIO),
        jnp.float32(1.0 / (2.0 * _QS_KERNEL * _QS_KERNEL)),
        jnp.float32(_QS_MAXDIST * _QS_MAXDIST))
    labels, counts = parents_to_labels_batch(parents)
    labels = jnp.minimum(labels, _F_MAX - 1)
    H, W = imgs.shape[1:3]
    return (np.asarray(labels[0]).reshape(H, W),
            min(int(counts[0]), _F_MAX))


def lime_batch(bundle, imgs, keys, num_samples: int = 1000,
               num_features: int = 5, kernel_width: float = 0.25,
               hide_color: float = 0.0, chunk: int = 64,
               normalize_input=None, dtype=None, rows=None,
               return_coef: bool = False) -> np.ndarray:
    """Cross-image batched LIME, fully on device (see module docstring).
    imgs: [B, H, W, 3] in [0, 1]; keys: B PRNG keys (any form).  Returns
    [B, H, W] binary masks; with ``return_coef`` a (masks, [B, F] signed
    ridge coefficient) tuple."""
    imgs = np.asarray(imgs, dtype=np.float32)
    B, H, W = imgs.shape[:3]
    # iterate `keys` directly: np.asarray on a list of new-style typed PRNG
    # keys raises (key arrays refuse numpy conversion); _key_words handles
    # each form per element
    keys_u32 = np.stack([_key_words(k) for k in keys])

    params = bundle.params
    fwd_dtype = jnp.float32
    if dtype is not None:
        from .gradient import _cast_params_cached
        params = _cast_params_cached(bundle, dtype)
        fwd_dtype = dtype

    w = max(1, int(3.0 * _QS_KERNEL))
    wd = min(w, int(np.ceil(_QS_MAXDIST)))
    pack = (W % 32 == 0)
    if rows is not None:
        rows = np.asarray(rows, np.int8)
        if rows.shape[-1] < _F_MAX:       # pad the feature axis to F_MAX
            rows = np.concatenate(
                [rows, np.zeros(rows.shape[:-1]
                                + (_F_MAX - rows.shape[-1],), np.int8)],
                axis=-1)
        num_samples = int(rows.shape[1])
    out = _lime_fused_jit(
        bundle.apply, params, jnp.asarray(imgs), jnp.asarray(keys_u32),
        normalize_input, int(num_samples), int(chunk), int(num_features),
        w, wd, pack, fwd_dtype, float(hide_color), float(kernel_width),
        1.0, rows_inj=rows, return_coef=return_coef)
    coef = None
    if return_coef:
        out, coef = out
        coef = np.asarray(coef)
    out = np.asarray(out)
    if pack:
        bits = (out[..., None] >> np.arange(32, dtype=np.uint32)) & 1
        out = bits.astype(np.float32).reshape(B, H, W)
    return (out, coef) if return_coef else out


def lime(bundle, img, key, num_samples: int = 1000, top_labels: int = 5,
         num_features: int = 5, kernel_width: float = 0.25,
         hide_color: float = 0.0, chunk: int = 100,
         normalize_input=None, dtype=None,
         segmenter: str = "device", rows=None) -> np.ndarray:
    """img: [H, W, 3] float in [0, 1] (the driver feeds the *unnormalized*
    trans_img; the reference feeds raw [0,1] images straight to the model —
    ``normalize_input`` is applied if the bundle expects normalized input).
    Returns [H, W] binary mask of the top positive segments.  Delegates to
    the fused batch path with B=1 so single and batched attributions are
    numerically identical."""
    del top_labels, segmenter      # API compat; the top label's mask is used
    return lime_batch(bundle, np.asarray(img)[None], [key],
                      num_samples=num_samples, num_features=num_features,
                      kernel_width=kernel_width, hide_color=hide_color,
                      chunk=chunk, normalize_input=normalize_input,
                      dtype=dtype,
                      rows=None if rows is None
                      else np.asarray(rows)[None])[0]


def _weighted_ridge(X, y, w, alpha=1.0):
    """sklearn Ridge(alpha, fit_intercept=True) with sample weights — host
    mirror of the on-device solve (kept as the sklearn-parity oracle
    surface, test_reference_parity2.py)."""
    sw = np.sqrt(w)
    # center by weighted means (intercept handling)
    xm = (X * w[:, None]).sum(0) / w.sum()
    ym = (y * w).sum() / w.sum()
    Xc = (X - xm) * sw[:, None]
    yc = (y - ym) * sw
    A = Xc.T @ Xc + alpha * np.eye(X.shape[1])
    coef = np.linalg.solve(A, Xc.T @ yc)
    intercept = ym - xm @ coef
    return coef, intercept
