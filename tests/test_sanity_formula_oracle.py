"""SSIM / HOG formula oracles (closes the last sanity oracle gap).

skimage isn't in this image, so the oracle is a from-the-paper
transliteration written with a DIFFERENT numerical route than
metrics/sanity.py:

- SSIM (Wang et al. 2004, skimage structural_similarity semantics at
  gaussian_weights=True): explicit 11x11 sampled-gaussian window applied
  with VALID-mode correlation — which must equal sanity.py's
  gaussian_filter-then-crop interior exactly;
- HOG (Dalal-Triggs, skimage feature.hog defaults): naive per-pixel /
  per-cell Python loops with range-test orientation binning, vs
  sanity.py's vectorized bincount form.

Agreement to float tolerance proves both implement the canonical
algorithm, not each other.
"""
import numpy as np
from scipy.signal import correlate2d
from scipy.stats import spearmanr

from xai_tpu.metrics import sanity as S


def _gauss_window(sigma=1.5, truncate=3.5):
    r = int(truncate * sigma + 0.5)
    x = np.arange(-r, r + 1)
    w = np.exp(-0.5 * x ** 2 / sigma ** 2)
    w = w / w.sum()
    return np.outer(w, w)


def _oracle_ssim_2d(a, b, data_range=2.0, K1=0.01, K2=0.03):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    K = _gauss_window()
    f = lambda x: correlate2d(x, K, mode="valid")
    ux, uy = f(a), f(b)
    uxx, uyy, uxy = f(a * a), f(b * b), f(a * b)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    cov = uxy - ux * uy
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    return float((((2 * ux * uy + C1) * (2 * cov + C2)) /
                  ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))).mean())


def _oracle_hog(img, orientations=9, cell=(16, 16), block=(3, 3)):
    img = np.asarray(img, np.float64)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    # central differences, per-channel, then per-pixel max-|g| channel
    gr = np.zeros((H, W, C))
    gc = np.zeros((H, W, C))
    gr[1:-1] = img[2:] - img[:-2]
    gc[:, 1:-1] = img[:, 2:] - img[:, :-2]
    grs = np.zeros((H, W))
    gcs = np.zeros((H, W))
    for i in range(H):
        for j in range(W):
            mags = np.hypot(gr[i, j], gc[i, j])
            ch = int(np.argmax(mags))
            grs[i, j], gcs[i, j] = gr[i, j, ch], gc[i, j, ch]
    mag = np.hypot(grs, gcs)
    ang = np.rad2deg(np.arctan2(grs, gcs)) % 180.0

    cy, cx = cell
    ncy, ncx = H // cy, W // cx
    hist = np.zeros((ncy, ncx, orientations))
    width = 180.0 / orientations
    for r in range(ncy):
        for c in range(ncx):
            for o in range(orientations):
                lo, hi = o * width, (o + 1) * width
                tot = 0.0
                for i in range(r * cy, (r + 1) * cy):
                    for j in range(c * cx, (c + 1) * cx):
                        a = ang[i, j]
                        if lo <= a < hi or (o == orientations - 1 and
                                            a >= lo):
                            tot += mag[i, j]
                hist[r, c, o] = tot / (cy * cx)

    by, bx = block
    out = []
    for r in range(ncy - by + 1):
        for c in range(ncx - bx + 1):
            blk = hist[r:r + by, c:c + bx].copy()
            blk /= np.sqrt((blk ** 2).sum() + 1e-10)
            blk = np.minimum(blk, 0.2)
            blk /= np.sqrt((blk ** 2).sum() + 1e-10)
            out.append(blk.ravel())
    return np.concatenate(out)


def test_ssim_matches_formula_oracle():
    rs = np.random.RandomState(0)
    a = rs.rand(48, 48).astype(np.float32)
    b = np.clip(a + rs.randn(48, 48).astype(np.float32) * 0.1, 0, 1)
    got = S.ssim(a, b)
    want = _oracle_ssim_2d(a, b)
    assert abs(got - want) < 1e-9, (got, want)

    # multichannel = per-channel mean (skimage channel_axis semantics)
    a3 = rs.rand(48, 48, 3).astype(np.float32)
    b3 = np.clip(a3 + rs.randn(48, 48, 3).astype(np.float32) * 0.2, 0, 1)
    got3 = S.ssim(a3, b3)
    want3 = np.mean([_oracle_ssim_2d(a3[..., c], b3[..., c])
                     for c in range(3)])
    assert abs(got3 - want3) < 1e-9


def test_ssim_identical_images_is_one():
    a = np.random.RandomState(1).rand(64, 64, 3)
    assert abs(S.ssim(a, a) - 1.0) < 1e-9


def test_hog_matches_formula_oracle():
    rs = np.random.RandomState(2)
    img = rs.rand(48, 48, 3).astype(np.float32)
    got = S.hog(img)
    want = _oracle_hog(img)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-10

    img2 = rs.rand(64, 64).astype(np.float32)
    got2 = S.hog(img2)
    want2 = _oracle_hog(img2)
    assert np.abs(got2 - want2).max() < 1e-10


def test_evaluate_composition_matches_reference_shape():
    """evaluate() composes exactly sanityForMethods.py:75-92: spearman on
    RAW maps, ssim/hog on minmax-normalized maps, hog compared by
    spearman."""
    rs = np.random.RandomState(3)
    a = rs.randn(48, 48, 3).astype(np.float32)
    b = rs.randn(48, 48, 3).astype(np.float32)
    ssim_v, spr_v, hog_v = S.evaluate(a, b)
    a01, b01 = S.normalize_image(a), S.normalize_image(b)
    assert abs(ssim_v - np.mean([_oracle_ssim_2d(a01[..., c], b01[..., c])
                                 for c in range(3)])) < 1e-9
    assert abs(spr_v - spearmanr(a.ravel(), b.ravel()).statistic) < 1e-9
    assert abs(hog_v - spearmanr(_oracle_hog(a01),
                                 _oracle_hog(b01)).statistic) < 1e-6
