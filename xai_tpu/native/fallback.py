"""Pure-numpy fallbacks for the native helpers (same algorithms; used when
no C++ toolchain is available)."""
from __future__ import annotations

import numpy as np
from scipy.ndimage import gaussian_filter


def _rgb2lab(rgb: np.ndarray) -> np.ndarray:
    c = np.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    X = (0.412453 * r + 0.357580 * g + 0.180423 * b) / 0.95047
    Y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    Z = (0.019334 * r + 0.119193 * g + 0.950227 * b) / 1.08883
    f = lambda t: np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 16 / 116)
    fx, fy, fz = f(X), f(Y), f(Z)
    return np.stack([116 * fy - 16, 500 * (fx - fy), 200 * (fy - fz)], -1)


def slic_np(img, n_segments, compactness=10.0, max_iter=10):
    H, W = img.shape[:2]
    lab = _rgb2lab(img)
    step = np.sqrt(H * W / n_segments)
    ys = np.arange(step / 2, H, step)
    xs = np.arange(step / 2, W, step)
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    cy, cx = cy.ravel(), cx.ravel()
    cfeat = lab[cy.astype(int), cx.astype(int)]
    K = len(cy)
    yy, xx = np.mgrid[0:H, 0:W]
    invwt = (compactness / step) ** 2
    labels = np.zeros((H, W), np.int32)
    for _ in range(max_iter):
        dist = np.full((H, W), 1e30)
        for k in range(K):
            y0, y1 = max(0, int(cy[k] - step)), min(H, int(cy[k] + step) + 1)
            x0, x1 = max(0, int(cx[k] - step)), min(W, int(cx[k] + step) + 1)
            dl = lab[y0:y1, x0:x1] - cfeat[k]
            d = (dl ** 2).sum(-1) + ((yy[y0:y1, x0:x1] - cy[k]) ** 2 +
                                     (xx[y0:y1, x0:x1] - cx[k]) ** 2) * invwt
            m = d < dist[y0:y1, x0:x1]
            dist[y0:y1, x0:x1][m] = d[m]
            labels[y0:y1, x0:x1][m] = k
        for k in range(K):
            m = labels == k
            if m.any():
                cy[k], cx[k] = yy[m].mean(), xx[m].mean()
                cfeat[k] = lab[m].mean(0)
    return labels


def felzenszwalb_np(img, scale, sigma=0.8, min_size=20):
    H, W, C = img.shape
    sm = np.stack([gaussian_filter(img[..., c], sigma) for c in range(C)],
                  -1)
    idx = np.arange(H * W).reshape(H, W)
    edges = []
    for (dy, dx) in ((0, 1), (1, 0), (1, 1), (1, -1)):
        ys = slice(max(0, -dy), H - max(0, dy))
        xs = slice(max(0, -dx), W - max(0, dx))
        ys2 = slice(max(0, dy), H - max(0, -dy))
        xs2 = slice(max(0, dx), W - max(0, -dx))
        w = np.sqrt(((sm[ys, xs] - sm[ys2, xs2]) ** 2).sum(-1)).ravel()
        edges.append(np.stack([w, idx[ys, xs].ravel().astype(float),
                               idx[ys2, xs2].ravel().astype(float)]))
    ew, ea, eb = np.concatenate(edges, axis=1)
    order = np.argsort(ew)
    parent = np.arange(H * W)
    size = np.ones(H * W, int)
    thr = np.full(H * W, scale)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for i in order:
        a, b, w = find(int(ea[i])), find(int(eb[i])), ew[i]
        if a != b and w <= thr[a] and w <= thr[b]:
            parent[b] = a
            size[a] += size[b]
            thr[a] = w + scale / size[a]
    for i in order:
        a, b = find(int(ea[i])), find(int(eb[i]))
        if a != b and (size[a] < min_size or size[b] < min_size):
            parent[b] = a
            size[a] += size[b]
    roots = np.array([find(i) for i in range(H * W)])
    _, labels = np.unique(roots, return_inverse=True)
    return labels.reshape(H, W).astype(np.int32)


def quickshift_np(img, ratio=0.2, kernel_size=4.0, max_dist=200.0):
    H, W = img.shape[:2]
    lab = _rgb2lab(img) * ratio
    feat = np.concatenate(
        [lab, np.zeros((H, W, 0))], -1).reshape(H * W, -1)
    yy, xx = np.mgrid[0:H, 0:W]
    pos = np.stack([yy.ravel(), xx.ravel()], 1).astype(float)
    w = max(1, int(3 * kernel_size))
    density = np.zeros(H * W)
    inv2s2 = 1.0 / (2 * kernel_size ** 2)
    for dy in range(-w, w + 1):
        for dx in range(-w, w + 1):
            ys = slice(max(0, -dy), H - max(0, dy))
            ys2 = slice(max(0, dy), H - max(0, -dy))
            xs = slice(max(0, -dx), W - max(0, dx))
            xs2 = slice(max(0, dx), W - max(0, -dx))
            d = ((lab[ys, xs] - lab[ys2, xs2]) ** 2).sum(-1) + dy * dy + dx * dx
            contrib = np.exp(-d * inv2s2)
            dd = np.zeros((H, W))
            dd[ys, xs] = contrib
            density += dd.ravel()
    parent = np.arange(H * W)
    # parent search confined to the kernel window (as skimage does);
    # max_dist is only the joint-distance cutoff -> root
    wd = min(w, int(np.ceil(max_dist)))
    dens2 = density.reshape(H, W)
    for y in range(H):
        for x in range(W):
            p = y * W + x
            best = max_dist ** 2
            bestq = p
            y0, y1 = max(0, y - wd), min(H, y + wd + 1)
            x0, x1 = max(0, x - wd), min(W, x + wd + 1)
            dwin = ((lab[y0:y1, x0:x1] - lab[y, x]) ** 2).sum(-1) + \
                (yy[y0:y1, x0:x1] - y) ** 2 + (xx[y0:y1, x0:x1] - x) ** 2
            higher = dens2[y0:y1, x0:x1] > density[p]
            dwin = np.where(higher, dwin, np.inf)
            if np.isfinite(dwin).any():
                j = np.argmin(dwin)
                if dwin.ravel()[j] < best:
                    jy, jx = np.unravel_index(j, dwin.shape)
                    bestq = (y0 + jy) * W + (x0 + jx)
            parent[p] = bestq
    # flatten
    for i in range(H * W):
        r = i
        while parent[r] != r:
            r = parent[r]
        parent[i] = r
    _, labels = np.unique(parent, return_inverse=True)
    return labels.reshape(H, W).astype(np.int32)


def project_curve_np(y, mode, iters=100000):
    """Dykstra projection onto {bounds, endpoints, convex/concave} — the
    curvature halfspaces are swept in 3 interleaved colour groups (stride-3
    constraints touch disjoint coordinate triples), which vectorizes the
    inner loop while remaining a cyclic Dykstra scheme with the same fixed
    point.  Early exit when a full sweep no longer moves anything; strongly
    infeasible curves need ~1e4-1e5 sweeps (linear convergence rate)."""
    n = len(y)
    x = y.astype(np.float64).copy()
    c = np.array([-1.0, 2.0, -1.0]) if mode == "del" else \
        np.array([1.0, -2.0, 1.0])
    norm2 = 6.0
    corr = np.zeros(n - 2)
    corr_box = np.zeros(n)
    colors = [np.arange(col, n - 2, 3) for col in range(3)]
    for it in range(iters):
        v = x + corr_box
        p = np.clip(v, 0, 1)
        p[0], p[-1] = y[0], y[-1]
        corr_box = v - p
        x = p
        max_step = 0.0
        for idx in colors:
            if len(idx) == 0:
                continue
            a_dot = (c[0] * x[idx] + c[1] * x[idx + 1] + c[2] * x[idx + 2]
                     + corr[idx] * norm2)
            t = np.maximum(a_dot, 0.0) / norm2
            d = corr[idx] - t
            x[idx] += d * c[0]
            x[idx + 1] += d * c[1]
            x[idx + 2] += d * c[2]
            corr[idx] = t
            if len(d):
                max_step = max(max_step, float(np.abs(d).max()))
        if max_step < 1e-14 and it > 0:
            break
    x = np.clip(x, 0, 1)
    x[0], x[-1] = y[0], y[-1]
    return x
