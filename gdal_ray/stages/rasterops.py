"""Per-image raster pipeline steps: proximity, sieve, fill-nodata,
nearblack (reference: alg/gdalproximity.cpp:94 GDALComputeProximity,
alg/gdalsievefilter.cpp:178 GDALSieveFilter, alg/rasterfill.cpp:394
GDALFillNodata, apps/nearblack_lib.cpp).

All run per image inside ``map_batches`` — no shuffle; grids are bounded
per row, so O(n log n)/O(n) per-image algorithms are the right scale
shape (the 100 TB axis is the number of images, not image size).

Proximity is the EXACT squared euclidean distance transform
(Felzenszwalb–Huttenlocher two-pass lower-envelope algorithm) — integer
d² in/out, so the DuckDB oracle (min over a targets join) matches
bit-for-bit.  GDAL's scanline approximation differs slightly; we keep the
exact transform and document the difference (GDAL's MAXDIST/units options
map to a post-filter here).
"""

from __future__ import annotations

import numpy as np

from gdal_ray.stages.polygonize import label_components

_INF = np.int64(1 << 60)


def _edt_1d_sq(f: np.ndarray) -> np.ndarray:
    """1-D squared EDT of sampled function f (int64, _INF = no site)."""
    n = len(f)
    d = np.empty(n, dtype=np.int64)
    v = np.empty(n, dtype=np.int64)   # site positions
    z = np.empty(n + 1, dtype=np.float64)
    k = 0
    v[0] = 0
    z[0], z[1] = -np.inf, np.inf
    for q in range(1, n):
        if f[q] >= _INF and f[v[k]] >= _INF:
            continue
        while True:
            p = v[k]
            denom = 2 * (q - p)
            s = ((f[q] + q * q) - (f[p] + p * p)) / denom
            if s <= z[k]:
                k -= 1
                if k < 0:
                    k = 0
                    v[0] = q
                    z[0], z[1] = -np.inf, np.inf
                    break
            else:
                k += 1
                v[k] = q
                z[k] = s
                z[k + 1] = np.inf
                break
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        p = v[k]
        val = f[p] + (q - p) * (q - p)
        d[q] = val if val < _INF else _INF
    return d


def proximity_sq(targets: np.ndarray) -> np.ndarray:
    """(h, w) bool target mask → int64 squared euclidean distance to the
    nearest target pixel (_INF where no targets exist)."""
    t = np.asarray(targets, dtype=bool)
    h, w = t.shape
    f = np.where(t, np.int64(0), _INF)
    # column pass then row pass (separable)
    for c in range(w):
        f[:, c] = _edt_1d_sq(f[:, c])
    out = np.empty_like(f)
    for r in range(h):
        out[r, :] = _edt_1d_sq(f[r, :])
    return out


def column_target_extents(targets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-column (first, last) target row index within a strip, -1 where
    the column holds no target.  This is the ENTIRE cross-strip state the
    distributed proximity transform needs: the vertical nearest-target
    distance for a row inside some other strip only ever reaches back to
    the closest target row of each intervening strip, i.e. these two
    numbers per column."""
    t = np.asarray(targets, dtype=bool)
    h = t.shape[0]
    any_col = t.any(axis=0)
    first = np.where(any_col, t.argmax(axis=0), -1).astype(np.int64)
    last = np.where(any_col, h - 1 - t[::-1].argmax(axis=0), -1).astype(np.int64)
    return first, last


def strip_vertical_dist(targets: np.ndarray, r0: int,
                        above: np.ndarray, below: np.ndarray) -> np.ndarray:
    """Exact per-pixel vertical distance (in rows) to the nearest target in
    the SAME column anywhere in the full raster, computed strip-locally.

    `targets` is the strip's (h, w) bool mask starting at global row r0;
    `above[c]` / `below[c]` are the nearest target GLOBAL rows outside the
    strip (above/below), -1 / huge where none.  Two vectorized scans (one
    down, one up) over the strip's rows; O(h·w), no Python per pixel."""
    t = np.asarray(targets, dtype=bool)
    h, w = t.shape
    big = _INF
    zero = np.int64(0)
    down = np.empty((h, w), dtype=np.int64)
    # distance at the virtual row r0-1 (from the cross-strip summary)
    prev = np.where(above >= 0, (np.int64(r0) - 1) - above, big)
    for r in range(h):
        prev = np.where(t[r], zero, np.minimum(prev, big - 1) + 1)
        down[r] = prev
    up = np.empty((h, w), dtype=np.int64)
    # distance at the virtual row r0+h (from the cross-strip summary)
    nxt = np.where(below >= 0, below - (np.int64(r0) + h), big)
    for r in range(h - 1, -1, -1):
        nxt = np.where(t[r], zero, np.minimum(nxt, big - 1) + 1)
        up[r] = nxt
    return np.minimum(down, up)


def strip_proximity_sq(targets: np.ndarray, r0: int,
                       above: np.ndarray, below: np.ndarray) -> np.ndarray:
    """Exact squared euclidean distance transform for one row strip of a
    larger raster: vertical pass from strip-local scans + the (above,
    below) cross-strip summaries, then the Felzenszwalb–Huttenlocher
    lower-envelope row pass (exact, row-independent — needs no context
    beyond the strip's own rows).  Bit-identical to `proximity_sq` of the
    whole raster restricted to the strip (pytest-gated)."""
    g = strip_vertical_dist(targets, r0, above, below)
    f = np.where(g >= _INF, _INF, g * g)
    out = np.empty_like(f)
    for r in range(f.shape[0]):
        out[r, :] = _edt_1d_sq(f[r, :])
    return out


def sieve(classes: np.ndarray, *, threshold: int, connect8: bool = False) -> np.ndarray:
    """Remove connected components smaller than `threshold` pixels by
    merging each into its largest-by-pixel-count neighboring component
    (GDALSieveFilter semantics), iterating smallest-first until stable."""
    cls = np.asarray(classes).copy()
    while True:
        labels = label_components(cls.astype(np.int32), connect8=connect8)
        nlab = int(labels.max())
        if nlab <= 1:
            return cls
        sizes = np.bincount(labels.ravel())[1:]  # size per label (1-based)
        small = np.argsort(sizes, kind="stable") + 1
        target_lab = small[0] if sizes[small[0] - 1] < threshold else None
        if target_lab is None:
            return cls
        # neighbors of the smallest small component
        sel = labels == target_lab
        nb = np.zeros_like(sel)
        nb[:-1, :] |= sel[1:, :]
        nb[1:, :] |= sel[:-1, :]
        nb[:, :-1] |= sel[:, 1:]
        nb[:, 1:] |= sel[:, :-1]
        if connect8:
            nb[:-1, :-1] |= sel[1:, 1:]
            nb[:-1, 1:] |= sel[1:, :-1]
            nb[1:, :-1] |= sel[:-1, 1:]
            nb[1:, 1:] |= sel[:-1, :-1]
        nb &= ~sel
        nb_labels = labels[nb]
        if nb_labels.size == 0:
            return cls  # isolated full-image component
        # largest-by-pixel-count neighboring component wins (GDALSieveFilter,
        # alg/gdalsievefilter.cpp); ties → smaller label (deterministic)
        cand = np.unique(nb_labels)
        merge_into = int(cand[np.argmax(sizes[cand - 1])])
        cls[sel] = cls[labels == merge_into].ravel()[0]


def fill_nodata(img: np.ndarray, nodata_mask: np.ndarray, *, max_iter: int = 1000) -> np.ndarray:
    """Fill nodata pixels by iterative 4-neighbor mean of valid pixels
    (the smoothing-iteration half of GDALFillNodata; deterministic,
    converges inward one ring per iteration)."""
    out = np.asarray(img, dtype=np.float64).copy()
    invalid = np.asarray(nodata_mask, dtype=bool).copy()
    for _ in range(max_iter):
        if not invalid.any():
            break
        valid = ~invalid
        vsum = np.zeros_like(out)
        vcnt = np.zeros(out.shape, dtype=np.int64)
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted_v = np.zeros_like(valid)
            shifted_x = np.zeros_like(out)
            src_r = slice(max(dr, 0), out.shape[0] + min(dr, 0))
            dst_r = slice(max(-dr, 0), out.shape[0] + min(-dr, 0))
            src_c = slice(max(dc, 0), out.shape[1] + min(dc, 0))
            dst_c = slice(max(-dc, 0), out.shape[1] + min(-dc, 0))
            shifted_v[dst_r, dst_c] = valid[src_r, src_c]
            shifted_x[dst_r, dst_c] = out[src_r, src_c]
            vsum += np.where(shifted_v, shifted_x, 0.0)
            vcnt += shifted_v
        ring = invalid & (vcnt > 0)
        if not ring.any():
            break
        out[ring] = vsum[ring] / vcnt[ring]
        invalid &= ~ring
    return out


def nearblack(img: np.ndarray, *, threshold: int = 15, value: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Collar clean: flood from the image border through near-black pixels
    (all bands < threshold), set them to `value`; returns (img, collar_mask)
    (apps/nearblack_lib.cpp semantics, 4-connected flood)."""
    a = np.asarray(img)
    dark = (a < threshold).all(axis=2) if a.ndim == 3 else a < threshold
    h, w = dark.shape
    collar = np.zeros((h, w), dtype=bool)
    # seed border
    frontier = np.zeros_like(collar)
    frontier[0, :] = dark[0, :]
    frontier[-1, :] = dark[-1, :]
    frontier[:, 0] |= dark[:, 0]
    frontier[:, -1] |= dark[:, -1]
    while frontier.any():
        collar |= frontier
        grow = np.zeros_like(collar)
        grow[1:, :] |= collar[:-1, :]
        grow[:-1, :] |= collar[1:, :]
        grow[:, 1:] |= collar[:, :-1]
        grow[:, :-1] |= collar[:, 1:]
        frontier = grow & dark & ~collar
    out = a.copy()
    out[collar] = value
    return out, collar
