"""Delaunay triangulation + linear (barycentric) interpolation — the
kernel behind gdal_grid's GGA_Linear algorithm.

Reference semantics: alg/gdalgrid.cpp GGA_Linear triangulates the
scattered points (via the vendored qhull, alg/delaunay.c +
alg/internal_libqhull/) and linearly interpolates each grid node inside
its containing triangle; nodes outside the triangulation get no value
(or a nearest-neighbor fallback when a search radius is set — not
implemented here; outside-hull nodes are simply not emitted).

Implementation: incremental Bowyer–Watson in numpy — circumcircle
tests vectorized over the current triangle set per insertion.  O(n·m)
worst case, fine for the per-partition point counts the distributed plan
produces (each partition triangulates only its halo neighborhood).
"""

from __future__ import annotations

import numpy as np


def delaunay(points: np.ndarray) -> np.ndarray:
    """(n, 2) float64 -> (m, 3) int64 vertex-index triangles (CCW).

    Degenerate inputs (n < 3, all collinear) return an empty array."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), np.int64)

    # super-triangle comfortably containing every point
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 64.0
    sup = np.array(
        [[cx - span, cy - span], [cx + span, cy - span], [cx, cy + span]]
    )
    allp = np.vstack([pts, sup])
    i_sup = np.array([n, n + 1, n + 2])

    tris = np.array([i_sup], dtype=np.int64)  # (m, 3)
    cc, r2 = _circumcircles(allp, tris)

    # deterministic insertion order (sorted by x then y) keeps the
    # triangulation stable across identical point sets in any input order
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    for i in order:
        p = allp[i]
        d2 = (cc[:, 0] - p[0]) ** 2 + (cc[:, 1] - p[1]) ** 2
        bad = d2 <= r2 * (1 + 1e-12)
        if not bad.any():  # numerical corner: attribute to nearest circle
            bad = d2 - r2 == (d2 - r2).min()
        cavity = tris[bad]
        # boundary = edges of the cavity appearing exactly once
        edges = np.vstack(
            [cavity[:, [0, 1]], cavity[:, [1, 2]], cavity[:, [2, 0]]]
        )
        ekey = np.sort(edges, axis=1)
        _, inv, counts = np.unique(
            ekey, axis=0, return_inverse=True, return_counts=True
        )
        boundary = edges[counts[inv] == 1]
        new = np.column_stack(
            [boundary, np.full(len(boundary), i, dtype=np.int64)]
        )
        tris = np.vstack([tris[~bad], new])
        ncc, nr2 = _circumcircles(allp, new)
        cc = np.vstack([cc[~bad], ncc])
        r2 = np.concatenate([r2[~bad], nr2])

    keep = ~np.isin(tris, i_sup).any(axis=1)
    out = tris[keep]
    # normalize to CCW and canonical vertex rotation for determinism
    a, b, c = allp[out[:, 0]], allp[out[:, 1]], allp[out[:, 2]]
    cwmask = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0]) < 0
    out[cwmask] = out[cwmask][:, [0, 2, 1]]
    rot = np.argmin(out, axis=1)
    out = np.stack(
        [out[np.arange(len(out)), (rot + k) % 3] for k in range(3)], axis=1
    )
    return out[np.lexsort((out[:, 2], out[:, 1], out[:, 0]))]


def _circumcircles(pts: np.ndarray, tris: np.ndarray):
    """-> (centers (m,2), radius² (m,)) of the triangles' circumcircles."""
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    ab = b - a
    ac = c - a
    d = 2.0 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    d = np.where(np.abs(d) < 1e-300, 1e-300, d)
    ab2 = (ab * ab).sum(1)
    ac2 = (ac * ac).sum(1)
    ux = (ac[:, 1] * ab2 - ab[:, 1] * ac2) / d
    uy = (ab[:, 0] * ac2 - ac[:, 0] * ab2) / d
    cc = a + np.stack([ux, uy], axis=1)
    r2 = ux * ux + uy * uy
    return cc, r2


def linear_interpolate(
    points: np.ndarray,
    values: np.ndarray,
    tris: np.ndarray,
    query: np.ndarray,
    *,
    eps: float = 1e-12,
) -> tuple[np.ndarray, np.ndarray]:
    """Barycentric interpolation of `values` at `query` points.

    Returns (interpolated (q,), inside-hull mask (q,)).  A query point on
    a shared edge resolves to the lowest-index containing triangle, so
    results are order-independent."""
    pts = np.asarray(points, np.float64)
    z = np.asarray(values, np.float64)
    q = np.asarray(query, np.float64)
    out = np.full(len(q), np.nan)
    inside = np.zeros(len(q), dtype=bool)
    if len(tris) == 0 or len(q) == 0:
        return out, inside
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    det = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    det = np.where(np.abs(det) < 1e-300, 1e-300, det)
    # (q, t) barycentric coordinates — chunk queries to bound memory
    chunk = max(1, int(4_000_000 // max(len(tris), 1)))
    for s in range(0, len(q), chunk):
        qq = q[s : s + chunk]
        dx = qq[:, None, 0] - a[None, :, 0]
        dy = qq[:, None, 1] - a[None, :, 1]
        l2 = ((c[None, :, 1] - a[None, :, 1]) * dx
              - (c[None, :, 0] - a[None, :, 0]) * dy) / det[None, :]
        l3 = (-(b[None, :, 1] - a[None, :, 1]) * dx
              + (b[None, :, 0] - a[None, :, 0]) * dy) / det[None, :]
        l1 = 1.0 - l2 - l3
        ok = (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
        hit = ok.any(axis=1)
        ti = np.argmax(ok, axis=1)  # lowest containing triangle index
        rows = np.nonzero(hit)[0]
        t = ti[rows]
        w1 = l1[rows, t]
        w2 = l2[rows, t]
        w3 = l3[rows, t]
        vals = (
            w1 * z[tris[t, 0]] + w2 * z[tris[t, 1]] + w3 * z[tris[t, 2]]
        )
        out[s + rows] = vals
        inside[s + rows] = True
    return out, inside
