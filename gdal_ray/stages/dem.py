"""DEM 3×3-window kernels + marching-squares contour — the `gdaldem` /
`gdal_contour` operator family (reference: apps/gdaldem_lib.cpp, Horn
hillshade `GDALHillshadeAlg` apps/gdaldem_lib.cpp:1003, slope/aspect/TPI/
TRI/roughness same file; marching squares alg/marching_squares/*.h,
GDALContourGenerateEx alg/contour.cpp:568).

All kernels are vectorized numpy over a batch of grids at once — shape
(B, n, n) — and run inside ``map_batches`` with no shuffle (each grid is
one row).  The elevation grid is a pure integer function of
``(doc_id, row, col)`` so a DuckDB oracle can rebuild the identical grid
with ``generate_series`` and verify the integer kernels (roughness, TRI,
TPI×9, reclassify, contour case counts) EXACTLY; the float kernels
(hillshade/slope/aspect) are verified in pytest against a naive
per-pixel reference implementation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GRID_N = 16  # grid side for the oracle-checked queries
ELEV_EXPR = "(doc_id*7919 + r*131 + c*17) % 256"  # documented for the SQL twin
RECLASS_BINS = (50, 120, 200)  # class = number of bins <= e  (np.digitize)
CONTOUR_LEVELS = (64, 128, 192)


def elevation_grids(ids: np.ndarray, n: int = GRID_N) -> np.ndarray:
    """(B, n, n) int64 deterministic elevation, elev = (d*7919+r*131+c*17)%256."""
    ids = np.asarray(ids, dtype=np.int64)
    r = np.arange(n, dtype=np.int64)
    return (ids[:, None, None] * 7919 + r[None, :, None] * 131 + r[None, None, :] * 17) % 256


def _win(e: np.ndarray):
    """The 9 shifted views of the interior of a (B,n,n) stack, ordered
    [tl, t, tr, l, c, r, bl, b, br] — each (B, n-2, n-2)."""
    return [e[:, 1 + dr : e.shape[1] - 1 + dr, 1 + dc : e.shape[2] - 1 + dc]
            for dr in (-1, 0, 1) for dc in (-1, 0, 1)]


# ---------------------------------------------------------------------------
# integer kernels (oracle-checked)

def window_metrics(e: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(roughness, tri, tpi9) over interior cells, each (B, n-2, n-2) int64.

    - roughness = max - min of the 3×3 window (gdaldem roughness);
    - tri = Σ|center − neighbor| over the 8 neighbors (Wilson TRI × 8,
      kept integer — gdaldem's default mean is this / 8);
    - tpi9 = 9*center − Σ window  (gdaldem TPI × 9 to stay integer:
      TPI = center − mean(8 neighbors) = tpi9 / 8 exactly).
    """
    w = _win(e)
    stack = np.stack(w)  # (9, B, m, m)
    center = w[4]
    rough = stack.max(axis=0) - stack.min(axis=0)
    tri = np.abs(stack - center[None]).sum(axis=0)  # center term adds 0
    tpi9 = 9 * center - stack.sum(axis=0)
    return rough, tri, tpi9


def reclassify(e: np.ndarray, bins=RECLASS_BINS) -> np.ndarray:
    """Integer LUT reclass (apps/gdalalg_raster_reclassify.cpp semantics via
    np.digitize): class k iff bins[k-1] <= e < bins[k]."""
    return np.digitize(e, np.asarray(bins), right=False)


def marching_square_cases(e: np.ndarray, level: int) -> np.ndarray:
    """4-bit marching-squares case per 2×2 cell: bit3=tl, bit2=tr, bit1=br,
    bit0=bl set iff corner >= level (alg/marching_squares corner rule).
    Returns (B, n-1, n-1) int64 in [0, 15]."""
    ge = (e >= level).astype(np.int64)
    tl = ge[:, :-1, :-1]
    tr = ge[:, :-1, 1:]
    br = ge[:, 1:, 1:]
    bl = ge[:, 1:, :-1]
    return tl * 8 + tr * 4 + br * 2 + bl


# segments emitted per case: 0 for empty/full, 2 for the saddles (0101/1010),
# 1 otherwise — contour_generator.h's segment table collapsed to counts.
_SEG_LUT = np.array([0, 1, 1, 1, 1, 2, 1, 1, 1, 1, 2, 1, 1, 1, 1, 0], dtype=np.int64)


def contour_segment_counts(e: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_cells_crossed, n_segments) per grid for one level, each (B,) int64."""
    cases = marching_square_cases(e, level)
    crossed = ((cases != 0) & (cases != 15)).sum(axis=(1, 2))
    segs = _SEG_LUT[cases].sum(axis=(1, 2))
    return crossed.astype(np.int64), segs.astype(np.int64)


# ---------------------------------------------------------------------------
# float kernels (pytest-checked vs naive reference)

def _horn_gradients(e: np.ndarray, ewres: float = 1.0, nsres: float = 1.0):
    """Horn's 3rd-order finite differences over the 3×3 window
    (GDALHillshadeAlg, apps/gdaldem_lib.cpp:1003): x = ((tl+2l+bl)-(tr+2r+br))/(8*ewres)."""
    f = e.astype(np.float64)
    tl, t, tr, l, c, r, bl, b, br = _win(f)
    gx = ((tl + 2 * l + bl) - (tr + 2 * r + br)) / (8.0 * ewres)
    gy = ((bl + 2 * b + br) - (tl + 2 * t + tr)) / (8.0 * nsres)
    return gx, gy


def hillshade(e: np.ndarray, azimuth: float = 315.0, altitude: float = 45.0,
              z: float = 1.0, scale: float = 1.0) -> np.ndarray:
    """Horn hillshade → uint8 in [1, 255] over interior cells (B, n-2, n-2).
    value = 1 + 254 * max(0, sin(alt)sin(slope⊥) + cos(alt)cos..), GDAL's
    0..255 convention with 0 reserved for nodata."""
    gx, gy = _horn_gradients(e)
    gx, gy = gx * z / scale, gy * z / scale
    az = np.deg2rad(360.0 - azimuth + 90.0)
    alt = np.deg2rad(altitude)
    slope = np.arctan(np.hypot(gx, gy))
    aspect = np.arctan2(gy, -gx)
    shade = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(az - aspect)
    val = 1.0 + 254.0 * np.clip(shade, 0.0, 1.0)
    return np.clip(np.round(val), 1, 255).astype(np.uint8)


def hillshade_combined(e: np.ndarray, azimuth: float = 315.0,
                       altitude: float = 45.0, z: float = 1.0,
                       scale: float = 1.0) -> np.ndarray:
    """Combined shading (gdaldem hillshade -combined,
    GDALHillshadeCombinedAlg apps/gdaldem_lib.cpp:1140): the oblique
    shade angle modulated by slope —
    ``1 − arccos(cos_incidence) · slope_rad · (2/π)²``, then the usual
    1+254 byte mapping with ≤0 → 1."""
    gx, gy = _horn_gradients(e)
    gx, gy = gx * z / scale, gy * z / scale
    az = np.deg2rad(360.0 - azimuth + 90.0)
    alt = np.deg2rad(altitude)
    slope_rad = np.arctan(np.hypot(gx, gy))
    aspect = np.arctan2(gy, -gx)
    cosinc = np.clip(
        np.sin(alt) * np.cos(slope_rad)
        + np.cos(alt) * np.sin(slope_rad) * np.cos(az - aspect),
        -1.0, 1.0,
    )
    cang = 1.0 - np.arccos(cosinc) * slope_rad * (4.0 / np.pi**2)
    val = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
    return np.clip(np.round(val), 1, 255).astype(np.uint8)


def hillshade_igor(e: np.ndarray, azimuth: float = 315.0, z: float = 1.0,
                   scale: float = 1.0) -> np.ndarray:
    """Igor's shading (gdaldem hillshade -igor, GDALHillshadeIgorAlg
    apps/gdaldem_lib.cpp:943): shadowness = slope/90° weighted by how
    directly the aspect faces away from the sun;
    value = 255·(1 − slopeStrength·aspectStrength)."""
    gx, gy = _horn_gradients(e)
    slope_deg = np.rad2deg(np.arctan(np.hypot(gx * z / scale, gy * z / scale)))
    aspect = np.arctan2(gy, -gx)
    az = np.deg2rad(azimuth)
    target = 1.5 * np.pi - az
    diff = np.abs(np.mod(aspect, 2 * np.pi) - np.mod(target, 2 * np.pi))
    diff = np.where(diff > np.pi, 2 * np.pi - diff, diff)
    aspect_strength = 1.0 - diff / np.pi
    shadow = 1.0 - (slope_deg / 90.0) * aspect_strength
    return np.clip(np.round(255.0 * shadow), 0, 255).astype(np.uint8)


def hillshade_multidirectional(e: np.ndarray, altitude: float = 45.0,
                               z: float = 1.0, scale: float = 1.0) -> np.ndarray:
    """Multidirectional hillshade (gdaldem hillshade -multidirectional,
    GDALHillshadeMultiDirectionalAlg apps/gdaldem_lib.cpp:1253; USGS
    OF 92-422): aspect-weighted blend of the 225/270/315/360° azimuth
    shades — weights W(az) = sin²(aspect − az) folded to gradient
    products, flat cells = 1 + 254·sin(alt)."""
    gx, gy = _horn_gradients(e)
    x, y = gx * z / scale, gy * z / scale
    alt = np.deg2rad(altitude)
    sin_alt = np.sin(alt)
    cos_alt = np.cos(alt)
    cos225 = np.cos(np.deg2rad(225.0))  # = -√2/2, shared by 225 and 315
    xx, yy = x * x, y * y
    xxyy = xx + yy
    v225 = np.maximum(sin_alt + (x - y) * cos225 * cos_alt, 0.0)
    v270 = np.maximum(sin_alt - x * cos_alt, 0.0)
    v315 = np.maximum(sin_alt + (x + y) * cos225 * cos_alt, 0.0)
    v360 = np.maximum(sin_alt - y * cos_alt, 0.0)
    w225 = 0.5 * xxyy - x * y
    w270 = xx
    w315 = xxyy - w225
    w360 = yy
    denom = np.where(xxyy == 0.0, 1.0, xxyy)
    # Σweights = 2·(x²+y²), so the blend is ≈ 2·mean-shade and the byte
    # scale is 127 (the reference's *_mul_127 constants), not 254
    cang = (w225 * v225 + w270 * v270 + w315 * v315 + w360 * v360) / denom
    cang = cang / np.sqrt(1.0 + xxyy)
    val = np.where(xxyy == 0.0, 1.0 + 254.0 * sin_alt, 1.0 + 127.0 * cang)
    return np.clip(np.round(val), 1, 255).astype(np.uint8)


def slope_degrees(e: np.ndarray, z: float = 1.0, scale: float = 1.0) -> np.ndarray:
    gx, gy = _horn_gradients(e)
    return np.rad2deg(np.arctan(np.hypot(gx * z / scale, gy * z / scale)))


def aspect_degrees(e: np.ndarray) -> np.ndarray:
    """Azimuth of downslope direction, degrees clockwise from north; -9999
    for flat cells (gdaldem aspect convention incl. flat sentinel)."""
    gx, gy = _horn_gradients(e)
    asp = np.rad2deg(np.arctan2(-gx, gy))  # math → compass below
    out = np.where(asp < 0, asp + 360.0, asp)
    flat = (gx == 0) & (gy == 0)
    return np.where(flat, -9999.0, out)


# ---------------------------------------------------------------------------
# batch adapters (pa.Table in/out, used by pipelines/queries.py)

def viewshed(e: np.ndarray, r0: int, c0: int, obs_height: int = 2,
             row_range: tuple[int, int] | None = None) -> np.ndarray:
    """Exact integer R2 viewshed (alg/viewshed/viewshed.cpp semantics,
    Wang et al. line-of-sight): target (r, c) is visible iff no sampled
    terrain point along the straight sight line rises above it.

    Sampling rule (integer-exact, shared with the SQL oracle): step the
    DOMINANT axis one cell at a time (k = 1..n-1, n = max(|dr|,|dc|));
    the cross-axis coordinate is fractional with denominator n, and the
    terrain height there is the linear interpolation of the two adjacent
    cells.  Scaling every height by n keeps the whole comparison in
    integers: blocked ⇔ ∃k: e_lo·(n−m) + e_hi·m  >  n·h0 + k·(h1−h0),
    with m = k·|cross| mod n and h0 = e[r0,c0] + obs_height.

    `row_range=(lo, hi)` restricts the TARGET rows (the LOS still reads
    the full grid) — per-target independence makes the strip-distributed
    door exact by construction: each Ray task holds the broadcast DEM and
    evaluates only its strip's targets.
    """
    e = np.asarray(e, dtype=np.int64)
    nrows, ncols = e.shape
    h0 = int(e[r0, c0]) + obs_height
    lo, hi = row_range if row_range is not None else (0, nrows)
    out = np.zeros((hi - lo, ncols), dtype=bool)
    rr, cc = np.meshgrid(np.arange(lo, hi), np.arange(ncols), indexing="ij")
    dr = rr - r0
    dc = cc - c0
    n = np.maximum(np.abs(dr), np.abs(dc))
    out[n <= 1] = True  # observer + adjacent cells always visible
    # vectorize over targets with the same n (ring) — k loop is ≤ n-1
    for nv in range(2, int(n.max()) + 1):
        sel = n == nv
        tr = rr[sel]; tc = cc[sel]
        h1 = e[tr, tc]
        visible = np.ones(len(tr), dtype=bool)
        for k in range(1, nv):
            # position along the line at parameter k/nv (scaled by nv)
            pr = r0 * nv + k * (tr - r0)   # row * nv
            pc = c0 * nv + k * (tc - c0)   # col * nv
            r_lo = pr // nv
            c_lo = pc // nv
            mr = pr - r_lo * nv
            mc = pc - c_lo * nv
            # at most one axis is fractional (dominant axis steps integer)
            e_lo = e[np.clip(r_lo, 0, nrows - 1), np.clip(c_lo, 0, ncols - 1)]
            e_hi_r = e[np.clip(r_lo + 1, 0, nrows - 1), np.clip(c_lo, 0, ncols - 1)]
            e_hi_c = e[np.clip(r_lo, 0, nrows - 1), np.clip(c_lo + 1, 0, ncols - 1)]
            terrain = np.where(
                mr > 0, e_lo * (nv - mr) + e_hi_r * mr,
                np.where(mc > 0, e_lo * (nv - mc) + e_hi_c * mc, e_lo * nv),
            )
            sight = nv * h0 + k * (h1 - h0)
            visible &= terrain <= sight
        out[tr - lo, tc] = visible
    return out


def dem_metrics_batch(batch: pa.Table, n: int = GRID_N) -> pa.Table:
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    e = elevation_grids(ids, n)
    rough, tri, tpi9 = window_metrics(e)
    m = n - 2
    b = len(ids)
    rr, cc = np.meshgrid(np.arange(1, n - 1, dtype=np.int64),
                         np.arange(1, n - 1, dtype=np.int64), indexing="ij")
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, m * m), pa.int64()),
            "r": pa.array(np.tile(rr.ravel(), b), pa.int64()),
            "c": pa.array(np.tile(cc.ravel(), b), pa.int64()),
            "roughness": pa.array(rough.reshape(-1), pa.int64()),
            "tri": pa.array(tri.reshape(-1), pa.int64()),
            "tpi9": pa.array(tpi9.reshape(-1), pa.int64()),
        }
    )


def dem_reclass_batch(batch: pa.Table, n: int = GRID_N) -> pa.Table:
    """Per-doc class histogram of the reclassified grid (partial combine —
    the groupby downstream sums tiny per-doc rows, never pixels)."""
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    cls = reclassify(elevation_grids(ids, n))
    b = len(ids)
    nclass = len(RECLASS_BINS) + 1
    counts = np.stack([(cls == k).sum(axis=(1, 2)) for k in range(nclass)], axis=1)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, nclass), pa.int64()),
            "class": pa.array(np.tile(np.arange(nclass, dtype=np.int64), b), pa.int64()),
            "n_cells": pa.array(counts.reshape(-1).astype(np.int64), pa.int64()),
        }
    )


def contour_counts_batch(batch: pa.Table, n: int = GRID_N) -> pa.Table:
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    e = elevation_grids(ids, n)
    out_id, out_lvl, out_crossed, out_segs = [], [], [], []
    for level in CONTOUR_LEVELS:
        crossed, segs = contour_segment_counts(e, level)
        out_id.append(ids)
        out_lvl.append(np.full(len(ids), level, dtype=np.int64))
        out_crossed.append(crossed)
        out_segs.append(segs)
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "level": pa.array(np.concatenate(out_lvl), pa.int64()),
            "n_cells_crossed": pa.array(np.concatenate(out_crossed), pa.int64()),
            "n_segments": pa.array(np.concatenate(out_segs), pa.int64()),
        }
    )


def hillshade_checksum_batch(batch: pa.Table, n: int = GRID_N) -> pa.Table:
    """Per-doc GDAL checksum of the hillshade plane (rows-only driver check;
    hillshade math itself is pytest-verified against a naive reference)."""
    from gdal_ray.stages.stats import checksum_plane

    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    hs = hillshade(elevation_grids(ids, n))
    sums = np.array([checksum_plane(hs[i]) for i in range(len(ids))], dtype=np.int64)
    slope_mean_u = np.round(slope_degrees(elevation_grids(ids, n)).mean(axis=(1, 2)) * 1e6).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "hillshade_checksum": pa.array(sums, pa.int64()),
            "slope_mean_udeg": pa.array(slope_mean_u, pa.int64()),
        }
    )
