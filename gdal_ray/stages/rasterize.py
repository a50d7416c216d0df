"""Rasterize (vector → raster): burn polygons into per-tile pixel grids.

Semantics per the reference scanline rasterizer
(alg/gdalrasterize.cpp:981 ``GDALRasterizeGeometries`` +
alg/llrasterize.cpp:58 ``GDALdllImageFilledPolygon``):

- a pixel is burned iff its CENTER falls inside the polygon
  (llrasterize.cpp:49-53), even-odd crossing rule;
- MERGE_ALG: REPLACE (last burn wins, input order) or ADD (accumulate);
- burn value fixed or per-feature attribute.

Implementation: vectorized even-odd test of all pixel centers of the tile
against each polygon's rings (geometry/predicates.points_in_rings) —
mathematically identical to scanline crossing-fill for the same rule, and
fully vectorized in numpy.  Runs per tile/image inside map_batches; the
distributed plan is: cover polygons with tile cells (flat_map) →
groupby(tile) → burn per tile (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geometry.predicates import points_in_rings, ring_bbox
from gdal_ray.geometry.wkb import polygon_rings


def rasterize_polygons(
    wkbs: list[bytes],
    burn_values: list[float],
    *,
    width: int,
    height: int,
    origin_x: float,
    origin_y: float,
    pixel_w: float,
    pixel_h: float,
    merge_alg: str = "REPLACE",
    init_value: float = 0.0,
    dtype=np.float64,
) -> np.ndarray:
    """Burn polygons into a (height, width) grid.

    Grid convention mirrors the GDAL GeoTransform with north-up rasters:
    pixel (row r, col c) center is at
      x = origin_x + (c + 0.5) * pixel_w
      y = origin_y - (r + 0.5) * pixel_h    (origin_y = top edge)
    """
    out = np.full((height, width), init_value, dtype=dtype)
    cx = origin_x + (np.arange(width) + 0.5) * pixel_w
    cy = origin_y - (np.arange(height) + 0.5) * pixel_h
    for wkb, burn in zip(wkbs, burn_values):
        rings = polygon_rings(wkb)
        bx0, by0, bx1, by1 = ring_bbox(rings)
        # clip the candidate window like gdal_rasterize's chunking does
        c0 = max(int(np.floor((bx0 - origin_x) / pixel_w - 0.5)), 0)
        c1 = min(int(np.ceil((bx1 - origin_x) / pixel_w + 0.5)), width)
        r0 = max(int(np.floor((origin_y - by1) / pixel_h - 0.5)), 0)
        r1 = min(int(np.ceil((origin_y - by0) / pixel_h + 0.5)), height)
        if c0 >= c1 or r0 >= r1:
            continue
        gx, gy = np.meshgrid(cx[c0:c1], cy[r0:r1])
        inside = points_in_rings(gx.ravel(), gy.ravel(), rings).reshape(gy.shape)
        win = out[r0:r1, c0:c1]
        if merge_alg == "ADD":
            win[inside] += burn
        else:
            win[inside] = burn
        out[r0:r1, c0:c1] = win
    return out


def zonal_stats(mask: np.ndarray, values: np.ndarray) -> dict:
    """Zonal statistics of a value raster under a burned zone mask — the
    gdal_rasterize + masked-numpy idiom (and QGIS/rasterio zonal stats):
    count / sum / min / max / mean over pixels where mask is set.

    Pure kernel (one zone): the distributed shape is map_batches over a
    polygon table, each task rasterizing its polygons' own grids and
    aggregating — embarrassingly parallel, no shuffle (see
    pipelines/queries.q_zonal_stats)."""
    sel = values[mask != 0]
    if sel.size == 0:
        return {"count": 0, "sum": 0.0, "min": None, "max": None,
                "mean": None}
    s = float(sel.sum(dtype=np.float64))
    return {"count": int(sel.size), "sum": s, "min": float(sel.min()),
            "max": float(sel.max()), "mean": s / sel.size}


# --------------------------------------------------------------- ALL_TOUCHED

def _edge_touched_cells(u0: float, v0: float, u1: float, v1: float,
                        width: int, height: int, mark: np.ndarray) -> None:
    """Mark every grid cell [i,i+1)x[j,j+1) whose interior the segment
    (in continuous pixel coordinates) passes through — a vectorized
    supercover traversal: split the segment at every integer-u and
    integer-v crossing, sample each sub-interval at its midpoint."""
    du, dv = u1 - u0, v1 - v0
    ts = [np.array([0.0, 1.0])]
    if du != 0.0:
        lo, hi = (u0, u1) if u0 < u1 else (u1, u0)
        ks = np.arange(np.ceil(lo), np.floor(hi) + 1.0)
        ts.append((ks - u0) / du)
    if dv != 0.0:
        lo, hi = (v0, v1) if v0 < v1 else (v1, v0)
        ks = np.arange(np.ceil(lo), np.floor(hi) + 1.0)
        ts.append((ks - v0) / dv)
    t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
    tm = (t[:-1] + t[1:]) * 0.5
    if tm.size == 0:
        tm = np.array([0.5])
    cols = np.floor(u0 + tm * du).astype(np.int64)
    rows = np.floor(v0 + tm * dv).astype(np.int64)
    ok = (cols >= 0) & (cols < width) & (rows >= 0) & (rows < height)
    mark[rows[ok], cols[ok]] = True


def all_touched_mask(rings: list[np.ndarray], *, width: int, height: int,
                     origin_x: float, origin_y: float,
                     pixel_w: float, pixel_h: float) -> np.ndarray:
    """GDAL ``-at`` / ALL_TOUCHED=TRUE semantics
    (alg/llrasterize.cpp:229 GDALdllImageLineAllTouched +
    gdalrasterize.cpp bAllTouched): burn every pixel the polygon
    BOUNDARY passes through, plus every pixel whose center is inside
    (even-odd).  Boundary cells come from the supercover edge walk —
    cells the open segment intersects; pixels the geometry only grazes
    at an exact cell border follow midpoint-side convention (GDAL's own
    exact-gridline ties are likewise implementation-convention)."""
    mask = np.zeros((height, width), dtype=bool)
    for r in rings:
        u = (r[:, 0] - origin_x) / pixel_w
        v = (origin_y - r[:, 1]) / pixel_h
        for i in range(len(r) - 1):
            _edge_touched_cells(u[i], v[i], u[i + 1], v[i + 1],
                                width, height, mask)
    cx = origin_x + (np.arange(width) + 0.5) * pixel_w
    cy = origin_y - (np.arange(height) + 0.5) * pixel_h
    gx, gy = np.meshgrid(cx, cy)
    mask |= points_in_rings(gx.ravel(), gy.ravel(), rings).reshape(mask.shape)
    return mask


def rasterize_polygons_all_touched(
        wkbs: list[bytes], burn_values: list[float], *, width: int,
        height: int, origin_x: float, origin_y: float, pixel_w: float,
        pixel_h: float, merge_alg: str = "REPLACE",
        init_value: float = 0.0, dtype=np.float64) -> np.ndarray:
    """gdal_rasterize -at: like rasterize_polygons but with ALL_TOUCHED
    burning (same grid convention, MERGE_ALG and burn-order rules)."""
    out = np.full((height, width), init_value, dtype=dtype)
    for wkb, burn in zip(wkbs, burn_values):
        rings = polygon_rings(wkb)
        m = all_touched_mask(rings, width=width, height=height,
                             origin_x=origin_x, origin_y=origin_y,
                             pixel_w=pixel_w, pixel_h=pixel_h)
        if merge_alg == "ADD":
            out[m] += burn
        else:
            out[m] = burn
    return out


def rasterize_lines(
        wkbs: list[bytes], burn_values: list[float], *, width: int,
        height: int, origin_x: float, origin_y: float, pixel_w: float,
        pixel_h: float, all_touched: bool = False,
        merge_alg: str = "REPLACE", init_value: float = 0.0,
        dtype=np.float64) -> np.ndarray:
    """Burn LineStrings (alg/llrasterize.cpp:94 GDALdllImageLine default
    Bresenham path; :229 GDALdllImageLineAllTouched for -at).

    Default rule: Bresenham between the pixel cells containing the
    endpoints — one pixel per major-axis step.  ALL_TOUCHED: every cell
    the segment passes through (the same supercover walk as polygons).
    """
    from gdal_ray.geometry.wkb import GeomType, decode_wkb

    out = np.full((height, width), init_value, dtype=dtype)
    for wkb, burn in zip(wkbs, burn_values):
        kind, parts = decode_wkb(wkb)
        if kind == GeomType.LINESTRING:
            lines = [parts]
        elif kind == GeomType.MULTILINESTRING:
            lines = [pts for _, pts in parts]
        else:
            raise ValueError(f"rasterize_lines: unsupported geometry {kind}")
        mask = np.zeros((height, width), dtype=bool)
        for pts in lines:
            u = (np.asarray(pts)[:, 0] - origin_x) / pixel_w
            v = (origin_y - np.asarray(pts)[:, 1]) / pixel_h
            for i in range(len(u) - 1):
                if all_touched:
                    _edge_touched_cells(u[i], v[i], u[i + 1], v[i + 1],
                                        width, height, mask)
                else:
                    _bresenham_cells(u[i], v[i], u[i + 1], v[i + 1],
                                     width, height, mask)
        if merge_alg == "ADD":
            out[mask] += burn
        else:
            out[mask] = burn
    return out


def _bresenham_cells(u0: float, v0: float, u1: float, v1: float,
                     width: int, height: int, mark: np.ndarray) -> None:
    """Vectorized Bresenham-style raster line: sample the segment once
    per major-axis cell step at the step midpoint (equivalent pixel set
    to the classic integer DDA for cell-to-cell lines)."""
    c0, r0 = np.floor(u0), np.floor(v0)
    c1, r1 = np.floor(u1), np.floor(v1)
    n = int(max(abs(c1 - c0), abs(r1 - r0))) + 1
    t = (np.arange(n) + 0.5) / n
    cols = np.floor(c0 + 0.5 + t * (c1 - c0)).astype(np.int64)
    rows = np.floor(r0 + 0.5 + t * (r1 - r0)).astype(np.int64)
    ok = (cols >= 0) & (cols < width) & (rows >= 0) & (rows < height)
    mark[rows[ok], cols[ok]] = True


def rasterize_points(
        xs: np.ndarray, ys: np.ndarray, burn_values: np.ndarray, *,
        width: int, height: int, origin_x: float, origin_y: float,
        pixel_w: float, pixel_h: float, merge_alg: str = "REPLACE",
        init_value: float = 0.0, dtype=np.float64) -> np.ndarray:
    """Burn points: each point marks the cell containing it
    (gdalrasterize.cpp point path) — fully vectorized."""
    out = np.full((height, width), init_value, dtype=dtype)
    cols = np.floor((np.asarray(xs) - origin_x) / pixel_w).astype(np.int64)
    rows = np.floor((origin_y - np.asarray(ys)) / pixel_h).astype(np.int64)
    ok = (cols >= 0) & (cols < width) & (rows >= 0) & (rows < height)
    if merge_alg == "ADD":
        np.add.at(out, (rows[ok], cols[ok]), np.asarray(burn_values)[ok])
    else:
        out[rows[ok], cols[ok]] = np.asarray(burn_values)[ok]
    return out
