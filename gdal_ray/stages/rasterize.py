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
