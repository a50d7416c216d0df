"""XYZ tile assignment — the tile *planning* half of gdal2tiles / `gdal
raster tile` as a vectorized flat map.

Reproduces the reference's planning semantics (not rendering):
- native zoom from pixel size via ZoomForPixelSize (gdal2tiles.py:503);
- covering tile range from the footprint corners with the boundary-in-
  lower-tile convention (PixelsToTile, gdal2tiles.py:479);
- XYZ (top-left origin) tile ids (GoogleTile, :511);
- quadkey cell id for downstream cell-keyed shuffles (QuadTree, :517).

The expansion (one image row → its covering (z,x,y) rows) is done with
np.repeat inside one map_batches call — a vectorized flat_map, no Python
per-row loop, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray import tilemath as tm


def native_zoom(lon_min, lon_max, w, max_zoom: int = 20):
    """Zoom whose resolution best matches the image's ground resolution.

    Ground meters/pixel is measured on the mercator plane at the equator
    (the same convention the reference uses to pick max zoom from the
    warped dataset's geotransform, apps/gdalalg_raster_tile.cpp).
    """
    res_deg = (np.asarray(lon_max) - np.asarray(lon_min)) / np.maximum(np.asarray(w, dtype=np.float64), 1.0)
    res_m = res_deg * (tm.ORIGIN_SHIFT / 180.0)
    return np.clip(tm.zoom_for_pixel_size(res_m), 0, max_zoom).astype(np.int64)


def assign_tiles(batch: pa.Table, *, max_zoom: int = 20, max_tiles_per_image: int = 256) -> pa.Table:
    """image rows -> (image_id, z, x, y, cell_id, caption) assignment rows."""
    lon0 = batch.column("lon_min").to_numpy()
    lat0 = batch.column("lat_min").to_numpy()
    lon1 = batch.column("lon_max").to_numpy()
    lat1 = batch.column("lat_max").to_numpy()
    w = batch.column("w").to_numpy()
    z = native_zoom(lon0, lon1, w, max_zoom)

    x0, x1, y0, y1 = tm.bbox_to_tile_range_xyz(lon0, lat0, lon1, lat1, z)
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    # Safety valve at design scale: an absurd bbox/zoom combination must not
    # explode a single row into millions of tiles — clamp zoom down instead.
    count = nx * ny
    over = count > max_tiles_per_image
    while np.any(over):
        z = np.where(over, np.maximum(z - 1, 0), z)
        x0, x1, y0, y1 = tm.bbox_to_tile_range_xyz(lon0, lat0, lon1, lat1, z)
        nx, ny = x1 - x0 + 1, y1 - y0 + 1
        newcount = nx * ny
        if np.array_equal(newcount, count):
            break
        count = newcount
        over = (count > max_tiles_per_image) & (z > 0)

    count = (nx * ny).astype(np.int64)
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), count)
    # per-row local tile offsets, vectorized: for each output row, its ordinal
    # within its image (0..count-1), then decompose into (dx, dy)
    starts = np.concatenate([[0], np.cumsum(count)[:-1]])
    ordinal = np.arange(int(count.sum()), dtype=np.int64) - np.repeat(starts, count)
    nx_r = nx[idx]
    dx = ordinal % nx_r
    dy = ordinal // nx_r
    xs = x0[idx] + dx
    ys = y0[idx] + dy
    zs = z[idx]
    cell = tm.quadkey_int(xs, ys, zs)

    image_id = batch.column("image_id").take(pa.array(idx))
    caption = batch.column("caption").take(pa.array(idx))
    return pa.table(
        {
            "image_id": image_id,
            "z": pa.array(zs, pa.int64()),
            "x": pa.array(xs, pa.int64()),
            "y": pa.array(ys, pa.int64()),
            "cell_id": pa.array(cell, pa.int64()),
            "caption": caption,
        }
    )


def center_tile_assign(batch: pa.Table, *, zoom: int) -> pa.Table:
    """Single-tile assignment of each image's center point at a fixed zoom —
    the SQL-checkable core of tile assignment (one row in, one row out)."""
    lon = (batch.column("lon_min").to_numpy() + batch.column("lon_max").to_numpy()) / 2.0
    lat = (batch.column("lat_min").to_numpy() + batch.column("lat_max").to_numpy()) / 2.0
    x, y = tm.lonlat_to_tile_xyz(lon, lat, zoom)
    return pa.table(
        {
            "image_id": batch.column("image_id"),
            "z": pa.array(np.full(len(batch), zoom, dtype=np.int64)),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )
