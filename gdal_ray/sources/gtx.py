"""GTX vertical-datum grid driver (.gtx) + geoid-height transform.

Format (NOAA VDatum / PROJ vgridshift, as read by the reference's
frmts/gtx/gtxdataset.cpp): a 40-byte big-endian header —

    float64 ll_lat, ll_lon   (degrees; lon may be 0..360)
    float64 delta_lat, delta_lon
    int32   n_rows, n_cols

— followed by n_rows*n_cols big-endian float32 heights, row 0 =
SOUTHERNMOST row (like NTv2), each row west->east.  -88.8888 is the
conventional nodata.

`gtx_interp` gives bilinear geoid height at lon/lat; `apply_geoid`
converts ellipsoidal <-> orthometric heights (h = H + N).
"""

from __future__ import annotations

import struct

import numpy as np

GTX_NODATA = -88.8888


def read_gtx(path_or_bytes):
    """-> (ll_lat, ll_lon, dlat, dlon, grid[rows, cols] float64 with NaN
    for nodata)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    if len(buf) < 40:
        raise ValueError("not a GTX file (short header)")
    ll_lat, ll_lon, dlat, dlon = struct.unpack(">4d", buf[:32])
    nrows, ncols = struct.unpack(">2i", buf[32:40])
    if nrows <= 0 or ncols <= 0 or 40 + nrows * ncols * 4 > len(buf):
        raise ValueError("not a GTX file (bad dimensions)")
    grid = np.frombuffer(buf, dtype=">f4", count=nrows * ncols,
                         offset=40).reshape(nrows, ncols).astype(np.float64)
    grid = np.where(np.isclose(grid, GTX_NODATA, atol=1e-3), np.nan, grid)
    return ll_lat, ll_lon, dlat, dlon, grid


def write_gtx(path: str, ll_lat: float, ll_lon: float, dlat: float,
              dlon: float, grid: np.ndarray) -> None:
    grid = np.asarray(grid, dtype=np.float64)
    out = struct.pack(">4d", ll_lat, ll_lon, dlat, dlon)
    out += struct.pack(">2i", grid.shape[0], grid.shape[1])
    g = np.where(np.isnan(grid), GTX_NODATA, grid)
    out += g.astype(">f4").tobytes()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    import os
    os.replace(tmp, path)


def gtx_interp(path_or_parsed):
    """-> geoid(lon, lat) giving bilinear-interpolated heights; NaN
    outside the grid or on nodata corners."""
    parsed = (read_gtx(path_or_parsed)
              if isinstance(path_or_parsed, (str, bytes, bytearray))
              else path_or_parsed)
    ll_lat, ll_lon, dlat, dlon, grid = parsed
    nrows, ncols = grid.shape

    def geoid(lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        # GTX files may use 0..360 longitudes
        lon_g = np.where(lon < ll_lon, lon + 360.0, lon) if ll_lon >= 0 \
            else lon
        col = (lon_g - ll_lon) / dlon
        row = (lat - ll_lat) / dlat
        ok = (col >= 0) & (col <= ncols - 1) & (row >= 0) & (row <= nrows - 1)
        c0 = np.clip(np.floor(col).astype(np.int64), 0, ncols - 2)
        r0 = np.clip(np.floor(row).astype(np.int64), 0, nrows - 2)
        fc = col - c0
        fr = row - r0
        v = (grid[r0, c0] * (1 - fr) * (1 - fc)
             + grid[r0, c0 + 1] * (1 - fr) * fc
             + grid[r0 + 1, c0] * fr * (1 - fc)
             + grid[r0 + 1, c0 + 1] * fr * fc)
        return np.where(ok, v, np.nan)

    return geoid


def apply_geoid(path, lon, lat, h, *, direction: str = "ellips_to_ortho"):
    """h_ortho = h_ellips - N ('ellips_to_ortho'); the inverse adds N.
    NaN geoid (outside grid) passes heights through unchanged."""
    n = gtx_interp(path)(lon, lat)
    h = np.asarray(h, dtype=np.float64)
    adj = np.where(np.isnan(n), 0.0, n)
    if direction == "ellips_to_ortho":
        return h - adj
    if direction == "ortho_to_ellips":
        return h + adj
    raise ValueError("direction must be ellips_to_ortho or ortho_to_ellips")


def read_gtx_dataset(path: str, *, rows_per_chunk: int = 512):
    """.gtx -> Dataset of row-band chunks (south-up), the chunked-raster
    contract used by every other grid store."""
    import ray.data as rd

    ll_lat, ll_lon, dlat, dlon, grid = read_gtx(path)
    nrows, ncols = grid.shape
    rows = []
    for i, r0 in enumerate(range(0, nrows, rows_per_chunk)):
        part = grid[r0:r0 + rows_per_chunk]
        rows.append({
            "chunk_id": i,
            "row0": r0,
            "width": ncols,
            "height": part.shape[0],
            "south": ll_lat + r0 * dlat,
            "west": ll_lon,
            "dlat": dlat,
            "dlon": dlon,
            "data": np.where(np.isnan(part), GTX_NODATA,
                             part).astype(np.float32).tobytes(),
            "dtype": "float32",
        })
    return rd.from_items(rows)
