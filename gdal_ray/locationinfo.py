"""Point query on a raster — the gdallocationinfo analogue
(reference: apps/gdallocationinfo.cpp).

`location_info(path, x, y, coords=...)` reports the pixel/line hit and
per-band values at one or more query points:

- coords="pixel": x/y are pixel/line directly.
- coords="geo":   x/y are in the raster's georeferenced CRS; inverted
  through the geotransform (GeoTIFF path).
- coords="wgs84": x/y are lon/lat; transformed to the raster CRS first
  (crs.transform_fn), then through the geotransform — the -wgs84 flag.

Interpolation matches the reference default: nearest pixel (truncation
to the containing cell); `interpolate="bilinear"` gives the
InterpolateAtPoint behavior for float queries.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.codecs import decode
from gdal_ray.codecs.tiff import read_geotiff


def _invert_gt(gt, X, Y):
    # x = gt0 + px*gt1 + py*gt2 ; y = gt3 + px*gt4 + py*gt5
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0:
        raise ValueError("degenerate geotransform")
    dx = np.asarray(X, dtype=np.float64) - gt[0]
    dy = np.asarray(Y, dtype=np.float64) - gt[3]
    px = (dx * gt[5] - dy * gt[2]) / det
    py = (dy * gt[1] - dx * gt[4]) / det
    return px, py


def location_info(path: str, x, y, *, coords: str = "pixel",
                  interpolate: str = "nearest") -> list[dict]:
    with open(path, "rb") as f:
        data = f.read()
    gt = None
    epsg = None
    if data[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
        arr, info = read_geotiff(data)
        gt = info.get("geotransform")
        epsg = info.get("epsg")
    else:
        arr = decode(data, None)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nbands = arr.shape

    X = np.atleast_1d(np.asarray(x, dtype=np.float64))
    Y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    if coords == "pixel":
        px, py = X, Y
    elif coords in ("geo", "wgs84"):
        if gt is None:
            raise ValueError("raster has no geotransform (pixel coords only)")
        if coords == "wgs84" and epsg and epsg != 4326:
            from gdal_ray.crs import transform_fn

            X, Y = transform_fn("EPSG:4326", f"EPSG:{epsg}")(X, Y)
        px, py = _invert_gt(gt, X, Y)
    else:
        raise ValueError("coords must be pixel, geo or wgs84")

    out = []
    for i in range(len(px)):
        col, row = float(px[i]), float(py[i])
        rec: dict = {"pixel": col, "line": row}
        if not (0 <= col < w and 0 <= row < h):
            rec["in_raster"] = False
            rec["values"] = None
        else:
            rec["in_raster"] = True
            if interpolate == "bilinear":
                c0 = int(np.clip(np.floor(col - 0.5), 0, w - 2))
                r0 = int(np.clip(np.floor(row - 0.5), 0, h - 2))
                fc = np.clip(col - 0.5 - c0, 0.0, 1.0)
                fr = np.clip(row - 0.5 - r0, 0.0, 1.0)
                v = (arr[r0, c0].astype(np.float64) * (1 - fr) * (1 - fc)
                     + arr[r0, c0 + 1] * (1 - fr) * fc
                     + arr[r0 + 1, c0] * fr * (1 - fc)
                     + arr[r0 + 1, c0 + 1] * fr * fc)
                rec["values"] = [float(b) for b in v]
            else:
                rec["values"] = [float(b)
                                 for b in arr[int(row), int(col)].tolist()]
        out.append(rec)
    return out
