"""Warp / reprojection — gdalwarp semantics as an actor-pool stage.

Mirrors the reference pipeline (SURVEY.md §3.1):
- transformer chain src pixel → georef → CRS→CRS → dst pixel
  (GDALCreateGenImgProjTransformer2, alg/gdaltransformer.cpp:2182);
- dst grid inference `GDALSuggestedWarpOutput2` (gdaltransformer.cpp:342):
  transform a 21×21 sample grid of source edge+interior points, take the
  envelope, pick a resolution that preserves pixel count along the
  diagonal;
- inverse-mapping resample per dst pixel with the kernels of
  stages/resample.py (alg/gdalwarpkernel.cpp dispatch semantics).

CRS support is the engine's two native frames — EPSG:4326 (lon/lat) and
EPSG:3857 (spherical mercator) — implemented in closed form in
tilemath.py (no PROJ in this sandbox).  The `Reprojector` actor holds the
transform closures + kernel choice once per actor, exactly like the
reference clones per-thread transformer state
(apps/gdalalg_raster_tile.cpp:1887-2060).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray import tilemath as tm
from gdal_ray.codecs import decode, encode
from gdal_ray.stages.resample import _KERNELS


def _fwd(src_crs: str, dst_crs: str):
    """Returns f(x, y) -> (x', y') mapping src CRS coords to dst CRS."""
    if src_crs == dst_crs:
        return lambda x, y: (x, y)
    if (src_crs, dst_crs) == ("EPSG:4326", "EPSG:3857"):
        return lambda lon, lat: tm.lonlat_to_meters(lon, np.clip(lat, -tm.MAX_LATITUDE, tm.MAX_LATITUDE))
    if (src_crs, dst_crs) == ("EPSG:3857", "EPSG:4326"):
        return tm.meters_to_lonlat
    raise NotImplementedError(f"CRS pair {src_crs}->{dst_crs} (only 4326<->3857 in-sandbox)")


def suggested_output(
    w: int, h: int, gt: tuple, src_crs: str, dst_crs: str, samples: int = 21
) -> tuple[int, int, tuple]:
    """GDALSuggestedWarpOutput2-style dst grid: sample grid → envelope →
    resolution preserving diagonal pixel count (gdaltransformer.cpp:342).

    gt = (x0, px_w, 0, y0, 0, -px_h) north-up affine GeoTransform.
    Returns (dst_w, dst_h, dst_gt)."""
    fwd = _fwd(src_crs, dst_crs)
    xs = np.linspace(0, w, samples)
    ys = np.linspace(0, h, samples)
    gx, gy = np.meshgrid(xs, ys)
    sx = gt[0] + gx * gt[1]
    sy = gt[3] + gy * gt[5]
    dx, dy = fwd(sx, sy)
    x0, x1 = float(np.min(dx)), float(np.max(dx))
    y0, y1 = float(np.min(dy)), float(np.max(dy))
    diag_px = float(np.hypot(w, h))
    res = float(np.hypot(x1 - x0, y1 - y0)) / diag_px
    # pixel counts rounded to nearest (GDALSuggestedWarpOutput2 uses
    # (extent/res + 0.5) truncation, keeping the diagonal pixel count)
    dst_w = max(int((x1 - x0) / res + 0.5), 1)
    dst_h = max(int((y1 - y0) / res + 0.5), 1)
    return dst_w, dst_h, (x0, res, 0.0, y1, 0.0, -res)


def warp_image(
    img: np.ndarray,
    src_gt: tuple,
    src_crs: str,
    dst_crs: str,
    *,
    dst_size: tuple[int, int] | None = None,
    dst_gt: tuple | None = None,
    method: str = "nearest",
    nodata: float = 0.0,
) -> tuple[np.ndarray, tuple]:
    """Inverse-mapping warp of one image.  Returns (dst_img, dst_gt)."""
    h, w = img.shape[:2]
    if dst_gt is None or dst_size is None:
        dw, dh, dst_gt = suggested_output(w, h, src_gt, src_crs, dst_crs)
    else:
        dw, dh = dst_size
    inv = _fwd(dst_crs, src_crs)
    # dst pixel centers -> dst CRS -> src CRS -> src pixel coords
    cols = dst_gt[0] + (np.arange(dw) + 0.5) * dst_gt[1]
    rows = dst_gt[3] + (np.arange(dh) + 0.5) * dst_gt[5]
    gx, gy = np.meshgrid(cols, rows)
    sx_geo, sy_geo = inv(gx, gy)
    fx = (sx_geo - src_gt[0]) / src_gt[1] - 0.5  # src pixel-center coords
    fy = (sy_geo - src_gt[3]) / src_gt[5] - 0.5
    # epsilon absorbs projection roundtrip noise at the shared envelope edge
    eps = 1e-6
    valid = (fx >= -0.5 - eps) & (fx <= w - 0.5 + eps) & (fy >= -0.5 - eps) & (fy <= h - 0.5 + eps)

    if method == "nearest":
        xi = np.clip(np.rint(fx).astype(np.int64), 0, w - 1)
        yi = np.clip(np.rint(fy).astype(np.int64), 0, h - 1)
        out = img[yi, xi].astype(np.float64)
    elif method in _KERNELS:
        fn, radius = _KERNELS[method]
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        acc = np.zeros((dh, dw) + img.shape[2:], dtype=np.float64)
        wsum = np.zeros((dh, dw), dtype=np.float64)
        for oy in range(-radius + 1, radius + 1):
            wy = fn((y0 + oy - fy).astype(np.float64))
            yi = np.clip(y0 + oy, 0, h - 1)
            for ox in range(-radius + 1, radius + 1):
                wx = fn((x0 + ox - fx).astype(np.float64))
                xi = np.clip(x0 + ox, 0, w - 1)
                wgt = wy * wx
                sample = img[yi, xi].astype(np.float64)
                if sample.ndim == 3:
                    acc += sample * wgt[..., None]
                else:
                    acc += sample * wgt
                wsum += wgt
        wsum[wsum == 0] = 1.0
        out = acc / (wsum[..., None] if acc.ndim == 3 else wsum)
    else:
        raise ValueError(f"unknown warp method {method!r}")

    if not valid.all():
        out[~valid] = nodata
    if np.issubdtype(img.dtype, np.integer):
        info = np.iinfo(img.dtype)
        out = np.clip(np.floor(out + 0.5), info.min, info.max).astype(img.dtype)
    return out, dst_gt


class Reprojector:
    """Actor-pool stage: reproject each image row 4326→3857 (or reverse).

    Input batch columns: bytes, fmt, lon_min/lat_min/lon_max/lat_max.
    Output: reprojected bytes (+ dst geotransform columns).  Transform
    closures + kernel tables are bound once per actor.
    """

    def __init__(self, src_crs: str = "EPSG:4326", dst_crs: str = "EPSG:3857", method: str = "bilinear"):
        self.src_crs = src_crs
        self.dst_crs = dst_crs
        self.method = method
        _fwd(src_crs, dst_crs)  # validate pair eagerly (actor init fails fast)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        lon0 = batch.column("lon_min").to_numpy()
        lat0 = batch.column("lat_min").to_numpy()
        lon1 = batch.column("lon_max").to_numpy()
        lat1 = batch.column("lat_max").to_numpy()
        out_bytes, gts = [], []
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            img = decode(blob, fmt)
            h, w = img.shape[:2]
            gt = (lon0[i], (lon1[i] - lon0[i]) / w, 0.0, lat1[i], 0.0, -(lat1[i] - lat0[i]) / h)
            warped, dst_gt = warp_image(img, gt, self.src_crs, self.dst_crs, method=self.method)
            out_bytes.append(encode(warped, "png"))
            gts.append(dst_gt)
        g = np.array(gts, dtype=np.float64).reshape(-1, 6)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "bytes": pa.array(out_bytes, pa.binary()),
                "fmt": pa.array(["png"] * len(out_bytes), pa.string()),
                "caption": batch.column("caption"),
                "dst_x0": pa.array(g[:, 0]),
                "dst_res": pa.array(g[:, 1]),
                "dst_y0": pa.array(g[:, 3]),
            }
        )
