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

CRS support: EPSG:4326 (lon/lat), EPSG:3857 (spherical mercator,
closed form in tilemath.py) and every WGS84 UTM zone
(EPSG:326xx/327xx — Krüger-series transverse Mercator in crs.py;
no PROJ in this sandbox).  The `Reprojector` actor holds the
transform closures + kernel choice once per actor, exactly like the
reference clones per-thread transformer state
(apps/gdalalg_raster_tile.cpp:1887-2060).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.codecs import decode, encode
from gdal_ray.stages.resample import _KERNELS


def _fwd(src_crs: str, dst_crs: str):
    """Returns f(x, y) -> (x', y') mapping src CRS coords to dst CRS.
    Supported frames: EPSG:4326, EPSG:3857, and all WGS84 UTM zones
    (EPSG:326xx/327xx, closed-form Krüger tmerc in gdal_ray/crs.py)."""
    from gdal_ray.crs import transform_fn

    return transform_fn(src_crs, dst_crs)


def suggested_output(
    w: int, h: int, gt: tuple, src_crs: str, dst_crs: str, samples: int = 21,
    fwd=None,
) -> tuple[int, int, tuple]:
    """GDALSuggestedWarpOutput2-style dst grid: sample grid → envelope →
    resolution preserving diagonal pixel count (gdaltransformer.cpp:342).

    gt = (x0, px_w, 0, y0, 0, -px_h) north-up affine GeoTransform.
    ``fwd`` overrides the CRS-pair transform (GCP/TPS transformers).
    Returns (dst_w, dst_h, dst_gt)."""
    if fwd is None:
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


def approx_inverse_grid(inv, dst_gt: tuple, dw: int, dh: int, src_gt: tuple,
                        tol_px: float = 0.125):
    """Error-bounded approximate transformer (GDALApproxTransform,
    alg/gdaltransformer.cpp:4315): per scanline, transform the two
    endpoints + midpoint; where the midpoint deviates from the linear
    interpolation by less than `tol_px` SOURCE pixels, fill the span
    linearly; otherwise subdivide.  All candidate midpoints of a round are
    transformed in ONE vectorized call, so the exact-transform count drops
    from dw×dh to O(dh·log dw·nonlinearity).

    Returns (fx, fy): source pixel-center coordinates for every dst pixel
    center, each within tol_px of the exact transform."""
    cols = dst_gt[0] + (np.arange(dw) + 0.5) * dst_gt[1]
    rows = dst_gt[3] + (np.arange(dh) + 0.5) * dst_gt[5]

    def to_src_px(gx, gy):
        sx, sy = inv(gx, gy)
        return ((sx - src_gt[0]) / src_gt[1] - 0.5,
                (sy - src_gt[3]) / src_gt[5] - 0.5)

    fx = np.empty((dh, dw))
    fy = np.empty((dh, dw))
    # segment queue: (row, ia, ib) with transformed endpoints
    ia = np.zeros(dh, dtype=np.int64)
    ib = np.full(dh, dw - 1, dtype=np.int64)
    rr = np.arange(dh, dtype=np.int64)
    ax, ay = to_src_px(cols[ia], rows[rr])
    bx, by = to_src_px(cols[ib], rows[rr])
    fx[rr, ia] = ax; fy[rr, ia] = ay
    fx[rr, ib] = bx; fy[rr, ib] = by
    segs = (rr, ia, ib, ax, ay, bx, by)
    while len(segs[0]):
        rr, ia, ib, ax, ay, bx, by = segs
        gap = ib - ia
        active = gap > 1
        rr, ia, ib = rr[active], ia[active], ib[active]
        ax, ay, bx, by = ax[active], ay[active], bx[active], by[active]
        if len(rr) == 0:
            break
        im = (ia + ib) // 2
        mx, my = to_src_px(cols[im], rows[rr])
        fx[rr, im] = mx; fy[rr, im] = my
        t = (im - ia) / (ib - ia)
        lx = ax + t * (bx - ax)
        ly = ay + t * (by - ay)
        ok = (np.abs(lx - mx) <= tol_px) & (np.abs(ly - my) <= tol_px)
        # linear-fill accepted spans (both halves)
        for sel, lo, hi, lox, loy, hix, hiy in (
            (ok, ia, im, ax, ay, mx, my),
            (ok, im, ib, mx, my, bx, by),
        ):
            for k in np.nonzero(sel)[0]:
                a, b = int(lo[k]), int(hi[k])
                if b - a > 1:
                    tt = np.arange(a + 1, b) - a
                    frac = tt / (b - a)
                    fx[rr[k], a + 1 : b] = lox[k] + frac * (hix[k] - lox[k])
                    fy[rr[k], a + 1 : b] = loy[k] + frac * (hiy[k] - loy[k])
        bad = ~ok
        segs = (
            np.concatenate([rr[bad], rr[bad]]),
            np.concatenate([ia[bad], im[bad]]),
            np.concatenate([im[bad], ib[bad]]),
            np.concatenate([ax[bad], mx[bad]]),
            np.concatenate([ay[bad], my[bad]]),
            np.concatenate([mx[bad], bx[bad]]),
            np.concatenate([my[bad], by[bad]]),
        )
    return fx, fy


def cutline_mask(dst_gt: tuple, dw: int, dh: int, rings) -> np.ndarray:
    """(dh, dw) bool mask of dst pixel CENTERS inside the cutline polygon
    (even-odd rule — same pixel-center semantics as the rasterizer,
    alg/llrasterize.cpp:49; reference cutline: alg/gdalcutline.cpp)."""
    from gdal_ray.geometry.predicates import points_in_rings

    cx = dst_gt[0] + (np.arange(dw) + 0.5) * dst_gt[1]
    cy = dst_gt[3] + (np.arange(dh) + 0.5) * dst_gt[5]
    gx, gy = np.meshgrid(cx, cy)
    return points_in_rings(gx.ravel(), gy.ravel(), rings).reshape(dh, dw)


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
    src_nodata: float | None = None,
    cutline=None,
    approx_tol: float | None = None,
    transformer=None,
) -> tuple[np.ndarray, tuple]:
    """Inverse-mapping warp of one image.  Returns (dst_img, dst_gt).

    ``src_nodata`` masks matching source pixels out of the kernel weighting
    (the per-band padfSrcNoDataReal of alg/gdalwarper.h:185): kernel
    weights renormalize over valid samples; a dst pixel with no valid
    support becomes ``nodata``.  ``cutline`` (list of rings in dst CRS)
    masks dst pixel centers outside the polygon (alg/gdalcutline.cpp).
    ``approx_tol`` (source pixels, GDAL default 0.125) switches the
    coordinate transform to the error-bounded scanline approximator.
    ``transformer=(fwd, inv)`` overrides the CRS pair with explicit
    georef transforms (GCP polynomial / TPS — see warp_image_gcp)."""
    h, w = img.shape[:2]
    if transformer is not None:
        fwd_t, inv = transformer
    else:
        fwd_t, inv = None, _fwd(dst_crs, src_crs)
    if dst_gt is None or dst_size is None:
        dw, dh, dst_gt = suggested_output(w, h, src_gt, src_crs, dst_crs, fwd=fwd_t)
    else:
        dw, dh = dst_size
    if approx_tol is not None:
        fx, fy = approx_inverse_grid(inv, dst_gt, dw, dh, src_gt, approx_tol)
    else:
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
    src_valid = None if src_nodata is None else (
        (img != src_nodata) if img.ndim == 2 else (img != src_nodata).all(axis=2)
    )

    if method == "nearest":
        xi = np.clip(np.rint(fx).astype(np.int64), 0, w - 1)
        yi = np.clip(np.rint(fy).astype(np.int64), 0, h - 1)
        out = img[yi, xi].astype(np.float64)
        if src_valid is not None:
            valid = valid & src_valid[yi, xi]
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
                if src_valid is not None:
                    wgt = wgt * src_valid[yi, xi]
                sample = img[yi, xi].astype(np.float64)
                if sample.ndim == 3:
                    acc += sample * wgt[..., None]
                else:
                    acc += sample * wgt
                wsum += wgt
        if src_valid is not None:
            valid = valid & (wsum > 0)
        wsum[wsum == 0] = 1.0
        out = acc / (wsum[..., None] if acc.ndim == 3 else wsum)
    else:
        raise ValueError(f"unknown warp method {method!r}")

    if cutline is not None:
        valid = valid & cutline_mask(dst_gt, dw, dh, cutline)
    if not valid.all():
        out[~valid] = nodata
    if np.issubdtype(img.dtype, np.integer):
        info = np.iinfo(img.dtype)
        out = np.clip(np.floor(out + 0.5), info.min, info.max).astype(img.dtype)
    return out, dst_gt


def warp_image_gcp(
    img: np.ndarray,
    gcps,
    *,
    order: int | None = None,
    tps: bool = False,
    dst_size: tuple[int, int] | None = None,
    dst_gt: tuple | None = None,
    method: str = "nearest",
    nodata: float = 0.0,
    src_nodata: float | None = None,
) -> tuple[np.ndarray, tuple]:
    """gdalwarp with GCPs: georeference an unreferenced image from ground
    control points (pixel, line, X, Y) and resample it onto a north-up
    grid.  ``tps=True`` uses the thin-plate-spline transformer
    (GDALCreateTPSTransformer, alg/gdal_tps.cpp); otherwise a least-squares
    polynomial of ``order`` 1-3 (GDALCreateGCPTransformer, alg/gdal_crs.c;
    None = auto).  The GCP transformer replaces the source GeoTransform —
    pixel space IS the source frame — so the warp runs with an identity
    src_gt and the fitted (fwd, inv) pair."""
    from gdal_ray.transformer import gcp_polynomial, tps_transformer

    pair = tps_transformer(gcps) if tps else gcp_polynomial(gcps, order=order)
    return warp_image(
        img, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), "GCP", "GCP",
        dst_size=dst_size, dst_gt=dst_gt, method=method, nodata=nodata,
        src_nodata=src_nodata, transformer=pair,
    )


_AGG_STATS = ("average", "sum", "min", "max", "mode", "med", "q1", "q3", "count")


def warp_aggregate(
    img: np.ndarray,
    src_gt: tuple,
    src_crs: str,
    dst_crs: str,
    *,
    dst_size: tuple[int, int] | None = None,
    dst_gt: tuple | None = None,
    stat: str = "average",
    nodata: float = 0.0,
    src_nodata: float | None = None,
    cutline=None,
) -> tuple[np.ndarray, tuple]:
    """Aggregating warp resamplers (GRA_Average/Sum/Min/Max/Mode/Med/Q1/Q3,
    alg/gdalwarper.h:37-69): every source pixel CENTER is forward-mapped to
    the dst cell whose footprint contains it, then each dst cell reduces
    its contributors.  Exact for separable monotone transforms (our
    axis-aligned CRS pairs), fully vectorized via flat-cell bincount /
    sort+reduceat — the gather formulation of GDAL's
    "all source pixels within the dst rect" semantics.

    Quantile stats use linear interpolation (DuckDB quantile_cont
    semantics, so SQL oracles are exact); GDAL's GRA_Med/Q1/Q3 selection
    rule differs in the even-count case.  Mode ties resolve to the
    smallest value (deterministic; GDAL resolves by scan order)."""
    if stat not in _AGG_STATS:
        raise ValueError(f"unknown aggregate stat {stat!r}")
    # The edge-midline sampling below is exact only for SEPARABLE transforms
    # (x'(x), y'(y) independently).  4326<->3857 is separable; UTM (tmerc)
    # is not — refuse instead of silently mis-assigning source pixels.
    _sep = {"EPSG:4326", "EPSG:3857"}
    if src_crs != dst_crs and not (src_crs in _sep and dst_crs in _sep):
        raise NotImplementedError(
            f"warp_aggregate requires a separable CRS pair; got {src_crs}->{dst_crs} "
            "(use warp() with a point-wise resampler for non-separable transforms)"
        )
    h, w = img.shape[:2]
    if dst_gt is None or dst_size is None:
        dw, dh, dst_gt = suggested_output(w, h, src_gt, src_crs, dst_crs)
    else:
        dw, dh = dst_size
    inv = _fwd(dst_crs, src_crs)
    # dst cell EDGES -> src geo -> src pixel coords (separable: x'(x), y'(y))
    xe = dst_gt[0] + np.arange(dw + 1) * dst_gt[1]
    ye = dst_gt[3] + np.arange(dh + 1) * dst_gt[5]
    ymid = np.full_like(xe, (ye[0] + ye[-1]) / 2)
    xmid = np.full_like(ye, (xe[0] + xe[-1]) / 2)
    sxe = (inv(xe, ymid)[0] - src_gt[0]) / src_gt[1]  # src px units, 0..w
    sye = (inv(xmid, ye)[1] - src_gt[3]) / src_gt[5]
    # monotone edges (flip if transform reverses axis direction)
    xflip = sxe[0] > sxe[-1]
    yflip = sye[0] > sye[-1]
    if xflip:
        sxe = sxe[::-1]
    if yflip:
        sye = sye[::-1]
    # src pixel center k+0.5 belongs to the dst cell whose [e_i, e_{i+1})
    # interval contains it
    col_of = np.searchsorted(sxe, np.arange(w) + 0.5, side="right") - 1
    row_of = np.searchsorted(sye, np.arange(h) + 0.5, side="right") - 1
    if xflip:
        col_of = dw - 1 - col_of
    if yflip:
        row_of = dh - 1 - row_of
    okc = (col_of >= 0) & (col_of < dw)
    okr = (row_of >= 0) & (row_of < dh)
    cell = row_of[:, None] * dw + col_of[None, :]
    ok = okr[:, None] & okc[None, :]
    if src_nodata is not None:
        sv = (img != src_nodata) if img.ndim == 2 else (img != src_nodata).all(axis=2)
        ok = ok & sv
    flat_cell = cell[ok]
    ncell = dh * dw
    counts = np.bincount(flat_cell, minlength=ncell)
    nch = 1 if img.ndim == 2 else img.shape[2]
    out = np.full((ncell, nch), np.float64(nodata))
    vals2d = img.reshape(h * w, -1)[ok.ravel()].astype(np.float64)
    have = counts > 0
    for ch in range(nch):
        v = vals2d[:, ch]
        if stat == "count":
            out[:, ch] = counts
            continue
        if stat == "sum":
            out[have, ch] = np.bincount(flat_cell, weights=v, minlength=ncell)[have]
        elif stat == "average":
            out[have, ch] = (
                np.bincount(flat_cell, weights=v, minlength=ncell)[have] / counts[have]
            )
        else:
            order = np.lexsort((v, flat_cell))
            sc = flat_cell[order]
            sval = v[order]
            starts = np.searchsorted(sc, np.arange(ncell), side="left")
            ends = np.searchsorted(sc, np.arange(ncell), side="right")
            cidx = np.nonzero(have)[0]
            s, e = starts[cidx], ends[cidx]
            if stat == "min":
                out[cidx, ch] = sval[s]
            elif stat == "max":
                out[cidx, ch] = sval[e - 1]
            elif stat in ("med", "q1", "q3"):
                q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[stat]
                pos = (e - s - 1) * q
                lo = s + np.floor(pos).astype(np.int64)
                frac = pos - np.floor(pos)
                hi = np.minimum(lo + 1, e - 1)
                out[cidx, ch] = sval[lo] * (1 - frac) + sval[hi] * frac
            elif stat == "mode":
                # run-lengths of equal values within each sorted cell block;
                # ties -> smallest value (first max run in sorted order)
                n = len(sval)
                newrun = np.ones(n, dtype=bool)
                newrun[1:] = (sval[1:] != sval[:-1]) | (sc[1:] != sc[:-1])
                run_id = np.cumsum(newrun) - 1
                run_len = np.bincount(run_id)
                run_start = np.nonzero(newrun)[0]
                run_cell = sc[run_start]
                run_val = sval[run_start]
                # vectorized per-cell argmax: sort runs by (cell, len asc,
                # val desc) and take the LAST run of each cell block — max
                # length, ties resolved to the smallest value
                order2 = np.lexsort((-run_val, run_len, run_cell))
                rc = run_cell[order2]
                last = np.searchsorted(rc, cidx, side="right") - 1
                out[cidx, ch] = run_val[order2][last]
    outg = out.reshape(dh, dw, nch)
    if img.ndim == 2:
        outg = outg[:, :, 0]
    if cutline is not None:
        cmask = cutline_mask(dst_gt, dw, dh, cutline)
        outg[~cmask] = nodata
    if np.issubdtype(img.dtype, np.integer) and stat not in ("count", "sum"):
        info = np.iinfo(img.dtype)
        valid_cells = have.reshape(dh, dw)
        rounded = np.clip(np.floor(outg + 0.5), info.min, info.max).astype(img.dtype)
        outg = np.where(
            valid_cells[..., None] if outg.ndim == 3 else valid_cells,
            rounded,
            np.asarray(nodata, dtype=img.dtype),
        )
    return outg, dst_gt


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
