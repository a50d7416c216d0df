"""Resampling kernels (pure numpy) with GDAL's kernel definitions.

Kernel math follows ``alg/gdalresamplingkernels.h`` and the resampler
registry ``GDALResampleAlg`` (alg/gdalwarper.h:37-69):

- nearest  — pixel-center convention: src = floor((dst+0.5)*scale)
- bilinear — triangle kernel, radius 1
- cubic    — Catmull-Rom (a = -0.5), radius 2 (CubicKernel)
- lanczos  — sinc windowed, radius 3 (LanczosSincKernel)
- average  — exact box coverage with fractional edge weights, the
  semantics of the overview average reducer (gcore/overview.cpp:1168
  template: partial source windows at edges contribute proportionally)

All resamplers use the half-pixel-center inverse mapping
``src_x = (dst_x + 0.5) * (src_size / dst_size) - 0.5`` — the same grid
convention as GDALWarpKernel.  Edge handling clamps to the valid range
(GDAL's default edge behavior for non-nodata input).

These run per image inside ``map_batches`` — no shuffle; a whole-pyramid
build shuffles only (z,x,y)-keyed tiles, never raw pixels.
"""

from __future__ import annotations

import numpy as np


def _cubic_weight(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    ax = np.abs(x)
    w = np.zeros_like(ax)
    m1 = ax <= 1
    m2 = (ax > 1) & (ax < 2)
    w[m1] = ((a + 2) * ax[m1] - (a + 3)) * ax[m1] * ax[m1] + 1
    w[m2] = (((ax[m2] - 5) * ax[m2] + 8) * ax[m2] - 4) * a
    return w


def _lanczos_weight(x: np.ndarray, radius: int = 3) -> np.ndarray:
    w = np.sinc(x) * np.sinc(x / radius)
    w[np.abs(x) >= radius] = 0.0
    return w


def _bilinear_weight(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


def _bspline_weight(x: np.ndarray) -> np.ndarray:
    """Cubic B-spline B₃ (GRA_CubicSpline — alg/gdalresamplingkernels.h
    CubicSplineKernel): smoothing, not interpolating; partition of unity."""
    ax = np.abs(x)
    w = np.zeros_like(ax)
    m1 = ax < 1
    m2 = (ax >= 1) & (ax < 2)
    w[m1] = (4.0 - 6.0 * ax[m1] ** 2 + 3.0 * ax[m1] ** 3) / 6.0
    w[m2] = (2.0 - ax[m2]) ** 3 / 6.0
    return w


_KERNELS = {
    "bilinear": (_bilinear_weight, 1),
    "cubic": (_cubic_weight, 2),
    "cubicspline": (_bspline_weight, 2),
    "lanczos": (_lanczos_weight, 3),
}


def _resample_axis(img: np.ndarray, out_size: int, axis: int, kernel: str) -> np.ndarray:
    """Separable 1-D resample along `axis` (float64 accumulation)."""
    in_size = img.shape[axis]
    scale = in_size / out_size
    centers = (np.arange(out_size) + 0.5) * scale - 0.5
    fn, radius = _KERNELS[kernel]
    # kernel footprint scales up when downsampling (GDAL convolution
    # resamplers widen the kernel by the scale factor when scale > 1)
    ksc = max(scale, 1.0)
    half = int(np.ceil(radius * ksc))
    offsets = np.arange(-half, half + 1)
    idx = np.floor(centers).astype(np.int64)[:, None] + offsets[None, :]
    dist = (idx - centers[:, None]) / ksc
    w = fn(dist.astype(np.float64))
    wsum = w.sum(axis=1, keepdims=True)
    wsum[wsum == 0] = 1.0
    w = w / wsum
    idx = np.clip(idx, 0, in_size - 1)
    moved = np.moveaxis(img, axis, 0).astype(np.float64)
    out = np.einsum("ok,ok...->o...", w, moved[idx])
    return np.moveaxis(out, 0, axis)


def resize(img: np.ndarray, out_w: int, out_h: int, method: str = "nearest") -> np.ndarray:
    """Resize (H, W[, C]) uint8/float to (out_h, out_w[, C])."""
    h, w = img.shape[:2]
    if method == "nearest":
        sy = (np.arange(out_h) + 0.5) * (h / out_h)
        sx = (np.arange(out_w) + 0.5) * (w / out_w)
        yi = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
        xi = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
        return img[yi][:, xi]
    if method == "average":
        return _box_average(img, out_w, out_h)
    if method in _KERNELS:
        out = _resample_axis(img.astype(np.float64), out_h, 0, method)
        out = _resample_axis(out, out_w, 1, method)
        if np.issubdtype(img.dtype, np.integer):
            info = np.iinfo(img.dtype)
            return np.clip(np.floor(out + 0.5), info.min, info.max).astype(img.dtype)
        return out
    raise ValueError(f"unknown resampling method {method!r}")


def rows_needed(in_size: int, out_size: int, y0: int, th: int,
                method: str) -> tuple[int, int]:
    """Source row range [r0, r1) that output rows [y0, y0+th) of a
    full resize(in_size → out_size) depend on — the strip-parallel
    read-window contract for resize_rows."""
    scale = in_size / out_size
    if method == "nearest":
        sy = (np.arange(y0, y0 + th) + 0.5) * scale
        yi = np.clip(np.floor(sy).astype(np.int64), 0, in_size - 1)
        return int(yi.min()), int(yi.max()) + 1
    if method == "average":
        r0 = int(np.floor(y0 * scale))
        r1 = int(np.ceil((y0 + th) * scale))
        return max(r0, 0), min(max(r1, r0 + 1), in_size)
    _, radius = _KERNELS[method]
    centers = (np.arange(y0, y0 + th) + 0.5) * scale - 0.5
    half = int(np.ceil(radius * max(scale, 1.0)))
    lo = int(np.floor(centers.min())) - half
    hi = int(np.floor(centers.max())) + half
    return max(lo, 0), min(hi + 1, in_size)


def resize_rows(win: np.ndarray, win_r0: int, in_h: int, out_w: int,
                out_h: int, y0: int, th: int,
                method: str = "nearest") -> np.ndarray:
    """Exactly ``resize(full, out_w, out_h, method)[y0:y0+th]`` computed
    from only the source row window ``win = full[win_r0:win_r1]`` (the
    caller sizes the window with :func:`rows_needed`).  Column taps use
    the full width, so strips are independent — the distributed
    gdal_translate -outsize shape."""
    scale = in_h / out_h
    if method == "nearest":
        sy = (np.arange(y0, y0 + th) + 0.5) * scale
        yi = np.clip(np.floor(sy).astype(np.int64), 0, in_h - 1) - win_r0
        rows = win[yi]
        sx = (np.arange(out_w) + 0.5) * (win.shape[1] / out_w)
        xi = np.clip(np.floor(sx).astype(np.int64), 0, win.shape[1] - 1)
        return rows[:, xi]
    if method == "average":
        starts = np.arange(y0, y0 + th) * scale
        ends = starts + scale
        out = np.empty((th,) + win.shape[1:], dtype=np.float64)
        for o in range(th):
            s, e = starts[o], ends[o]
            i0, i1 = int(np.floor(s)), int(np.ceil(e))
            i1 = min(i1, in_h)
            sl = win[i0 - win_r0:i1 - win_r0].astype(np.float64)
            wts = np.ones(i1 - i0)
            wts[0] -= s - i0
            wts[-1] -= i1 - e
            wts = np.clip(wts, 0, None)
            shape = (len(wts),) + (1,) * (sl.ndim - 1)
            out[o] = (sl * wts.reshape(shape)).sum(axis=0) / wts.sum()
        out = _box_average_axis(out, out_w, 1)
        if np.issubdtype(win.dtype, np.integer):
            info = np.iinfo(win.dtype)
            return np.clip(np.floor(out + 0.5), info.min, info.max
                           ).astype(win.dtype)
        return out
    if method in _KERNELS:
        fn, radius = _KERNELS[method]
        centers = (np.arange(y0, y0 + th) + 0.5) * scale - 0.5
        ksc = max(scale, 1.0)
        half = int(np.ceil(radius * ksc))
        offsets = np.arange(-half, half + 1)
        idx = np.floor(centers).astype(np.int64)[:, None] + offsets[None, :]
        dist = (idx - centers[:, None]) / ksc
        w = fn(dist.astype(np.float64))
        wsum = w.sum(axis=1, keepdims=True)
        wsum[wsum == 0] = 1.0
        w = w / wsum
        idx = np.clip(idx, 0, in_h - 1) - win_r0
        out = np.einsum("ok,ok...->o...", w, win.astype(np.float64)[idx])
        out = _resample_axis(out, out_w, 1, method)
        if np.issubdtype(win.dtype, np.integer):
            info = np.iinfo(win.dtype)
            return np.clip(np.floor(out + 0.5), info.min, info.max
                           ).astype(win.dtype)
        return out
    raise ValueError(f"unknown resampling method {method!r}")


def _box_average(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Exact-coverage box average (overview.cpp average semantics: source
    pixels partially covered by the destination footprint get fractional
    weight)."""
    h, w = img.shape[:2]
    out = _box_average_axis(img.astype(np.float64), out_h, 0)
    out = _box_average_axis(out, out_w, 1)
    if np.issubdtype(img.dtype, np.integer):
        info = np.iinfo(img.dtype)
        return np.clip(np.floor(out + 0.5), info.min, info.max).astype(img.dtype)
    return out


def _box_average_axis(img: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    in_size = img.shape[axis]
    scale = in_size / out_size
    starts = np.arange(out_size) * scale
    ends = starts + scale
    moved = np.moveaxis(img, axis, 0)
    out = np.empty((out_size,) + moved.shape[1:], dtype=np.float64)
    for o in range(out_size):
        s, e = starts[o], ends[o]
        i0, i1 = int(np.floor(s)), int(np.ceil(e))
        i1 = min(i1, in_size)
        sl = moved[i0:i1].astype(np.float64)
        wts = np.ones(i1 - i0)
        wts[0] -= s - i0
        wts[-1] -= i1 - e
        wts = np.clip(wts, 0, None)
        shape = (len(wts),) + (1,) * (sl.ndim - 1)
        out[o] = (sl * wts.reshape(shape)).sum(axis=0) / wts.sum()
    return np.moveaxis(out, 0, axis)


def downsample_2x2_average(img: np.ndarray) -> np.ndarray:
    """The pyramid 4→1 reducer (overview.cpp average for the common 2×
    integer factor; odd trailing row/col handled by exact coverage)."""
    h, w = img.shape[:2]
    return _box_average(img, (w + 1) // 2, (h + 1) // 2)
