"""Color-table ops: median-cut palette, palette application, Floyd-
Steinberg error-diffusion dither, palette→RGB expansion, and Brovey
pansharpening (reference: alg/gdalmediancut.cpp GDALComputeMedianCutPCT,
alg/gdaldither.cpp GDALDitherRGB2PCT, rgb2pct.py/pct2rgb.py,
alg/gdalpansharpen.cpp weighted-Brovey kernel).

Palette computation is a global aggregate at design scale: sample pixels
per batch (deterministic stride), reduce the histogram driver-side (tiny),
broadcast the palette back into the per-image apply/dither stage — the
same sample→reduce→broadcast shape as GDAL's two-pass rgb2pct."""

from __future__ import annotations

import numpy as np


def median_cut_palette(pixels: np.ndarray, n_colors: int = 16) -> np.ndarray:
    """(n, 3) uint8 sample → (n_colors, 3) uint8 palette.  Classic
    median-cut: recursively split the box with the largest channel range at
    the median of that channel; deterministic (stable sorts, index order).
    """
    px = np.asarray(pixels, dtype=np.uint8).reshape(-1, 3)
    boxes = [px]
    while len(boxes) < n_colors:
        # split the box with the largest single-channel range
        ranges = [int(b.max(axis=0).astype(int).__sub__(b.min(axis=0).astype(int)).max()) if len(b) else -1
                  for b in boxes]
        bi = int(np.argmax(ranges))
        b = boxes[bi]
        if len(b) < 2 or ranges[bi] <= 0:
            break
        ch = int(np.argmax(b.max(axis=0).astype(int) - b.min(axis=0).astype(int)))
        order = np.argsort(b[:, ch], kind="mergesort")
        half = len(b) // 2
        boxes[bi : bi + 1] = [b[order[:half]], b[order[half:]]]
    pal = np.array([b.mean(axis=0).round() if len(b) else (0, 0, 0) for b in boxes], dtype=np.uint8)
    # pad to n_colors for a fixed-size table (GDAL color tables are fixed)
    if len(pal) < n_colors:
        pal = np.vstack([pal, np.zeros((n_colors - len(pal), 3), np.uint8)])
    return pal


def nearest_palette_index(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """(h, w, 3) → (h, w) uint8 index of the nearest palette color
    (euclidean, ties → smaller index).  Expanded-square matmul form: every
    term is an integer < 2^53 so the float64 distances are EXACT and the
    argmin (first-min tie rule) matches integer arithmetic bit-for-bit."""
    flat = np.asarray(img, dtype=np.float64).reshape(-1, 3)
    pal = np.asarray(palette, dtype=np.float64)
    d2 = (flat * flat).sum(1, keepdims=True) - 2.0 * (flat @ pal.T) + (pal * pal).sum(1)[None, :]
    return d2.argmin(axis=1).astype(np.uint8).reshape(np.asarray(img).shape[:2])


def expand_palette(idx: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """pct2rgb: (h, w) index + palette → (h, w, 3) uint8."""
    return np.asarray(palette, dtype=np.uint8)[np.asarray(idx)]


def dither_fs(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Floyd-Steinberg error diffusion to a fixed palette → (h, w) index.
    Serpentine OFF (left-to-right every row), the reference's layout
    (gdaldither.cpp processes scanlines in order)."""
    h, w = img.shape[:2]
    work = np.asarray(img, dtype=np.float64).copy()
    pal = np.asarray(palette, dtype=np.float64)
    out = np.zeros((h, w), dtype=np.uint8)
    for r in range(h):
        for c in range(w):
            old = work[r, c]
            i = int(((pal - old) ** 2).sum(axis=1).argmin())
            out[r, c] = i
            err = old - pal[i]
            if c + 1 < w:
                work[r, c + 1] += err * (7 / 16)
            if r + 1 < h:
                if c > 0:
                    work[r + 1, c - 1] += err * (3 / 16)
                work[r + 1, c] += err * (5 / 16)
                if c + 1 < w:
                    work[r + 1, c + 1] += err * (1 / 16)
    return out


def brovey_core(up: np.ndarray, pan: np.ndarray,
                weights=(1 / 3, 1 / 3, 1 / 3)) -> np.ndarray:
    """Weighted-Brovey kernel on ALREADY-upsampled multispectral `up`
    (gdalpansharpen.cpp): out_b = in_b * pan / pseudo_pan with
    pseudo_pan = Σ w_b · in_b.  Row-local, so the strip-parallel
    pansharpen door applies it per strip and matches the single-pass
    :func:`pansharpen_brovey` exactly."""
    up = np.asarray(up, dtype=np.float64)
    wts = np.asarray(weights, dtype=np.float64)
    pseudo = (up * wts[None, None, :]).sum(axis=2)
    pseudo[pseudo == 0] = 1.0
    ratio = np.asarray(pan, dtype=np.float64) / pseudo
    out = up * ratio[:, :, None]
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def pansharpen_brovey(rgb_lowres: np.ndarray, pan: np.ndarray,
                      weights=(1 / 3, 1 / 3, 1 / 3)) -> np.ndarray:
    """Weighted Brovey (gdalpansharpen.cpp): nearest-upsample the low-res
    multispectral to the pan grid, then :func:`brovey_core`."""
    from gdal_ray.stages.resample import resize

    ph, pw = pan.shape[:2]
    up = resize(rgb_lowres, pw, ph, method="nearest")
    return brovey_core(up, pan, weights)


def color_relief(e: np.ndarray, ramp) -> np.ndarray:
    """gdaldem color-relief (apps/gdaldem_lib.cpp GDALColorRelief /
    ColorAssociation piecewise-linear interpolation): map elevation to RGB
    through a sorted ``[(elev, (r, g, b)), ...]`` ramp.  Integer-exact
    variant: each channel is ``(lo_c*(hi-e) + hi_c*(e-lo)) // (hi-lo)``
    (all terms non-negative, so floor == truncate and a SQL twin
    reproduces the values bit-exactly).  Elevations outside the ramp
    clamp to the end colors, as the reference does."""
    elevs = np.asarray([v for v, _ in ramp], dtype=np.int64)
    cols = np.asarray([c for _, c in ramp], dtype=np.int64)  # (K, 3)
    ec = np.clip(np.asarray(e, dtype=np.int64), elevs[0], elevs[-1])
    idx = np.clip(np.searchsorted(elevs, ec, side="right") - 1,
                  0, len(elevs) - 2)
    lo, hi = elevs[idx], elevs[idx + 1]
    den = hi - lo
    out = np.empty(ec.shape + (3,), dtype=np.int64)
    for ch in range(3):
        lc, hc = cols[idx, ch], cols[idx + 1, ch]
        out[..., ch] = (lc * (hi - ec) + hc * (ec - lo)) // den
    return out


_COLOR_NAMES = {
    # the named colors gdaldem's color file accepts (GDALGetColorEntry
    # names used by apps/gdaldem_lib.cpp GDALColorReliefParseColor)
    "white": (255, 255, 255), "black": (0, 0, 0), "red": (255, 0, 0),
    "green": (0, 255, 0), "blue": (0, 0, 255), "yellow": (255, 255, 0),
    "magenta": (255, 0, 255), "cyan": (0, 255, 255), "gray": (128, 128, 128),
    "grey": (128, 128, 128), "orange": (255, 165, 0), "brown": (165, 42, 42),
    "purple": (128, 0, 128), "violet": (238, 130, 238), "indigo": (75, 0, 130),
}


def parse_color_file(text: str, *, min_val: float | None = None,
                     max_val: float | None = None):
    """gdaldem color-relief color-text-file parser
    (apps/gdaldem_lib.cpp GDALColorReliefParseColorFile): one rule per
    line — ``elevation R G B [A]``, ``elevation colorname``, or
    ``N% R G B`` (percentages need min_val/max_val of the raster); `nv`
    marks the nodata color (returned separately).  '#' and '//'
    comments, blank lines, comma or whitespace separators.  Returns
    (sorted ramp [(value, (r, g, b))], nodata_color_or_None)."""
    ramp = []
    nv = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].split("//", 1)[0].strip()
        if not line:
            continue
        parts = [p for p in line.replace(",", " ").split() if p]
        key, rest = parts[0], parts[1:]
        if len(rest) == 1 and rest[0].lower() in _COLOR_NAMES:
            color = _COLOR_NAMES[rest[0].lower()]
        else:
            vals = [int(float(v)) for v in rest[:3]]
            if len(vals) < 3:
                raise ValueError(f"bad color rule: {raw!r}")
            color = tuple(vals)
        if key.lower() == "nv":
            nv = color
            continue
        if key.endswith("%"):
            if min_val is None or max_val is None:
                raise ValueError("percentage rules need min_val/max_val")
            val = min_val + (max_val - min_val) * float(key[:-1]) / 100.0
        else:
            val = float(key)
        ramp.append((int(round(val)), color))
    ramp.sort(key=lambda t: t[0])
    return ramp, nv
