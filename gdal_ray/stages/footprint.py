"""Decode + verify + footprint stage (the ingest map of the flagship pipeline).

Mirrors what ``gdaltindex`` computes (a footprint record per raster,
apps/gdaltindex_lib.cpp:43-57) fused with the decode step: bytes → pixels →
sanity-check (w, h) → per-image quick stats → footprint geometry (WKB box
from the lon/lat columns) — one zero-copy Arrow batch in, one out.

Decode work is per-row by necessity (each blob is its own bitstream), but
all bookkeeping stays vectorized and the stage is fused by Ray Data with
its neighbors, so no decoded pixels ever cross stage boundaries
(SURVEY.md §7 "never shuffle decoded pixels").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.codecs import decode_batch
from gdal_ray.geometry.wkb import encode_polygon


_K = np.arange(256, dtype=np.int64)
_K2 = _K * _K


def decode_and_footprint(batch: pa.Table) -> pa.Table:
    """Arrow in/out: validates every blob decodes to (h, w), adds
    pixel_mean/pixel_std (float64) and footprint_wkb (binary) columns."""
    batch = batch.replace_schema_metadata(None)  # keep schemas hashable
    blobs = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    ws = batch.column("w").to_numpy()
    hs = batch.column("h").to_numpy()
    n = len(blobs)
    means = np.empty(n, dtype=np.float64)
    stds = np.empty(n, dtype=np.float64)
    # batch decode: JPEG rows share one pooled vectorized entropy scan
    imgs = decode_batch(blobs, fmts)
    for i in range(n):
        img = imgs[i]
        ih, iw = img.shape[:2]
        if (iw, ih) != (int(ws[i]), int(hs[i])):
            raise ValueError(
                f"decoded dims {(iw, ih)} != declared {(int(ws[i]), int(hs[i]))}"
            )
        # histogram pass over uint8 (no int64 copy): exact integer sums
        # from Σ k·h[k] / Σ k²·h[k]; std via E[x²]−E[x]² stays exact
        hist = np.bincount(img.reshape(-1), minlength=256)
        s = int(np.dot(_K, hist))
        sq = int(np.dot(_K2, hist))
        npx = img.size
        means[i] = s / npx
        stds[i] = float(np.sqrt(max(sq / npx - means[i] * means[i], 0.0)))
    lon0 = batch.column("lon_min").to_numpy()
    lat0 = batch.column("lat_min").to_numpy()
    lon1 = batch.column("lon_max").to_numpy()
    lat1 = batch.column("lat_max").to_numpy()
    wkbs = [
        encode_polygon(
            [np.array([[lon0[i], lat0[i]], [lon1[i], lat0[i]], [lon1[i], lat1[i]], [lon0[i], lat1[i]]])]
        )
        for i in range(n)
    ]
    return (
        batch.append_column("pixel_mean", pa.array(means, pa.float64()))
        .append_column("pixel_std", pa.array(stds, pa.float64()))
        .append_column("footprint_wkb", pa.array(wkbs, pa.binary()))
    )
