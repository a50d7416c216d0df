"""Raster statistics + the GDAL golden-test checksum, per image.

- :func:`checksum_image` is a bit-exact reimplementation of
  ``GDALChecksumImage`` (alg/gdalchecksum.cpp:68): sum over values in
  row-major order of ``value % primes[flat_index % 11]`` with primes
  {7,11,13,17,19,23,29,31,37,41,43}, masked to 16 bits.  For multi-band
  images GDAL checksums each band separately; we expose per-band checksums
  and their canonical combination.
- :func:`image_stats_batch` mirrors ``GDALRasterBand::ComputeStatistics``
  (gcore/gdalrasterband.cpp:6478): streaming min/max/mean/stddev — here per
  image, with the cross-image aggregate done by partial-sums + a tiny
  groupby (never a full shuffle of pixels).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.codecs import decode

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def checksum_plane(plane: np.ndarray) -> int:
    """16-bit modulo-prime checksum of one band (row-major), bit-exact
    with GDALChecksumImage at offset (0,0) for integer AND floating
    bands (alg/gdalchecksum.cpp): floats convert via the GDALCopyWords
    rounding floor(v+0.5) clamped to ±2147483647 (non-finite → INT_MIN),
    and the modulo is C-truncating (negative values leave negative
    remainders), which np.fmod reproduces."""
    flat = plane.reshape(-1)
    if flat.dtype.kind == "f":
        v = np.floor(flat.astype(np.float64) + 0.5)
        finite = np.isfinite(v)
        v = np.clip(v, -2147483647.0, 2147483647.0)
        vals = np.where(finite, v, float(-2147483648)).astype(np.int64)
    else:
        vals = flat.astype(np.int64)
    primes = _PRIMES[np.arange(vals.size, dtype=np.int64) % 11]
    return int(np.sum(np.fmod(vals, primes)) & 0xFFFF)


def checksum_image(img: np.ndarray) -> int:
    """Canonical multi-band combination: XOR of per-band checksums (our
    convention; the reference reports per-band values)."""
    if img.ndim == 2:
        return checksum_plane(img)
    out = 0
    for b in range(img.shape[2]):
        out ^= checksum_plane(img[:, :, b])
    return out


def checksum_batch(batch: pa.Table) -> pa.Table:
    blobs = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    sums = np.empty(len(blobs), dtype=np.int64)
    for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
        sums[i] = checksum_image(decode(blob, fmt))
    return pa.table(
        {
            "image_id": batch.column("image_id"),
            "checksum": pa.array(sums, pa.int64()),
        }
    )


def image_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-image exact stats as integers (sum/sumsq in int64 — uint8 pixels
    can't overflow below ~3e13 pixels), so cross-engine comparison is exact."""
    blobs = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    n = len(blobs)
    mins = np.empty(n, np.int64)
    maxs = np.empty(n, np.int64)
    sums = np.empty(n, np.int64)
    sumsqs = np.empty(n, np.int64)
    counts = np.empty(n, np.int64)
    for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
        img = decode(blob, fmt).astype(np.int64)
        mins[i] = img.min()
        maxs[i] = img.max()
        sums[i] = img.sum()
        sumsqs[i] = int((img * img).sum())
        counts[i] = img.size
    return pa.table(
        {
            "image_id": batch.column("image_id"),
            "px_min": pa.array(mins),
            "px_max": pa.array(maxs),
            "px_sum": pa.array(sums),
            "px_sumsq": pa.array(sumsqs),
            "px_count": pa.array(counts),
        }
    )


def equalization_lut(grids: np.ndarray, levels: int = 256) -> np.ndarray:
    """Histogram-equalization LUT per image (gdalenhance -equalize,
    apps/gdalenhance.cpp ComputeLUT): the classic
    ``lut[v] = (cdf[v] - cdf_min) * (L-1) // (N - cdf_min)`` with integer
    floor division so a SQL window-function twin reproduces it exactly.

    grids: (B, h, w) non-negative ints < levels -> (B, levels) int64."""
    if grids.ndim != 3:
        raise ValueError("expected a (B, h, w) stack")
    B = grids.shape[0]
    total = grids.shape[1] * grids.shape[2]
    idx = (np.arange(B, dtype=np.int64)[:, None, None] * levels
           + grids.astype(np.int64)).ravel()
    counts = np.bincount(idx, minlength=B * levels).reshape(B, levels)
    cdf = counts.cumsum(axis=1)
    occupied = np.where(counts > 0, cdf, total + 1)
    cdfmin = occupied.min(axis=1)[:, None]
    den = np.maximum(total - cdfmin, 1)  # constant image -> all zeros
    return (cdf - cdfmin) * (levels - 1) // den


def equalize(grids: np.ndarray, levels: int = 256) -> np.ndarray:
    """Apply the per-image equalization LUT: (B, h, w) -> (B, h, w)."""
    lut = equalization_lut(grids, levels)
    B = grids.shape[0]
    return lut[np.arange(B)[:, None, None], grids.astype(np.int64)]
