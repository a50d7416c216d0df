"""Image codecs for the engine's `bytes` column (pure stdlib + numpy).

The reference delegates decoding to ~120 format drivers (frmts/…,
registry frmts/gdalallregister.cpp); we do not reimplement format drivers.
The engine's contract is: `bytes` + `fmt` columns in, HxW[xC] uint8 numpy
out, via :func:`decode` inside ``map_batches``.

- ``png``  — real PNG, implemented from the PNG spec in png.py (lossless
  exact-match path).
- ``jpeg`` — REAL baseline JPEG (ITU-T T.81), implemented from the spec
  in jpeg.py: JFIF container, Huffman entropy coding, 4:4:4 encode, any
  ≤2×2-sampled baseline decode.  ``decode`` dispatches on the FFD8 magic,
  so real-world JPEG bytes in the image table decode without libjpeg.
  The synthetic BENCH corpus still uses the fast deterministic container
  below for its `jpeg`/`webp` rows (the pure-Python entropy decoder is a
  conformance path, ~1 s per megapixel — see jpeg.py).
- ``webp`` — REAL WebP, both payloads: VP8L (lossless), implemented
  from the public WebP Lossless Bitstream Specification in webp.py
  (RIFF container, canonical Huffman codes, LZ77 + color cache,
  predictor/subtract-green/color-indexing transforms), and lossy VP8
  key frames, implemented from RFC 6386 in vp8.py (boolean coder,
  token trees, intra 16x16/4x4 prediction, inverse WHT/DCT, loop
  filter) — conformance-tested BIT-EXACT against libwebp's own YUV
  output.  ``decode`` dispatches on the RIFF magic, so real-world
  WebP bytes of either flavor decode without libwebp.
- synth ``jpeg``/``webp`` — deterministic stand-in container (lossy.py):
  uniform quantization (PSNR ≈ 47 dB) stored losslessly; kept as the
  BENCH corpus's fast path (the from-spec entropy decoders above are
  conformance paths, not vectorizable to PNG-path speed).
"""

from __future__ import annotations

import numpy as np

from gdal_ray.codecs.png import decode_png, encode_png
from gdal_ray.codecs.lossy import FAKE_LOSSY_MAGIC, decode_lossy, encode_lossy
from gdal_ray.codecs.jpeg import decode_jpeg, encode_jpeg
from gdal_ray.codecs.webp import decode_webp, encode_webp
from gdal_ray.codecs.tiff import decode_tiff, encode_geotiff, read_geotiff
from gdal_ray.codecs.gif import decode_gif, encode_gif
from gdal_ray.codecs.bmp import decode_bmp, encode_bmp

__all__ = [
    "decode", "decode_batch", "encode", "decode_png", "encode_png",
    "decode_jpeg", "encode_jpeg", "decode_webp", "encode_webp",
    "decode_tiff", "encode_geotiff", "read_geotiff",
    "decode_gif", "encode_gif",
    "decode_bmp", "encode_bmp",
    "FAKE_LOSSY_MAGIC",
]


def encode(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(arr)
    if fmt in ("tiff", "gtiff"):
        return encode_geotiff(arr)
    if fmt == "jpeg-real":
        return encode_jpeg(arr)
    if fmt == "webp-real":
        return encode_webp(arr)
    if fmt == "webp-lossy":
        from gdal_ray.codecs.vp8 import encode_webp_vp8

        return encode_webp_vp8(arr)
    if fmt == "gif":
        return encode_gif(arr)
    if fmt == "bmp":
        return encode_bmp(arr)
    if fmt in ("jpeg", "webp"):
        # bench-corpus fast path (deterministic stand-in container)
        return encode_lossy(arr, fmt)
    raise NotImplementedError(f"codec for fmt={fmt!r} not available in this environment")


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode image bytes to uint8 numpy (H,W) or (H,W,C). fmt is advisory;
    the container magic is authoritative."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:2] == b"\xFF\xD8":
        # production path: system libjpeg (same library the reference
        # links, ~50-100x the from-spec engine); from-spec on fallback
        from gdal_ray.codecs import syscodecs

        if syscodecs.have_sys_jpeg():
            try:
                return syscodecs.jpeg_decode_sys(data)
            except ValueError:
                pass  # CMYK/odd stream: from-spec engine handles it
        return decode_jpeg(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from gdal_ray.codecs import syscodecs

        if syscodecs.have_sys_webp() and data[12:16] in (b"VP8 ", b"VP8L"):
            try:
                return syscodecs.webp_decode_sys(data)
            except ValueError:
                pass
        return decode_webp(data)
    if data[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
        return decode_tiff(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:4] == FAKE_LOSSY_MAGIC:
        return decode_lossy(data)
    if fmt == "tga" or data[-18:] == b"TRUEVISION-XFILE.\x00":
        # TGA has no leading magic; the fmt hint or v2 footer decides
        from gdal_ray.codecs.tga import decode_tga

        return decode_tga(data)[0]
    raise NotImplementedError(
        f"cannot decode fmt={fmt!r}: unrecognized container magic "
        f"{data[:4]!r} (png/jpeg/webp/fake-lossy supported)"
    )


def decode_batch(datas: list[bytes], fmts: list[str] | None = None) -> list:
    """Decode a batch of image blobs (the hot-path entry for map_batches
    stages).  JPEG rows are routed through the pooled vectorized engine
    (:func:`decode_jpeg_batch` — one SIMD lane per restart segment across
    the WHOLE batch); every other container decodes per row."""
    from gdal_ray.codecs import syscodecs
    from gdal_ray.codecs.jpeg import decode_jpeg_batch

    out: list = [None] * len(datas)
    jpeg_idx = [i for i, d in enumerate(datas) if d[:2] == b"\xFF\xD8"]
    if jpeg_idx and syscodecs.have_sys_jpeg():
        # libjpeg per row (the C call releases the GIL; actor-pool
        # concurrency supplies the parallelism) — fall back per image
        still = []
        for i in jpeg_idx:
            try:
                out[i] = syscodecs.jpeg_decode_sys(datas[i])
            except ValueError:
                still.append(i)
        jpeg_idx = still
    if jpeg_idx:
        for i, img in zip(jpeg_idx, decode_jpeg_batch([datas[i] for i in jpeg_idx])):
            out[i] = img
    for i, d in enumerate(datas):
        if out[i] is None:
            out[i] = decode(d, fmts[i] if fmts is not None else None)
    return out
