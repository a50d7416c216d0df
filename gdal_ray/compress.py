"""Optional native compression codecs (zstd, lz4) via the system shared
libraries, behind an import-try gate.

The reference links these the same way (GTiff COMPRESSION=ZSTD via
libzstd, frmts/gtiff; Zarr's zstd/blosc codecs via the same libraries).
No Python bindings exist in this environment, but the C one-shot APIs
are stable and tiny, so ctypes suffices:

    ZSTD_compress / ZSTD_decompress / ZSTD_getFrameContentSize
    LZ4_compress_default / LZ4_decompress_safe

Callers must treat availability as optional: `HAVE_ZSTD` / `HAVE_LZ4`
are False when the libraries are absent and the functions raise
NotImplementedError (the engine's honest-gate convention)."""

from __future__ import annotations

import ctypes

try:
    _zstd = ctypes.CDLL("libzstd.so.1")
    _zstd.ZSTD_compressBound.restype = ctypes.c_size_t
    _zstd.ZSTD_compress.restype = ctypes.c_size_t
    _zstd.ZSTD_decompress.restype = ctypes.c_size_t
    _zstd.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
    _zstd.ZSTD_isError.restype = ctypes.c_uint
    HAVE_ZSTD = True
except OSError:  # pragma: no cover - environment without libzstd
    _zstd = None
    HAVE_ZSTD = False

try:
    _lz4 = ctypes.CDLL("liblz4.so.1")
    _lz4.LZ4_compressBound.restype = ctypes.c_int
    _lz4.LZ4_compress_default.restype = ctypes.c_int
    _lz4.LZ4_decompress_safe.restype = ctypes.c_int
    HAVE_LZ4 = True
except OSError:  # pragma: no cover
    _lz4 = None
    HAVE_LZ4 = False


def zstd_compress(data: bytes, level: int = 9) -> bytes:
    if not HAVE_ZSTD:
        raise NotImplementedError("libzstd not available")
    bound = _zstd.ZSTD_compressBound(ctypes.c_size_t(len(data)))
    out = ctypes.create_string_buffer(bound)
    n = _zstd.ZSTD_compress(out, ctypes.c_size_t(bound), data,
                            ctypes.c_size_t(len(data)), ctypes.c_int(level))
    if _zstd.ZSTD_isError(ctypes.c_size_t(n)):
        raise ValueError("zstd compression failed")
    return out.raw[:n]


def zstd_decompress(data: bytes, expected_size: int | None = None) -> bytes:
    if not HAVE_ZSTD:
        raise NotImplementedError("libzstd not available")
    if expected_size is None:
        size = _zstd.ZSTD_getFrameContentSize(data, ctypes.c_size_t(len(data)))
        if size in (2 ** 64 - 1, 2 ** 64 - 2) or size > (1 << 33):
            raise ValueError("zstd frame without a usable content size")
        expected_size = int(size)
    out = ctypes.create_string_buffer(max(expected_size, 1))
    n = _zstd.ZSTD_decompress(out, ctypes.c_size_t(expected_size), data,
                              ctypes.c_size_t(len(data)))
    if _zstd.ZSTD_isError(ctypes.c_size_t(n)):
        raise ValueError("zstd decompression failed")
    return out.raw[:n]


def lz4_block_compress(data: bytes) -> bytes:
    if not HAVE_LZ4:
        raise NotImplementedError("liblz4 not available")
    bound = _lz4.LZ4_compressBound(ctypes.c_int(len(data)))
    out = ctypes.create_string_buffer(bound)
    n = _lz4.LZ4_compress_default(data, out, ctypes.c_int(len(data)),
                                  ctypes.c_int(bound))
    if n <= 0:
        raise ValueError("lz4 compression failed")
    return out.raw[:n]


def lz4_block_decompress(data: bytes, expected_size: int) -> bytes:
    if not HAVE_LZ4:
        raise NotImplementedError("liblz4 not available")
    out = ctypes.create_string_buffer(max(expected_size, 1))
    n = _lz4.LZ4_decompress_safe(data, out, ctypes.c_int(len(data)),
                                 ctypes.c_int(expected_size))
    if n < 0:
        raise ValueError("lz4 decompression failed")
    return out.raw[:n]
