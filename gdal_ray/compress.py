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


# ---------------------------------------------------------------------------
# Blosc1 frames (the numcodecs default for Zarr v2) — public format:
# 16-byte header [version, versionlz, flags, typesize, nbytes u32,
# blocksize u32, cbytes u32] + u32 block-start offsets + per-block
# compressed payloads.  flags: bit0 byte-shuffle, bit1 pure memcpy,
# bit2 bit-shuffle, bits 5-7 inner codec (0 blosclz, 1 lz4/lz4hc,
# 3 zlib, 4 zstd).  Shuffle applies PER BLOCK over whole elements; a
# trailing partial element is copied unshuffled.

import struct as _struct

import numpy as _np

_BLOSC_CODECS = {1: "lz4", 3: "zlib", 4: "zstd"}
_BLOSC_CODES = {v: k for k, v in _BLOSC_CODECS.items()}


def _shuffle(block: bytes, typesize: int, forward: bool) -> bytes:
    if typesize <= 1 or len(block) < typesize:
        return block
    n = (len(block) // typesize) * typesize
    body = _np.frombuffer(block[:n], dtype=_np.uint8)
    if forward:
        out = body.reshape(-1, typesize).T.reshape(-1)
    else:
        out = body.reshape(typesize, -1).T.reshape(-1)
    return out.tobytes() + block[n:]


def _inner_decompress(payload: bytes, codec: str, expected: int) -> bytes:
    if codec == "lz4":
        return lz4_block_decompress(payload, expected)
    if codec == "zlib":
        import zlib

        return zlib.decompress(payload)
    return zstd_decompress(payload, expected)


def _inner_compress(raw: bytes, codec: str, level: int) -> bytes:
    if codec == "lz4":
        return lz4_block_compress(raw)
    if codec == "zlib":
        import zlib

        return zlib.compress(raw, level)
    return zstd_compress(raw, level)


def blosc_decompress(frame: bytes) -> bytes:
    if len(frame) < 16:
        raise ValueError("blosc frame too short")
    version, _vlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, cbytes = _struct.unpack_from("<III", frame, 4)
    if cbytes != len(frame):
        raise ValueError("blosc frame length mismatch")
    if flags & 0x04:
        raise NotImplementedError("blosc bit-shuffle not supported")
    shuffled = bool(flags & 0x01)
    if flags & 0x02:  # pure memcpy
        out = frame[16:16 + nbytes]
        return _shuffle(out, typesize, forward=False) if shuffled else out
    codec_id = flags >> 5
    codec = _BLOSC_CODECS.get(codec_id)
    if codec is None:
        raise NotImplementedError(f"blosc inner codec {codec_id} "
                                  "(blosclz/snappy not supported)")
    nblocks = -(-nbytes // blocksize) if blocksize else 1
    starts = _struct.unpack_from(f"<{nblocks}I", frame, 16)
    out = bytearray()
    remaining = nbytes
    for i, off in enumerate(starts):
        bsize = min(blocksize, remaining)
        end = starts[i + 1] if i + 1 < nblocks else len(frame)
        block = _inner_decompress(frame[off:end], codec, bsize)
        if len(block) != bsize:
            block = block[:bsize]
        if shuffled:
            block = _shuffle(block, typesize, forward=False)
        out += block
        remaining -= bsize
    return bytes(out)


def blosc_compress(raw: bytes, *, typesize: int = 1, codec: str = "lz4",
                   level: int = 5, shuffle: bool = True,
                   blocksize: int = 1 << 18) -> bytes:
    if codec not in _BLOSC_CODES:
        raise NotImplementedError(f"blosc codec {codec!r}")
    blocksize = max(typesize, (blocksize // max(typesize, 1))
                    * max(typesize, 1))
    nbytes = len(raw)
    nblocks = max(1, -(-nbytes // blocksize))
    flags = (0x01 if shuffle and typesize > 1 else 0) \
        | (_BLOSC_CODES[codec] << 5)
    payloads = []
    for i in range(nblocks):
        block = raw[i * blocksize:(i + 1) * blocksize]
        if shuffle and typesize > 1:
            block = _shuffle(block, typesize, forward=True)
        payloads.append(_inner_compress(block, codec, level))
    header_len = 16 + 4 * nblocks
    starts = []
    off = header_len
    for p in payloads:
        starts.append(off)
        off += len(p)
    cbytes = off
    out = bytearray()
    out += bytes([2, 1, flags, typesize & 0xFF])
    out += _struct.pack("<III", nbytes, blocksize, cbytes)
    out += _struct.pack(f"<{nblocks}I", *starts)
    for p in payloads:
        out += p
    return bytes(out)


# ---------------------------------------------------------------------------
# LERC (Esri Limited Error Raster Compression) via the system libLerc —
# the codec behind GTiff COMPRESSION=LERC (tag 34887) and MRF in the
# reference.  C API (Lerc_c_api.h, public):
#   lerc_encode(data, dataType, nDepth, nCols, nRows, nBands, nMasks,
#               validBytes, maxZErr, outBuf, outCap, &nBytesWritten)
#   lerc_getBlobInfo(blob, size, infoArr[10], rangeArr[3], 10, 3)
#   lerc_decode(blob, size, nMasks, validBytes, nDepth, nCols, nRows,
#               nBands, dataType, outData)
# Data types: 0 i8, 1 u8, 2 i16, 3 u16, 4 i32, 5 u32, 6 f32, 7 f64.

try:
    _lerc = ctypes.CDLL("libLerc.so.4")
    _lerc.lerc_encode.restype = ctypes.c_uint
    _lerc.lerc_decode.restype = ctypes.c_uint
    _lerc.lerc_getBlobInfo.restype = ctypes.c_uint
    _lerc.lerc_computeCompressedSize.restype = ctypes.c_uint
    HAVE_LERC = True
except OSError:  # pragma: no cover
    _lerc = None
    HAVE_LERC = False

_LERC_DTYPES = {"int8": 0, "uint8": 1, "int16": 2, "uint16": 3,
                "int32": 4, "uint32": 5, "float32": 6, "float64": 7}
_LERC_NP = {v: k for k, v in _LERC_DTYPES.items()}


def lerc_encode(arr, max_z_err: float = 0.0) -> bytes:
    """(rows, cols[, bands]) array -> LERC2 blob.  max_z_err=0 is
    lossless for integers and near-lossless for floats."""
    if not HAVE_LERC:
        raise NotImplementedError("libLerc not available")
    a = _np.ascontiguousarray(arr)
    if a.ndim == 2:
        rows, cols = a.shape
        bands = 1
    else:
        rows, cols, bands = a.shape
        a = _np.ascontiguousarray(_np.moveaxis(a, 2, 0))  # band-major
    dt = _LERC_DTYPES.get(a.dtype.name)
    if dt is None:
        raise NotImplementedError(f"LERC dtype {a.dtype}")
    nbytes = ctypes.c_uint(0)
    ok = _lerc.lerc_computeCompressedSize(
        a.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint(dt),
        ctypes.c_int(1), ctypes.c_int(cols), ctypes.c_int(rows),
        ctypes.c_int(bands), ctypes.c_int(0), None,
        ctypes.c_double(max_z_err), ctypes.byref(nbytes))
    if ok != 0:
        raise ValueError(f"lerc_computeCompressedSize error {ok}")
    out = ctypes.create_string_buffer(nbytes.value)
    written = ctypes.c_uint(0)
    ok = _lerc.lerc_encode(
        a.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint(dt),
        ctypes.c_int(1), ctypes.c_int(cols), ctypes.c_int(rows),
        ctypes.c_int(bands), ctypes.c_int(0), None,
        ctypes.c_double(max_z_err), out, ctypes.c_uint(nbytes.value),
        ctypes.byref(written))
    if ok != 0:
        raise ValueError(f"lerc_encode error {ok}")
    return out.raw[:written.value]


def lerc_decode(blob: bytes):
    """LERC blob -> (rows, cols) or (rows, cols, bands) numpy array."""
    if not HAVE_LERC:
        raise NotImplementedError("libLerc not available")
    info = (ctypes.c_uint * 10)()
    rng = (ctypes.c_double * 3)()
    ok = _lerc.lerc_getBlobInfo(blob, ctypes.c_uint(len(blob)), info, rng,
                                ctypes.c_int(10), ctypes.c_int(3))
    if ok != 0:
        raise ValueError(f"lerc_getBlobInfo error {ok}")
    # info: version, dataType, nDepth, nCols, nRows, nBands, nValidPixels,
    # blobSize, nMasks, [nUsesNoData]
    dtype = _LERC_NP.get(int(info[1]))
    ndepth, cols, rows, bands = (int(info[2]), int(info[3]),
                                 int(info[4]), int(info[5]))
    if dtype is None or ndepth != 1:
        raise NotImplementedError("LERC blob layout not supported")
    out = _np.empty((bands, rows, cols), dtype=dtype)
    n_masks = int(info[8])
    if n_masks > 0:
        # blobs carrying a validity mask (Lerc1 "CntZImage" always does)
        # require the mask buffer or the decoder errors out
        mask = _np.empty(n_masks * rows * cols, dtype=_np.uint8)
        mask_ptr = mask.ctypes.data_as(ctypes.c_void_p)
    else:
        mask_ptr = None
    ok = _lerc.lerc_decode(blob, ctypes.c_uint(len(blob)),
                           ctypes.c_int(n_masks), mask_ptr,
                           ctypes.c_int(1), ctypes.c_int(cols),
                           ctypes.c_int(rows), ctypes.c_int(bands),
                           ctypes.c_uint(int(info[1])),
                           out.ctypes.data_as(ctypes.c_void_p))
    if ok != 0:
        raise ValueError(f"lerc_decode error {ok}")
    return out[0] if bands == 1 else _np.moveaxis(out, 0, 2)
