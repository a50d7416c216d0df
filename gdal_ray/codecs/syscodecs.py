"""Production decode via the public system codec libraries.

The reference's hot decode paths link libjpeg (frmts/jpeg/) and libwebp
(frmts/webp/webpdataset.cpp); this module does the same — libjpeg
through the compiled shim in gdal_ray/_native/ (the classic IJG API
needs setjmp error recovery) and libwebp through ctypes on its simple
one-shot API.  The from-spec decoders in jpeg.py / webp.py / vp8.py
remain the conformance oracle (tests pin them against these libraries
bit-exactly / within PSNR bounds); at runtime ``codecs.decode`` prefers
this path because the C libraries are ~50-100x faster, which is the
actual 100-TB decode bill (VERDICT r4 #1).

Set GRAFT_NO_SYSCODECS=1 to force the from-spec paths everywhere.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = [
    "have_sys_jpeg", "have_sys_webp",
    "jpeg_decode_sys", "jpeg_encode_sys", "webp_decode_sys",
    "webp_encode_sys",
]

_ERRCAP = 256


def _disabled() -> bool:
    return os.environ.get("GRAFT_NO_SYSCODECS") == "1"


# -- libjpeg (via the _native shim) -----------------------------------------

def _jpeg_lib():
    if _disabled():
        return None
    from gdal_ray import _native

    return _native.load()


def have_sys_jpeg() -> bool:
    return _jpeg_lib() is not None


def jpeg_decode_sys(data: bytes) -> np.ndarray:
    """Decode one JPEG via libjpeg -> (H,W,3) RGB or (H,W) grayscale
    uint8.  Raises ValueError on any libjpeg error (caller falls back
    to the from-spec decoder)."""
    lib = _jpeg_lib()
    if lib is None:
        raise ValueError("libjpeg shim unavailable")
    err = ctypes.create_string_buffer(_ERRCAP)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    if lib.gr_jpeg_header(data, ctypes.c_size_t(len(data)),
                          ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(ch), err) != 0:
        raise ValueError(f"libjpeg: {err.value.decode(errors='replace')}")
    out = np.empty(w.value * h.value * ch.value, dtype=np.uint8)
    rc = lib.gr_jpeg_decode(
        data, ctypes.c_size_t(len(data)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_size_t(out.size),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch), err)
    if rc != 0:
        raise ValueError(f"libjpeg: {err.value.decode(errors='replace')}")
    arr = out.reshape(h.value, w.value, ch.value)
    return arr[:, :, 0] if ch.value == 1 else arr


def jpeg_encode_sys(arr: np.ndarray, quality: int = 85) -> bytes:
    lib = _jpeg_lib()
    if lib is None:
        raise ValueError("libjpeg shim unavailable")
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    chn = 1 if a.ndim == 2 else a.shape[2]
    if chn not in (1, 3):
        raise ValueError("libjpeg encode: 1 or 3 channels only")
    err = ctypes.create_string_buffer(_ERRCAP)
    buf = ctypes.c_void_p()
    n = ctypes.c_ulong()
    rc = lib.gr_jpeg_encode(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        a.shape[1], a.shape[0], chn, int(quality),
        ctypes.byref(buf), ctypes.byref(n), err)
    if rc != 0 or not buf.value:
        raise ValueError(f"libjpeg: {err.value.decode(errors='replace')}")
    try:
        return ctypes.string_at(buf.value, n.value)
    finally:
        lib.gr_free(buf)


# -- libwebp (direct ctypes on the simple API) ------------------------------

_webp = None
_webp_tried = False


def _webp_lib():
    global _webp, _webp_tried
    if _disabled():
        return None
    if _webp is not None or _webp_tried:
        return _webp
    _webp_tried = True
    try:
        lw = ctypes.CDLL("libwebp.so.7")
        lw.WebPGetInfo.restype = ctypes.c_int
        lw.WebPDecodeRGBInto.restype = ctypes.POINTER(ctypes.c_ubyte)
        lw.WebPEncodeRGB.restype = ctypes.c_size_t
        lw.WebPFree.restype = None
        lw.WebPFree.argtypes = [ctypes.c_void_p]
    except (OSError, AttributeError):
        return None
    _webp = lw
    return _webp


def have_sys_webp() -> bool:
    return _webp_lib() is not None


def webp_encode_sys(arr: np.ndarray, quality: float = 80.0) -> bytes:
    """Encode (H,W,3) RGB uint8 -> lossy VP8 WebP via libwebp."""
    lw = _webp_lib()
    if lw is None:
        raise ValueError("libwebp unavailable")
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("libwebp encode: (H,W,3) RGB only")
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lw.WebPEncodeRGB(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        a.shape[1], a.shape[0], a.shape[1] * 3,
        ctypes.c_float(quality), ctypes.byref(out))
    if not n:
        raise ValueError("libwebp: encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lw.WebPFree(out)


def webp_decode_sys(data: bytes) -> np.ndarray:
    """Decode one WebP (VP8 lossy or VP8L lossless) via libwebp ->
    (H,W,3) RGB uint8.  Raises ValueError on failure."""
    lw = _webp_lib()
    if lw is None:
        raise ValueError("libwebp unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lw.WebPGetInfo(data, ctypes.c_size_t(len(data)),
                          ctypes.byref(w), ctypes.byref(h)):
        raise ValueError("libwebp: bad header")
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    p = lw.WebPDecodeRGBInto(
        data, ctypes.c_size_t(len(data)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_size_t(out.size), ctypes.c_int(w.value * 3))
    if not p:
        raise ValueError("libwebp: decode failed")
    return out
