"""BMP codec — from the public Windows bitmap format (BITMAPFILEHEADER +
BITMAPINFOHEADER).  Reference: frmts/bmp/bmpdataset.cpp reads the same
wire format.

Decode: 8-bit palette, 24-bit BGR, 32-bit BGRA (BI_RGB) and RLE8,
bottom-up or top-down, 4-byte row padding.  Encode: 24-bit BI_RGB (and
8-bit palette for 2-D inputs via a gray ramp) — decode(encode(x)) is
exact."""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0
_BI_RLE8 = 1


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hsz, w, h, _planes, bits, comp = struct.unpack_from("<IiihhI", data, 14)
    if hsz < 40:
        raise NotImplementedError(f"BMP core header size {hsz}")
    top_down = h < 0
    h = abs(h)
    ncol = struct.unpack_from("<I", data, 46)[0]

    if bits == 8:
        ncol = ncol or 256
        pal = np.frombuffer(data, np.uint8, count=4 * ncol,
                            offset=14 + hsz).reshape(ncol, 4)[:, :3][:, ::-1]
        if comp == _BI_RLE8:
            idx = _rle8(data[pix_off:], w, h)
        elif comp == _BI_RGB:
            stride = (w + 3) & ~3
            rows = np.frombuffer(data, np.uint8, count=stride * h,
                                 offset=pix_off).reshape(h, stride)[:, :w]
            idx = rows
        else:
            raise NotImplementedError(f"BMP compression {comp} at 8bpp")
        img = pal[np.minimum(idx, ncol - 1)]
    elif bits in (24, 32) and comp == _BI_RGB:
        ch = bits // 8
        stride = (w * ch + 3) & ~3
        rows = np.frombuffer(data, np.uint8, count=stride * h,
                             offset=pix_off).reshape(h, stride)
        px = rows[:, :w * ch].reshape(h, w, ch)
        img = px[:, :, 2::-1] if ch == 3 else \
            np.dstack([px[:, :, 2::-1][..., :3], px[:, :, 3]])
    else:
        raise NotImplementedError(f"BMP {bits}bpp compression {comp}")
    return img if top_down else img[::-1]


def _rle8(data: bytes, w: int, h: int) -> np.ndarray:
    out = np.zeros((h, w), np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n:
        c, v = data[i], data[i + 1]
        i += 2
        if c:                      # encoded run
            out[y, x:x + c] = v
            x += c
        elif v == 0:               # end of line
            x, y = 0, y + 1
        elif v == 1:               # end of bitmap
            break
        elif v == 2:               # delta
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                      # absolute run (word-aligned)
            out[y, x:x + v] = np.frombuffer(data, np.uint8, count=v, offset=i)
            x += v
            i += v + (v & 1)
    return out


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w) uint8 -> 8-bit gray-palette BMP; (h, w, 3) -> 24-bit."""
    arr = np.asarray(arr, np.uint8)
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = arr[::-1]
        pal = np.zeros((256, 4), np.uint8)
        pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
        pix_off = 14 + 40 + 1024
        body = pal.tobytes() + rows.tobytes()
        bits, ncol = 8, 256
    elif arr.ndim == 3 and arr.shape[2] == 3:
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
        pix_off = 14 + 40
        body = rows.tobytes()
        bits, ncol = 24, 0
    else:
        raise ValueError("encode_bmp expects (H,W) or (H,W,3) uint8")
    hdr = b"BM" + struct.pack("<IHHI", pix_off + h * stride, 0, 0, pix_off)
    info = struct.pack("<IiihhIIiiII", 40, w, h, 1, bits, _BI_RGB,
                       h * stride, 2835, 2835, ncol, 0)
    return hdr + info + body
