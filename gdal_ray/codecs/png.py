"""Pure numpy + zlib PNG codec (8-bit gray / gray+alpha / RGB / RGBA).

Written from the public PNG specification (RFC 2083 / W3C PNG): IHDR/IDAT/
IEND chunks, per-scanline filter byte, filters 0-4.  Encoding uses filter 0
(None) on every row for speed — zlib does the heavy lifting — which keeps
the encoder fully vectorized.  Decoding supports all five filters; filters
0-2 are vectorized, 3-4 fall back to a per-row loop (our own synthetic data
always uses 0, so the hot path stays vectorized).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 4: 2, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 1) -> bytes:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    # filter byte 0 per row, then raw pixels
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), level)
    return _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG")
    off = 8
    idat = bytearray()
    w = h = bit_depth = color_type = None
    while off < len(data):
        (length,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if bit_depth != 8 or interlace != 0:
                raise NotImplementedError("only 8-bit non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    c = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * c
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    px = rows[:, 1:].reshape(h, w, c).astype(np.uint8)
    if np.all(filters == 0):
        return px[:, :, 0] if c == 1 else px.copy()
    out = np.zeros((h, w, c), dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        cur = px[y].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros((w, c), np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = cur + prior
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left neighbor: sequential in x
            rec = np.zeros((w, c), np.int32)
            left = np.zeros(c, np.int32)
            upleft = np.zeros(c, np.int32)
            for x in range(w):
                up = prior[x]
                if f == 1:
                    val = cur[x] + left
                elif f == 3:
                    val = cur[x] + ((left + up) >> 1)
                else:
                    val = cur[x] + _paeth(
                        left.astype(np.uint8), up.astype(np.uint8), upleft.astype(np.uint8)
                    )
                rec[x] = val & 0xFF
                upleft = up
                left = rec[x]
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    return out[:, :, 0] if c == 1 else out
