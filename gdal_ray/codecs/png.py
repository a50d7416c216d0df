"""Pure numpy + zlib PNG codec.

Written from the public PNG specification (RFC 2083 / W3C PNG): IHDR/IDAT/
IEND chunks, per-scanline filter byte, filters 0-4.  Supported pixel
layouts: 8-bit and 16-bit gray / gray+alpha / RGB / RGBA, plus 8-bit
palette (color type 3, PLTE [+ tRNS] expanded to RGB/RGBA on decode — the
reference's GetColorTable expansion).  Encoding uses filter 0 (None) on
every row for speed — zlib does the heavy lifting — which keeps the
encoder fully vectorized.  Decoding supports all five filters; filters
0 and 2 are vectorized, 1/3/4 fall back to a byte-sequential loop (our
own synthetic data always uses 0, so the hot path stays vectorized).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 4: 2, 2: 3, 6: 4, 3: 1}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 1, *,
               interlace: bool = False) -> bytes:
    """uint8 -> 8-bit PNG; uint16 -> 16-bit PNG (big-endian samples).
    interlace=True writes Adam7 (filter 0 rows per pass)."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint16:
        depth, view = 16, arr.astype(">u2")
    else:
        depth, view = 8, np.asarray(arr, dtype=np.uint8)
    if view.ndim == 2:
        view = view[:, :, None]
    h, w, c = view.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, depth, _COLOR_TYPE[c], 0, 0,
                       1 if interlace else 0)
    bpp = c * (depth // 8)
    body = view.reshape(h, -1).view(np.uint8).reshape(h, w * bpp)
    if interlace:
        parts = []
        body3 = body.reshape(h, w, bpp)
        for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, _adam7_dims(w, h)):
            if pw == 0 or ph == 0:
                continue
            sub = body3[y0::dy, x0::dx].reshape(ph, pw * bpp)
            rows = np.empty((ph, 1 + pw * bpp), dtype=np.uint8)
            rows[:, 0] = 0
            rows[:, 1:] = sub
            parts.append(rows.tobytes())
        idat = zlib.compress(b"".join(parts), level)
    else:
        raw = np.empty((h, 1 + body.shape[1]), dtype=np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = body
        idat = zlib.compress(raw.tobytes(), level)
    return _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_png_palette(idx: np.ndarray, palette: np.ndarray,
                       transparent: int | None = None, level: int = 1) -> bytes:
    """(h, w) uint8 indices + (n, 3) palette -> color-type-3 PNG
    (+ tRNS making one entry fully transparent)."""
    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    pal = np.asarray(palette, dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = np.empty((h, 1 + w), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = idx
    out = _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
    if transparent is not None:
        trns = np.full(transparent + 1, 255, np.uint8)
        trns[transparent] = 0
        out += _chunk(b"tRNS", trns.tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raw.tobytes(), level)) \
        + _chunk(b"IEND", b"")


def _paeth_scalar(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _defilter(rows: np.ndarray, filters: np.ndarray, bpp: int) -> np.ndarray:
    """Byte-wise PNG defilter (spec: filtering operates on bytes, 'left'
    is bpp bytes back) — handles any bit depth."""
    h, nb = rows.shape
    out = np.zeros((h, nb), dtype=np.uint8)
    zero = np.zeros(nb, dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else zero
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = cur + prior
        elif f in (1, 3, 4):  # Sub/Average/Paeth: byte-sequential in x
            rec = np.zeros(nb, dtype=np.int32)
            for x in range(nb):
                left = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prior[x])
                ul = int(out[y - 1, x - bpp]) if (y and x >= bpp) else 0
                if f == 1:
                    v = cur[x] + left
                elif f == 3:
                    v = cur[x] + ((left + up) >> 1)
                else:
                    v = cur[x] + _paeth_scalar(left, up, ul)
                rec[x] = v & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec & 0xFF
    return out


# Adam7 interlace passes: (x_start, y_start, x_step, y_step) — W3C PNG
# spec §Interlaced data order
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _adam7_dims(w: int, h: int):
    """per-pass (pw, ph) sub-image dimensions"""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        out.append((pw, ph))
    return out


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG")
    off = 8
    idat = bytearray()
    w = h = bit_depth = color_type = None
    plte = trns = None
    while off < len(data):
        (length,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
            if bit_depth not in (8, 16) or (color_type == 3 and bit_depth != 8):
                raise NotImplementedError(
                    f"PNG bit depth {bit_depth} / color type {color_type} not supported")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, np.uint8)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    c = _CHANNELS[color_type]
    sb = bit_depth // 8  # bytes per sample
    bpp = c * sb
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 1:
        # Adam7: seven sequential sub-images, each filtered independently,
        # scattered back onto the (y0 + ph*dy, x0 + pw*dx) grid
        body = np.zeros((h, w * bpp), dtype=np.uint8)
        pos = 0
        for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, _adam7_dims(w, h)):
            if pw == 0 or ph == 0:
                continue
            stride_p = 1 + pw * bpp
            sub = raw[pos:pos + ph * stride_p].reshape(ph, stride_p)
            pos += ph * stride_p
            fts = sub[:, 0]
            sb_body = sub[:, 1:]
            if not np.all(fts == 0):
                sb_body = _defilter(np.ascontiguousarray(sb_body), fts, bpp)
            sb_px = sb_body.reshape(ph, pw, bpp)
            ys = y0 + np.arange(ph) * dy
            xs = x0 + np.arange(pw) * dx
            body3 = body.reshape(h, w, bpp)
            body3[np.ix_(ys, xs)] = sb_px
        body = body.reshape(h, w * bpp)
    else:
        stride = 1 + w * bpp
        rows = raw.reshape(h, stride)
        filters = rows[:, 0]
        body = rows[:, 1:]
        if not np.all(filters == 0):
            body = _defilter(np.ascontiguousarray(body), filters, bpp)
    if bit_depth == 16:
        px = np.ascontiguousarray(body).view(">u2").astype(np.uint16)
        px = px.reshape(h, w, c)
    else:
        px = body.reshape(h, w, c).copy()
    if color_type == 3:
        idx = px[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return px[:, :, 0] if c == 1 else px
