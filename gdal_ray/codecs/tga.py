"""TGA (Truevision Targa) decoder — frmts/tga/tgadataset.cpp analogue,
from the public TGA 2.0 file-format specification.

Covers the whole read surface the reference does: uncompressed + RLE
(runs crossing scanlines), grey/8-bit, color-mapped 8-bit (palette kept
AND expandable), 15/16-bit A1R5G5B5, 24-bit BGR, 32-bit BGRA, both
vertical origins (descriptor bit 5), and the v2 footer's extension area
(author name, comments, image-id string) — decode parity is pinned
against the reference's own ref_test_suite fixtures' published
checksums in tests/test_tga.py.  Write side intentionally absent (the
reference's TGA driver is read-only too)."""

from __future__ import annotations

import struct

import numpy as np

_FOOTER_SIG = b"TRUEVISION-XFILE.\x00"


def _rle_decode(data: bytes, off: int, n_pixels: int, bpp: int) -> np.ndarray:
    """-> (n_pixels, bpp) uint8; runs may cross scanlines (the spec
    allows it; GDAL and ffmpeg emit such files)."""
    out = np.empty((n_pixels, bpp), dtype=np.uint8)
    buf = memoryview(data)
    i = 0
    while i < n_pixels:
        ctrl = buf[off]
        off += 1
        count = (ctrl & 0x7F) + 1
        if ctrl & 0x80:  # run packet: one pixel value repeated
            out[i:i + count] = np.frombuffer(buf[off:off + bpp], np.uint8)
            off += bpp
        else:  # raw packet
            out[i:i + count] = np.frombuffer(
                buf[off:off + count * bpp], np.uint8).reshape(count, bpp)
            off += count * bpp
        i += count
    return out


def _expand_16bit(px: np.ndarray) -> np.ndarray:
    """A1R5G5B5 -> RGB via plain <<3 (the reference's expansion — the
    pinned fixture checksums match this, not bit-replication)."""
    v = px[:, 0].astype(np.uint16) | (px[:, 1].astype(np.uint16) << 8)
    r = ((v >> 10) & 0x1F) << 3
    g = ((v >> 5) & 0x1F) << 3
    b = (v & 0x1F) << 3
    return np.stack([r, g, b], axis=1).astype(np.uint8)


def decode_tga(data: bytes, *, expand_palette: bool = True):
    """-> (array, meta).  Array is (h, w) grey/index or (h, w, 3|4)
    RGB(A), top-down display order.  meta: palette (n, 4) RGBA or None,
    author/comments/image_id strings when the v2 extension area or ID
    field carries them."""
    (idlen, cmap_type, imgtype, cm_first, cm_len, cm_size,
     _xo, _yo, w, h, depth, desc) = struct.unpack_from("<BBBHHBHHHHBB", data, 0)
    rle = bool(imgtype & 8)
    base = imgtype & 7
    if base not in (1, 2, 3):
        raise ValueError(f"TGA image type {imgtype} unsupported")
    off = 18
    image_id = data[off:off + idlen].decode("latin-1", "replace") or None
    off += idlen
    palette = None
    if cmap_type == 1:
        entry_bytes = (cm_size + 7) // 8
        raw = np.frombuffer(data, np.uint8, cm_len * entry_bytes, off)
        raw = raw.reshape(cm_len, entry_bytes)
        pal = np.zeros((cm_first + cm_len, 4), dtype=np.uint8)
        pal[:, 3] = 255
        if cm_size in (15, 16):
            rgb = _expand_16bit(raw[:, :2])
            pal[cm_first:, :3] = rgb
        elif cm_size == 24:
            pal[cm_first:, :3] = raw[:, [2, 1, 0]]
        else:  # 32 BGRA
            pal[cm_first:, :3] = raw[:, [2, 1, 0]]
            pal[cm_first:, 3] = raw[:, 3]
        palette = pal
        off += cm_len * entry_bytes
    bpp = (depth + 7) // 8
    n = w * h
    if rle:
        px = _rle_decode(data, off, n, bpp)
    else:
        px = np.frombuffer(data, np.uint8, n * bpp, off).reshape(n, bpp)
    if base == 3 or (base == 1 and not expand_palette) or \
            (base == 2 and depth == 8):
        arr = px[:, 0].reshape(h, w)
    elif base == 1:
        arr = palette[px[:, 0].astype(np.int64)].reshape(h, w, 4)
        arr = arr[:, :, :3] if (palette[:, 3] == 255).all() else arr
    elif depth in (15, 16):
        arr = _expand_16bit(px).reshape(h, w, 3)
    elif depth == 24:
        arr = px[:, [2, 1, 0]].reshape(h, w, 3)
    elif depth == 32:
        arr = px[:, [2, 1, 0, 3]].reshape(h, w, 4)
    else:
        raise ValueError(f"TGA depth {depth} unsupported")
    if not desc & 0x20:  # origin bottom-left -> flip to display order
        arr = arr[::-1].copy()
    meta = {"palette": palette, "image_id": image_id,
            "author": None, "comments": None}
    if data[-18:] == _FOOTER_SIG:
        ext_off = struct.unpack_from("<I", data, len(data) - 26)[0]
        if ext_off and ext_off + 495 <= len(data):
            author = data[ext_off + 2:ext_off + 43].split(b"\x00")[0]
            meta["author"] = author.decode("latin-1", "replace") or None
            lines = []
            for i in range(4):
                s = data[ext_off + 43 + 81 * i:ext_off + 43 + 81 * (i + 1)]
                s = s.split(b"\x00")[0].decode("latin-1", "replace")
                if s:
                    lines.append(s)
            meta["comments"] = "\n".join(lines) or None
    return arr, meta


def tga_info(path: str) -> dict:
    with open(path, "rb") as f:
        head = f.read(18)
    (_idlen, cmap_type, imgtype, _f, cm_len, _sz,
     _xo, _yo, w, h, depth, _desc) = struct.unpack_from("<BBBHHBHHHHBB", head, 0)
    base = imgtype & 7
    bands = {1: 1, 3: 1}.get(base, {15: 3, 16: 3, 24: 3, 32: 4, 8: 1}.get(depth, 3))
    return {"driver": "TGA", "size": [w, h], "bands": bands, "depth": depth,
            "rle": bool(imgtype & 8), "palette": cmap_type == 1,
            "n_colors": cm_len if cmap_type == 1 else 0}
