"""GIF codec — pure stdlib + numpy, from the public GIF89a specification
(CompuServe, 1990; also W3C note "Graphics Interchange Format").

Real bitstreams: GIF87a/GIF89a header, logical screen descriptor, global /
local color tables, graphic-control extension (transparency), interlaced
and sequential image data, and the GIF flavor of variable-width LZW
(LSB-first packing, clear/EOI codes, 12-bit code cap, deferred clear).

Reference behavior: frmts/gif/gifdataset.cpp + biggifdataset.cpp decode
through the vendored giflib; this is the sandbox's from-spec
implementation of the same wire format.  `decode_gif` returns the FIRST
image block (GDAL's GIF driver exposes band 1 of the first image),
palette-applied to (H,W,3) uint8 RGB — or (H,W,4) RGBA when the preceding
graphic-control extension declares a transparent index.  `encode_gif`
emits a GIF89a with an exact palette (images with ≤256 distinct colors
round-trip bit-exactly; others are an honest gate — the engine's
median-cut quantizer in stages/color.py is the lossy path).

The LZW decoder walks one code per Python-loop iteration (prefix-chain
table, as in the spec's pseudocode); GIFs in a crawl are small and this
is a conformance path, like codecs/jpeg.py's scalar fallback.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12
_TABLE_CAP = 1 << _MAX_CODE_WIDTH


# ---------------------------------------------------------------------------
# LZW (GIF variant)

def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """Decode GIF LZW code stream to `npix` palette indices (uint8)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # prefix-chain dictionary: prefix[c] = previous code, suffix[c] = byte
    prefix = np.zeros(_TABLE_CAP, dtype=np.int32)
    suffix = np.zeros(_TABLE_CAP, dtype=np.uint8)
    out = np.empty(npix + _TABLE_CAP + 2, dtype=np.uint8)  # slack for last chain
    pos = 0

    # bit reader: LSB-first variable-width codes
    buf = np.frombuffer(data, dtype=np.uint8)
    acc = 0
    nbits = 0
    ip = 0
    ndata = len(buf)

    def reset():
        return clear + 2, min_code_size + 1, -1

    next_code, width, prev = reset()
    # stack-free chain expansion buffer
    chain = np.empty(_TABLE_CAP + 1, dtype=np.uint8)

    while pos < npix:
        while nbits < width:
            if ip >= ndata:
                # truncated stream: spec-tolerant decoders stop here
                return out[:pos] if pos >= npix else np.resize(out[:pos], npix)
            acc |= int(buf[ip]) << nbits
            ip += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            next_code, width, prev = reset()
            continue
        if code == eoi:
            break

        if prev < 0:
            # first code after clear must be a literal
            out[pos] = code
            pos += 1
            prev = code
            continue

        if code < next_code:
            cur = code
        elif code == next_code:
            # KwKwK case: expand prev + first(prev)
            cur = prev
        else:
            raise ValueError("GIF LZW: code out of range")

        # expand chain of `cur` (root codes have themselves as suffix)
        n = 0
        c = cur
        while c >= clear + 2:
            chain[n] = suffix[c]
            c = int(prefix[c])
            n += 1
        chain[n] = c
        first = c
        n += 1
        if code == next_code:
            chain_ext = n + 1
            out[pos:pos + n] = chain[:n][::-1]
            out[pos + n] = first
            pos += chain_ext
        else:
            out[pos:pos + n] = chain[:n][::-1]
            pos += n

        if next_code < _TABLE_CAP:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = code

    return out[:npix]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW encode (greedy longest-match via dict of (prefix, byte))."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)

    data = indices.ravel()
    prev = int(data[0])
    for b in data[1:].tolist():
        key = (prev, b)
        hit = table.get(key)
        if hit is not None:
            prev = hit
            continue
        emit(prev, width)
        if next_code < _TABLE_CAP:
            table[key] = next_code
            # width bump happens when next_code EXCEEDS the current range
            # (the code we just assigned is the first of the wider range)
            if next_code == (1 << width):
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table.clear()
            next_code = clear + 2
            width = min_code_size + 1
        prev = b
    emit(prev, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# interlace pass structure (spec appendix E): (start row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(s, h, step) for s, step in _INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


# ---------------------------------------------------------------------------
# container

def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first image of a GIF87a/89a to (H,W,3) RGB uint8 —
    (H,W,4) RGBA when a graphic-control extension marks a transparent
    index (alpha 0 there, 255 elsewhere)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=off).reshape(n, 3)
        off += 3 * n

    transparent = -1
    while off < len(data):
        b0 = data[off]
        off += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[off]
            off += 1
            # walk sub-blocks
            sub0 = off
            while data[off] != 0:
                off += 1 + data[off]
            off += 1
            if label == 0xF9:  # graphic control
                gpacked = data[sub0 + 1]
                if gpacked & 0x01:
                    transparent = data[sub0 + 4]
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block id 0x{b0:02X}")

        # image descriptor
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, off)
        off += 9
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                                offset=off).reshape(n, 3)
            off += 3 * n
        if lct is None:
            raise ValueError("GIF: image has no color table")
        min_code = data[off]
        off += 1
        parts = []
        while data[off] != 0:
            ln = data[off]
            parts.append(data[off + 1:off + 1 + ln])
            off += 1 + ln
        off += 1
        idx = _lzw_decode(b"".join(parts), min_code, w * h).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        # palette lookup (clip indexes beyond table size, per giflib behavior)
        idx_c = np.minimum(idx, len(lct) - 1)
        rgb = lct[idx_c]
        if transparent >= 0:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])
        return rgb

    raise ValueError("GIF: no image block found")


def decode_gif_frames(data: bytes) -> dict:
    """Full GIF89a animation demux -> {width, height, loop_count,
    frames: [{left, top, delay_cs, disposal, image (h,w,3|4)}]}.
    Each frame decodes independently; composition is compose_gif."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                            offset=off).reshape(n, 3)
        off += 3 * n
    out = {"width": sw, "height": sh, "loop_count": None, "frames": []}
    transparent = -1
    delay = 0
    disposal = 0
    while off < len(data):
        b0 = data[off]
        off += 1
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            label = data[off]
            off += 1
            sub0 = off
            blocks = []
            while data[off] != 0:
                blocks.append(data[off + 1:off + 1 + data[off]])
                off += 1 + data[off]
            off += 1
            if label == 0xF9:
                gpacked = data[sub0 + 1]
                transparent = data[sub0 + 4] if (gpacked & 1) else -1
                delay = struct.unpack_from("<H", data, sub0 + 2)[0]
                disposal = (gpacked >> 2) & 7
            elif label == 0xFF and blocks and                     blocks[0][:11] == b"NETSCAPE2.0":
                if len(blocks) > 1 and blocks[1][:1] == b"\x01":
                    out["loop_count"] = struct.unpack_from(
                        "<H", blocks[1], 1)[0]
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block id 0x{b0:02X}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, off)
        off += 9
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                                offset=off).reshape(n, 3)
            off += 3 * n
        if lct is None:
            raise ValueError("GIF: image has no color table")
        min_code = data[off]
        off += 1
        parts = []
        while data[off] != 0:
            ln = data[off]
            parts.append(data[off + 1:off + 1 + ln])
            off += 1 + ln
        off += 1
        idx = _lzw_decode(b"".join(parts), min_code, w * h).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        idx_c = np.minimum(idx, len(lct) - 1)
        rgb = lct[idx_c]
        if transparent >= 0:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            img = np.dstack([rgb, alpha])
        else:
            img = rgb
        out["frames"].append({"left": left, "top": top, "delay_cs": delay,
                              "disposal": disposal, "image": img})
        transparent = -1
        delay = 0
        disposal = 0
    if not out["frames"]:
        raise ValueError("GIF: no image block found")
    return out


def compose_gif(data: bytes) -> list:
    """Demux + compose full RGBA canvases per frame (GIF89a disposal
    methods: 0/1 keep, 2 restore-background=transparent, 3 restore
    previous)."""
    meta = decode_gif_frames(data)
    H, W = meta["height"], meta["width"]
    canvas = np.zeros((H, W, 4), dtype=np.uint8)
    out = []
    for fr in meta["frames"]:
        img = fr["image"]
        if img.shape[2] == 3:
            img = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        y0, x0 = fr["top"], fr["left"]
        h, w = img.shape[:2]
        before = canvas[y0:y0 + h, x0:x0 + w].copy()
        region = canvas[y0:y0 + h, x0:x0 + w]
        opaque = img[:, :, 3] == 255
        region[opaque] = img[opaque]
        out.append(canvas.copy())
        if fr["disposal"] == 2:
            canvas[y0:y0 + h, x0:x0 + w] = 0
        elif fr["disposal"] == 3:
            canvas[y0:y0 + h, x0:x0 + w] = before
    return out


def encode_gif_anim(frames, delays_cs, *, offsets=None, loop: int = 0,
                    disposal: int = 1) -> bytes:
    """Animated GIF89a writer: global canvas from frame extents, one
    256-color local table per frame (median-cut via encode_gif's
    quantizer path is overkill here — frames must already be paletted
    ≤256 unique colors, the engine's tile-render output contract)."""
    if offsets is None:
        offsets = [(0, 0)] * len(frames)
    W = max(o[0] + f.shape[1] for o, f in zip(offsets, frames))
    H = max(o[1] + f.shape[0] for o, f in zip(offsets, frames))
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", W, H, 0x00, 0, 0)
    out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"         + bytes([3, 1]) + struct.pack("<H", loop) + b"\x00"
    for (x0, y0), frame, delay in zip(offsets, frames, delays_cs):
        h, w = frame.shape[:2]
        flat = frame.reshape(-1, frame.shape[2])[:, :3]
        colors, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("animated GIF frames must have <=256 colors")
        bits = max(2, int(np.ceil(np.log2(max(len(colors), 2)))))
        size = 1 << bits
        table = np.zeros((size, 3), dtype=np.uint8)
        table[:len(colors)] = colors
        out += bytes([0x21, 0xF9, 4, (disposal & 7) << 2])             + struct.pack("<H", int(delay)) + bytes([0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", x0, y0, w, h)             + bytes([0x80 | (bits - 1)])
        out += table.tobytes()
        min_code = max(2, bits)
        out += bytes([min_code])
        lzw = _lzw_encode(inv.astype(np.int64), min_code)
        i = 0
        while i < len(lzw):
            n = min(255, len(lzw) - i)
            out += bytes([n]) + lzw[i:i + n]
            i += n
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (H,W) grayscale / (H,W,3) RGB / (H,W,4) RGBA uint8 to GIF89a.

    Exact-palette encoder: the image must have ≤256 distinct colors
    (RGBA: ≤255 opaque colors + fully-transparent pixels).  More colors
    is an honest gate — quantize first (stages/color.py median cut).
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.dstack([arr] * 3)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_gif expects (H,W), (H,W,3) or (H,W,4) uint8")
    h, w = arr.shape[:2]

    transparent = -1
    if arr.shape[2] == 4:
        alpha = arr[:, :, 3]
        if not np.all((alpha == 0) | (alpha == 255)):
            raise NotImplementedError(
                "encode_gif: GIF transparency is 1-bit (alpha must be 0 or 255)")
        mask = alpha == 255
        rgb = arr[:, :, :3]
    else:
        mask = np.ones((h, w), dtype=bool)
        rgb = arr

    flat = rgb.reshape(-1, 3)
    keys = (flat[:, 0].astype(np.uint32) << 16) | \
           (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2].astype(np.uint32)
    opaque_keys = keys[mask.ravel()]
    uniq, inv_all = np.unique(keys, return_inverse=True)
    uniq_opaque = np.unique(opaque_keys) if opaque_keys.size else np.empty(0, np.uint32)
    has_alpha = not mask.all()
    if len(uniq_opaque) + (1 if has_alpha else 0) > 256:
        raise NotImplementedError(
            f"encode_gif: exact palette needs ≤256 colors, image has "
            f"{len(uniq_opaque)} (+transparency) — quantize first")

    # palette: opaque colors first, transparent slot last (if needed)
    pal_keys = uniq_opaque
    idx_of = {int(k): i for i, k in enumerate(pal_keys.tolist())}
    npal = len(pal_keys) + (1 if has_alpha else 0)
    trans_slot = npal - 1 if has_alpha else -1
    # map every pixel
    lut = np.array([idx_of.get(int(k), trans_slot if has_alpha else 0)
                    for k in uniq.tolist()], dtype=np.uint16)
    idx = lut[inv_all].reshape(h, w).astype(np.uint8)
    if has_alpha:
        idx[~mask] = trans_slot
        transparent = trans_slot

    # color-table size: power of two ≥ max(npal, 2)
    bits = 1
    while (1 << bits) < max(npal, 2):
        bits += 1
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:len(pal_keys), 0] = (pal_keys >> 16) & 0xFF
    table[:len(pal_keys), 1] = (pal_keys >> 8) & 0xFF
    table[:len(pal_keys), 2] = pal_keys & 0xFF

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table.tobytes()
    if transparent >= 0:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    ipacked = 0x40 if interlace else 0x00
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if interlace:
        order = np.concatenate(
            [np.arange(s, h, step) for s, step in _INTERLACE_PASSES])
        idx = idx[order]
    min_code = max(bits, 2)
    out.append(min_code)
    payload = _lzw_encode(idx, min_code)
    for i in range(0, len(payload), 255):
        blk = payload[i:i + 255]
        out.append(len(blk))
        out += blk
    out += bytes([0x00, 0x3B])
    return bytes(out)
