"""GeoTIFF codec, implemented from the public TIFF 6.0 and GeoTIFF 1.1
specifications (no libtiff).  Mirrors the capability core of the
reference's flagship driver (frmts/gtiff/geotiff.cpp, gt_wkt_srs.cpp):

- classic TIFF and BigTIFF containers, both byte orders;
- strip and tile layouts, chunky (PlanarConfiguration=1) and separate
  (PlanarConfiguration=2) plane order;
- sample types uint8/16/32, int8/16/32, float32/64 (SampleFormat tag);
- compression: none (1), LZW (5, with horizontal predictor 2 and the
  spec's early-change code-width bump), Deflate (8 / old 32946, zlib),
  PackBits (32773), JPEG (7, TechNote 2: abbreviated per-chunk streams
  merged with the shared JPEGTables tag, YCbCr photometric 6 — decoded
  by the from-spec codec in jpeg.py);
- GeoTIFF georeferencing: ModelPixelScale + ModelTiepoint (or the full
  ModelTransformation matrix) -> the 6-term GDAL geotransform, and the
  GeoKey directory -> EPSG code (GeographicTypeGeoKey 2048 /
  ProjectedCSTypeGeoKey 3072);
- the GDAL-specific ASCII tags: GDAL_NODATA (42113), GDAL_METADATA
  (42112).

Decode returns (H, W) or (H, W, C) numpy in the native sample dtype;
``read_geotiff`` additionally returns the georeferencing/metadata dict.
The encoder writes a single-IFD striped (or tiled) file and is used by
the tile/translate sinks; encode->decode round-trips are bit-exact for
every supported dtype/compression/predictor combination (test_tiff.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --- tag ids (TIFF 6.0 §8, GeoTIFF §7, GDAL extensions) ---
T_WIDTH, T_LENGTH, T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 256, 257, 258, 259, 262
T_STRIP_OFFSETS, T_SAMPLES, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PLANAR, T_PREDICTOR, T_COLORMAP, T_SAMPLE_FORMAT = 284, 317, 320, 339
T_TILE_W, T_TILE_H, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325
T_EXTRASAMPLES = 338
T_JPEG_TABLES = 347  # TIFF TechNote 2 "new-style" JPEG (compression 7)
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT, T_MODEL_TRANSFORM = 33550, 33922, 34264
T_GEO_KEYS, T_GEO_DOUBLES, T_GEO_ASCII = 34735, 34736, 34737
T_GDAL_METADATA, T_GDAL_NODATA = 42112, 42113

GK_MODEL_TYPE, GK_RASTER_TYPE = 1024, 1025
GK_GEOGRAPHIC_TYPE, GK_PROJECTED_CS = 2048, 3072

# field type -> (struct code, byte size)
_FIELD = {1: ("B", 1), 2: ("s", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
          6: ("b", 1), 7: ("B", 1), 8: ("h", 2), 9: ("i", 4), 10: ("ii", 8),
          11: ("f", 4), 12: ("d", 8), 16: ("Q", 8), 17: ("q", 8)}

_DTYPES = {  # (bits, sample_format) -> numpy dtype
    (8, 1): np.uint8, (16, 1): np.uint16, (32, 1): np.uint32,
    (8, 2): np.int8, (16, 2): np.int16, (32, 2): np.int32,
    (32, 3): np.float32, (64, 3): np.float64,
}
_SF_OF = {"u": 1, "i": 2, "f": 3}


# ---------------------------------------------------------------- container


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        if data[:2] == b"II":
            self.e = "<"
        elif data[:2] == b"MM":
            self.e = ">"
        else:
            raise ValueError("not a TIFF: bad byte-order mark")
        magic = struct.unpack(self.e + "H", data[2:4])[0]
        if magic == 42:  # classic
            self.big = False
            self.first_ifd = struct.unpack(self.e + "I", data[4:8])[0]
        elif magic == 43:  # BigTIFF
            self.big = True
            off_size, _ = struct.unpack(self.e + "HH", data[4:8])
            if off_size != 8:
                raise ValueError("BigTIFF with non-8-byte offsets")
            self.first_ifd = struct.unpack(self.e + "Q", data[8:16])[0]
        else:
            raise ValueError(f"not a TIFF: magic {magic}")

    def ifd_tags(self, off: int) -> dict[int, list]:
        d, e = self.d, self.e
        if self.big:
            n = struct.unpack(e + "Q", d[off:off + 8])[0]
            entry0, esz, cnt_fmt = off + 8, 20, "Q"
            inline = 8
        else:
            n = struct.unpack(e + "H", d[off:off + 2])[0]
            entry0, esz, cnt_fmt = off + 2, 12, "I"
            inline = 4
        tags: dict[int, list] = {}
        for i in range(n):
            p = entry0 + i * esz
            tag, ftype = struct.unpack(e + "HH", d[p:p + 4])
            count = struct.unpack(e + cnt_fmt, d[p + 4:p + 4 + (8 if self.big else 4)])[0]
            voff = p + 4 + (8 if self.big else 4)
            if ftype not in _FIELD:
                continue
            code, size = _FIELD[ftype]
            total = size * count
            if total <= inline:
                raw = d[voff:voff + total]
            else:
                ptr = struct.unpack(e + ("Q" if self.big else "I"), d[voff:voff + inline])[0]
                raw = d[ptr:ptr + total]
            if ftype == 2:
                tags[tag] = [raw.split(b"\0")[0].decode("latin-1", "replace")]
            elif ftype in (5, 10):  # rational pairs
                flat = struct.unpack(e + code[0] * 2 * count, raw)
                tags[tag] = [flat[2 * k] / (flat[2 * k + 1] or 1) for k in range(count)]
            else:
                tags[tag] = list(struct.unpack(e + code * count, raw))
        return tags


def _unpackbits(src: bytes, expected: int) -> bytes:
    """PackBits (TIFF 6.0 §9) decode."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expected:
        c = src[i]
        i += 1
        if c < 128:
            out += src[i:i + c + 1]
            i += c + 1
        elif c > 128:
            out += src[i:i + 1] * (257 - c)
            i += 1
        # 128 = no-op
    return bytes(out)


def _packbits(src: bytes) -> bytes:
    """PackBits encode: literal runs broken at repeats of >=3."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        # find run length of identical bytes
        j = i + 1
        while j < n and j - i < 128 and src[j] == src[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(src[i])
            i = j
        else:
            # literal run until next repeat-of-3 or 128 bytes
            k = i
            while k < n and k - i < 128:
                if k + 2 < n and src[k] == src[k + 1] == src[k + 2]:
                    break
                k += 1
            out.append(k - i - 1)
            out += src[i:k]
            i = k
    return bytes(out)


# ---------------------------------------------------------------- LZW (§13)

_CLEAR, _EOI = 256, 257


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF LZW: MSB-first variable-width codes 9..12 bits, early change
    (width bumps when the NEXT code would not fit, i.e. at table size
    2^w - 1)."""
    bits = np.unpackbits(np.frombuffer(src, dtype=np.uint8))
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    pos = 0
    prev: bytes | None = None
    nbits = len(bits)
    while pos + width <= nbits:
        code = 0
        for b in bits[pos:pos + width]:
            code = (code << 1) | int(b)
        pos += width
        if code == _EOI:
            break
        if code == _CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
        if len(out) >= expected:
            break
    return bytes(out)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int):
        self.acc = (self.acc << width) | code
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def done(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.n = 0
        return bytes(self.buf)


def _lzw_encode(src: bytes) -> bytes:
    w = _BitWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    w.put(_CLEAR, width)
    s = b""
    for ch in src:
        sc = s + bytes([ch])
        if sc in table:
            s = sc
            continue
        w.put(table[s], width)
        table[sc] = nxt
        nxt += 1
        # width sync: the decoder's table add lags one code behind ours,
        # so it widens (at table length 2^w - 1, the spec's early change)
        # exactly when OUR next free code passes 2^w
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt == 4094:  # table full -> clear
            w.put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        s = bytes([ch])
    if s:
        w.put(table[s], width)
    w.put(_EOI, width)
    return w.done()


# ---------------------------------------------------------------- decode


def _jpeg_split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a self-contained JPEG into (JPEGTables blob, abbreviated
    stream): DQT/DHT segments move to the tables blob per TIFF TechNote 2
    (the layout libtiff writes for compression 7)."""
    tables = bytearray()
    keep = bytearray(b"\xFF\xD8")
    pos = 2
    n = len(stream)
    while pos + 4 <= n:
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS — entropy data follows; keep the rest
            keep += stream[pos:]
            break
        seglen = struct.unpack_from(">H", stream, pos + 2)[0]
        seg = stream[pos: pos + 2 + seglen]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            keep += seg
        pos += 2 + seglen
    return bytes(b"\xFF\xD8" + tables + b"\xFF\xD9"), bytes(keep)


def _jpeg_merge_tables(chunk: bytes, tables: bytes | None) -> bytes:
    """Splice the JPEGTables body (sans SOI/EOI) after the chunk's SOI;
    chunks that repeat their own tables simply redefine them."""
    if not tables or len(tables) <= 4 or chunk[:2] != b"\xFF\xD8":
        return chunk
    return b"\xFF\xD8" + tables[2:-2] + chunk[2:]


def _decode_jpeg_chunk(raw: bytes, tables, phot: int, eh: int, ew: int,
                       cpp: int, dt) -> np.ndarray:
    """Decode one compression-7 tile/strip to an (eh, ew, cpp) block."""
    from gdal_ray.codecs.jpeg import decode_jpeg

    img = decode_jpeg(_jpeg_merge_tables(raw, tables))
    if img.ndim == 2:
        img = img[:, :, None]
    if phot == 2 and img.shape[2] == 3:
        raise NotImplementedError(
            "JPEG-in-TIFF with PhotometricInterpretation=RGB (no YCbCr "
            "transform) is not supported; use photometric 6")
    blk = np.zeros((eh, ew, cpp), dtype=dt)
    hh, ww = min(eh, img.shape[0]), min(ew, img.shape[1])
    blk[:hh, :ww] = img[:hh, :ww, :cpp]
    return blk


def _decode_lerc_chunk(raw: bytes, eh: int, ew: int, cpp: int,
                       dt) -> np.ndarray:
    """Decode one compression-34887 (LERC, GDAL gtiff extension) tile or
    strip to an (eh, ew, cpp) block.  Like JPEG chunks, LERC blobs carry
    their own dtype/dims, so this bypasses the byte-stream _decompress
    path (frmts/gtiff: TIFFReadEncodedTile -> liblerc)."""
    from gdal_ray.compress import lerc_decode

    img = lerc_decode(raw)
    if img.ndim == 2:
        img = img[:, :, None]
    blk = np.zeros((eh, ew, cpp), dtype=dt)
    hh, ww = min(eh, img.shape[0]), min(ew, img.shape[1])
    blk[:hh, :ww] = img[:hh, :ww, :cpp].astype(dt, copy=False)
    return blk


def _decompress(raw: bytes, comp: int, expected: int) -> bytes:
    if comp == 1:
        return raw
    if comp in (8, 32946):
        return zlib.decompress(raw)
    if comp == 5:
        return _lzw_decode(raw, expected)
    if comp == 32773:
        return _unpackbits(raw, expected)
    if comp == 50000:  # ZSTD (GDAL extension tag value, gtiff driver)
        from gdal_ray.compress import zstd_decompress

        return zstd_decompress(raw, expected)
    raise NotImplementedError(f"TIFF compression {comp} not supported "
                              "(none/LZW/Deflate/PackBits/ZSTD implemented)")


def _undo_predictor2(block: np.ndarray) -> np.ndarray:
    """Horizontal differencing (tag 317 = 2): cumulative sum along rows,
    per sample channel, in the sample's integer width (mod 2^bits)."""
    return np.cumsum(block, axis=1, dtype=block.dtype)


def _undo_predictor3(buf: bytes, th: int, tw: int, cpp: int,
                     dt: np.dtype) -> np.ndarray:
    """Floating-point predictor (tag 317 = 3, TIFF TechNote 3 /
    libtiff tif_predict.c fpAcc): per chunk row, the bytes were split
    into big-endian byte planes then horizontally differenced with
    stride = samples-per-pixel.  Undo: per-lane cumsum mod 256, then
    re-interleave the planes and view as big-endian floats."""
    B = dt.itemsize
    n = tw * cpp
    rows = np.frombuffer(buf, dtype=np.uint8)[:th * n * B] \
        .reshape(th, B * n).copy()
    for lane in range(cpp):
        rows[:, lane::cpp] = np.cumsum(
            rows[:, lane::cpp], axis=1, dtype=np.uint8)
    planes = rows.reshape(th, B, n).transpose(0, 2, 1)  # (th, n, B) BE bytes
    be = np.ascontiguousarray(planes).reshape(th * n * B) \
        .view(np.dtype(dt.str.replace("<", ">").replace("=", ">")))
    return be.reshape(th, tw, cpp).astype(dt.newbyteorder("="))


def _do_predictor3(block: np.ndarray) -> bytes:
    """Forward fpDiff: big-endian byte-plane split per row, then
    horizontal differencing with stride = samples-per-pixel."""
    th, tw, cpp = block.shape
    dt = block.dtype
    B = dt.itemsize
    n = tw * cpp
    # .astype (not ascontiguousarray(dtype=...)) — the latter treats a
    # byte-order-only change as equivalent and skips the swap
    be = block.astype(dt.newbyteorder(">")).view(np.uint8).reshape(th, n, B)
    rows = np.ascontiguousarray(be.transpose(0, 2, 1)).reshape(th, B * n)
    out = rows.copy()
    out[:, cpp:] = rows[:, cpp:] - rows[:, :-cpp]
    return out.tobytes()


def read_geotiff(data: bytes, ifd_off: int | None = None) -> tuple[np.ndarray, dict]:
    """-> (array, info).  info keys: geotransform (6-tuple or None), epsg
    (int or None), nodata (float or None), metadata (raw GDAL xml str or
    None), model_type ('projected'|'geographic'|None).  ``ifd_off``
    decodes a specific IFD of a multi-IFD (COG) file."""
    r = _Reader(data)
    tags = r.ifd_tags(r.first_ifd if ifd_off is None else ifd_off)
    w = int(tags[T_WIDTH][0])
    h = int(tags[T_LENGTH][0])
    spp = int(tags.get(T_SAMPLES, [1])[0])
    bits_l = tags.get(T_BITS, [8] * spp)
    bits = int(bits_l[0])
    if any(int(b) != bits for b in bits_l):
        raise NotImplementedError("mixed BitsPerSample")
    sf = int(tags.get(T_SAMPLE_FORMAT, [1])[0])
    if (bits, sf) not in _DTYPES:
        raise NotImplementedError(f"sample type bits={bits} format={sf}")
    dt = np.dtype(_DTYPES[(bits, sf)]).newbyteorder(r.e)
    comp = int(tags.get(T_COMPRESSION, [1])[0])
    planar = int(tags.get(T_PLANAR, [1])[0])
    predictor = int(tags.get(T_PREDICTOR, [1])[0])
    bpp = bits // 8
    phot = int(tags.get(T_PHOTOMETRIC, [1])[0])
    jpegtables = (bytes(tags[T_JPEG_TABLES]) if T_JPEG_TABLES in tags
                  else None)
    if comp == 7 and planar == 2:
        raise NotImplementedError("JPEG compression with planar config 2")

    tiled = T_TILE_OFFSETS in tags
    if tiled:
        tw, th = int(tags[T_TILE_W][0]), int(tags[T_TILE_H][0])
        offs, cnts = tags[T_TILE_OFFSETS], tags[T_TILE_COUNTS]
        tx = (w + tw - 1) // tw
        ty = (h + th - 1) // th
        per_plane = tx * ty
        nplanes = spp if planar == 2 else 1
        cpp = spp if planar == 1 else 1  # channels per chunk
        out = np.empty((h, w, spp), dtype=dt.newbyteorder("="))
        k = 0
        for plane in range(nplanes):
            for j in range(ty):
                for i in range(tx):
                    raw = data[int(offs[k]):int(offs[k]) + int(cnts[k])]
                    k += 1
                    if comp == 7:
                        blk = _decode_jpeg_chunk(raw, jpegtables, phot,
                                                 th, tw, cpp,
                                                 dt.newbyteorder("="))
                    elif comp == 34887:
                        blk = _decode_lerc_chunk(raw, th, tw, cpp,
                                                 dt.newbyteorder("="))
                    else:
                        exp = tw * th * cpp * bpp
                        buf = _decompress(raw, comp, exp)
                        if len(buf) < exp:
                            # partial final tile stored short (GDAL #1179
                            # tolerance: zero-fill the missing tail)
                            buf = bytes(buf) + b"\x00" * (exp - len(buf))
                        if predictor == 3:
                            blk = _undo_predictor3(buf, th, tw, cpp, dt)
                        else:
                            blk = np.frombuffer(buf[:exp], dtype=dt).reshape(th, tw, cpp)
                            if predictor == 2:
                                blk = _undo_predictor2(blk.astype(dt.newbyteorder("=")))
                    y0, x0 = j * th, i * tw
                    hh, ww = min(th, h - y0), min(tw, w - x0)
                    if planar == 2:
                        out[y0:y0 + hh, x0:x0 + ww, plane] = blk[:hh, :ww, 0]
                    else:
                        out[y0:y0 + hh, x0:x0 + ww, :] = blk[:hh, :ww, :]
        arr = out
    else:
        rps = int(tags.get(T_ROWS_PER_STRIP, [h])[0])
        offs, cnts = tags[T_STRIP_OFFSETS], tags[T_STRIP_COUNTS]
        strips_per_plane = (h + rps - 1) // rps
        nplanes = spp if planar == 2 else 1
        cpp = spp if planar == 1 else 1
        arr = np.empty((h, w, spp), dtype=dt.newbyteorder("="))
        k = 0
        for plane in range(nplanes):
            for s in range(strips_per_plane):
                y0 = s * rps
                hh = min(rps, h - y0)
                raw = data[int(offs[k]):int(offs[k]) + int(cnts[k])]
                k += 1
                if comp == 7:
                    blk = _decode_jpeg_chunk(raw, jpegtables, phot,
                                             hh, w, cpp, dt.newbyteorder("="))
                elif comp == 34887:
                    blk = _decode_lerc_chunk(raw, hh, w, cpp,
                                             dt.newbyteorder("="))
                else:
                    exp = hh * w * cpp * bpp
                    buf = _decompress(raw, comp, exp)
                    if len(buf) < exp:
                        # short final strip (GDAL #1179 tolerance)
                        buf = bytes(buf) + b"\x00" * (exp - len(buf))
                    if predictor == 3:
                        blk = _undo_predictor3(buf, hh, w, cpp, dt)
                    else:
                        blk = np.frombuffer(buf[:exp], dtype=dt).reshape(hh, w, cpp)
                        if predictor == 2:
                            blk = _undo_predictor2(blk.astype(dt.newbyteorder("=")))
                if planar == 2:
                    arr[y0:y0 + hh, :, plane] = blk[:, :, 0]
                else:
                    arr[y0:y0 + hh, :, :] = blk
    if spp == 1:
        arr = arr[:, :, 0]

    info: dict = {"geotransform": None, "epsg": None, "nodata": None,
                  "metadata": None, "model_type": None, "palette": None}
    if T_COLORMAP in tags:
        # TIFF 6.0 §ColorMap: 3·2^bits SHORTs, all reds then greens then
        # blues (photometric 3 palette-color; GDAL color table)
        cm = np.asarray(tags[T_COLORMAP], dtype=np.uint16)
        n = len(cm) // 3
        info["palette"] = np.stack([cm[:n], cm[n:2 * n], cm[2 * n:]], axis=1)
    if T_MODEL_TRANSFORM in tags:
        m = tags[T_MODEL_TRANSFORM]
        info["geotransform"] = (m[3], m[0], m[1], m[7], m[4], m[5])
    elif T_MODEL_PIXEL_SCALE in tags and T_MODEL_TIEPOINT in tags:
        sx, sy = tags[T_MODEL_PIXEL_SCALE][0], tags[T_MODEL_PIXEL_SCALE][1]
        tp = tags[T_MODEL_TIEPOINT]
        # tiepoint: (i, j, k, X, Y, Z) — raster point -> model point
        i0, j0, gx, gy = tp[0], tp[1], tp[3], tp[4]
        info["geotransform"] = (gx - i0 * sx, sx, 0.0, gy + j0 * sy, 0.0, -sy)
    if T_GEO_KEYS in tags:
        gk = tags[T_GEO_KEYS]
        # directory header: version, rev, minor, count; then 4-shorts per key
        nkeys = int(gk[3])
        for ki in range(nkeys):
            key, loc, cnt, val = gk[4 + 4 * ki: 8 + 4 * ki]
            if key == GK_MODEL_TYPE and loc == 0:
                info["model_type"] = {1: "projected", 2: "geographic"}.get(int(val))
            elif key in (GK_GEOGRAPHIC_TYPE, GK_PROJECTED_CS) and loc == 0:
                if 1024 <= int(val) < 32767:
                    info["epsg"] = int(val)
    if T_GDAL_NODATA in tags:
        try:
            info["nodata"] = float(tags[T_GDAL_NODATA][0].strip())
        except ValueError:
            pass
    if T_GDAL_METADATA in tags:
        info["metadata"] = tags[T_GDAL_METADATA][0]
    return arr, info


def decode_tiff(data: bytes) -> np.ndarray:
    return read_geotiff(data)[0]


# ---------------------------------------------------------------- encode


def _do_predictor2(block: np.ndarray) -> np.ndarray:
    out = block.copy()
    out[:, 1:] = block[:, 1:] - block[:, :-1]
    return out


def encode_geotiff(
    arr: np.ndarray,
    *,
    geotransform=None,
    epsg: int | None = None,
    nodata: float | None = None,
    metadata: str | None = None,
    compression: str = "deflate",
    predictor: bool = False,
    tile_size: int | None = None,
    rows_per_strip: int | None = None,
    big: bool = False,
    jpeg_quality: int = 85,
    lerc_max_z_err: float = 0.0,
    planar: bool = False,
    palette: np.ndarray | None = None,
) -> bytes:
    """Write a single-IFD little-endian (Geo)TIFF.  compression in
    {'none','deflate','lzw','packbits','jpeg'}; predictor=True applies
    horizontal differencing (integer dtypes only); tile_size writes a
    tiled layout instead of strips.  'jpeg' (compression 7, TechNote 2)
    writes abbreviated per-chunk streams + a shared JPEGTables tag, YCbCr
    photometric for 3-band uint8 — the layout libtiff/GDAL produce for
    lossy aerial-imagery GeoTIFFs (frmts/gtiff/geotiff.cpp JPEG path)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    dt = arr.dtype
    if dt.kind not in _SF_OF:
        raise NotImplementedError(f"dtype {dt} not supported")
    sf = _SF_OF[dt.kind]
    bits = dt.itemsize * 8
    if (bits, sf) not in _DTYPES:
        raise NotImplementedError(f"dtype {dt} not supported")
    comp_id = {"none": 1, "deflate": 8, "lzw": 5, "packbits": 32773,
               "jpeg": 7, "zstd": 50000, "lerc": 34887}[compression]
    if comp_id == 7:
        if dt != np.uint8 or spp not in (1, 3):
            raise NotImplementedError("JPEG compression needs uint8, 1 or 3 bands")
        if predictor:
            raise ValueError("predictor does not apply to JPEG compression")
    if comp_id == 34887 and predictor:
        raise ValueError("predictor does not apply to LERC compression "
                         "(LERC predicts internally)")
    # PlanarConfiguration=2 (TIFF 6.0): one chunk per (band, window),
    # plane-major chunk order — GDAL's INTERLEAVE=BAND
    planar = bool(planar) and spp > 1
    if planar and comp_id == 7:
        raise NotImplementedError("JPEG compression with planar config 2")
    # integer dtypes difference in place (predictor 2); float dtypes use
    # the TechNote-3 byte-plane split (predictor 3) — GDAL's PREDICTOR=3
    pred_id = 0 if not predictor else (3 if dt.kind == "f" else 2)
    arr_le = np.ascontiguousarray(arr, dtype=dt.newbyteorder("<"))

    def _compress(block: np.ndarray) -> bytes:
        if comp_id == 7:
            from gdal_ray.codecs.jpeg import encode_jpeg

            img = block[:, :, 0] if block.shape[2] == 1 else block
            return encode_jpeg(np.ascontiguousarray(img), quality=jpeg_quality)
        if comp_id == 34887:
            from gdal_ray.compress import lerc_encode

            b = block.astype(block.dtype.newbyteorder("="), copy=False)
            return lerc_encode(b[:, :, 0] if b.shape[2] == 1 else b,
                               max_z_err=lerc_max_z_err)
        if pred_id == 3:
            raw = _do_predictor3(block)
        else:
            if pred_id == 2:
                block = _do_predictor2(block)
            raw = block.tobytes()
        if comp_id == 1:
            return raw
        if comp_id == 8:
            return zlib.compress(raw, 6)
        if comp_id == 5:
            return _lzw_encode(raw)
        if comp_id == 50000:
            from gdal_ray.compress import zstd_compress

            return zstd_compress(raw)
        return _packbits(raw)

    chunks: list[bytes] = []
    planes = ([arr_le[:, :, p:p + 1] for p in range(spp)] if planar
              else [arr_le])
    if tile_size:
        tw = th = int(tile_size)
        if tw % 16 or th % 16:
            raise ValueError("TIFF tile size must be a multiple of 16")
        tx, ty = (w + tw - 1) // tw, (h + th - 1) // th
        for pl in planes:
            for j in range(ty):
                for i in range(tx):
                    blk = np.zeros((th, tw, pl.shape[2]), dtype=arr_le.dtype)
                    hh, ww = min(th, h - j * th), min(tw, w - i * tw)
                    blk[:hh, :ww] = pl[j * th:j * th + hh, i * tw:i * tw + ww]
                    chunks.append(_compress(blk))
    else:
        rps = int(rows_per_strip or max(1, (1 << 16) // max(1, w * spp * dt.itemsize)))
        for pl in planes:
            for y0 in range(0, h, rps):
                chunks.append(_compress(np.ascontiguousarray(pl[y0:y0 + rps])))

    # --- assemble tags ---
    tags: list[tuple[int, int, int, list]] = []  # (tag, ftype, count, values)

    def add(tag, ftype, vals):
        tags.append((tag, ftype, len(vals), vals))

    add(T_WIDTH, 4, [w])
    add(T_LENGTH, 4, [h])
    add(T_BITS, 3, [bits] * spp)
    add(T_COMPRESSION, 3, [comp_id])
    if comp_id == 7:
        # move the (identical) DQT/DHT of every chunk into JPEGTables
        tables0, _ = _jpeg_split_tables(chunks[0])
        chunks = [_jpeg_split_tables(c)[1] for c in chunks]
        add(T_JPEG_TABLES, 7, list(tables0))
        add(T_PHOTOMETRIC, 3, [6 if spp == 3 else 1])
    elif palette is not None:
        # palette-color (photometric 3): single index band + ColorMap of
        # 3·2^bits SHORTs in R..G..B plane order (TIFF 6.0 §ColorMap)
        if spp != 1 or dt.kind not in "iu" or bits > 16:
            raise ValueError("palette TIFF needs a single integer "
                             "(<=16-bit) index band")
        pal = np.asarray(palette, dtype=np.uint16)
        if pal.ndim != 2 or pal.shape[1] != 3:
            raise ValueError("palette must be (n, 3) RGB (16-bit values)")
        full = np.zeros((1 << bits, 3), dtype=np.uint16)
        full[:len(pal)] = pal[:1 << bits]
        add(T_PHOTOMETRIC, 3, [3])
        add(T_COLORMAP, 3, [int(v) for v in full.T.ravel()])
    else:
        add(T_PHOTOMETRIC, 3, [2 if spp >= 3 else 1])
    add(T_SAMPLES, 3, [spp])
    if planar:
        add(T_PLANAR, 3, [2])
    if spp in (2, 4):
        add(T_EXTRASAMPLES, 3, [2] * (spp - 3 if spp > 3 else spp - 1))
    if pred_id:
        add(T_PREDICTOR, 3, [pred_id])
    add(T_SAMPLE_FORMAT, 3, [sf] * spp)
    if tile_size:
        add(T_TILE_W, 3, [tw])
        add(T_TILE_H, 3, [th])
    else:
        add(T_ROWS_PER_STRIP, 4, [rps])
    if geotransform is not None:
        gt = geotransform
        if abs(gt[2]) > 0 or abs(gt[4]) > 0:
            add(T_MODEL_TRANSFORM, 12,
                [gt[1], gt[2], 0.0, gt[0], gt[4], gt[5], 0.0, gt[3],
                 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
        else:
            add(T_MODEL_PIXEL_SCALE, 12, [gt[1], -gt[5], 0.0])
            add(T_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])
    if epsg is not None:
        model = 2 if 4000 <= epsg < 5000 else 1
        keydir = [1, 1, 1, 3,
                  GK_MODEL_TYPE, 0, 1, model,
                  GK_RASTER_TYPE, 0, 1, 1,  # PixelIsArea
                  (GK_GEOGRAPHIC_TYPE if model == 2 else GK_PROJECTED_CS), 0, 1, epsg]
        add(T_GEO_KEYS, 3, keydir)
    if metadata is not None:
        add(T_GDAL_METADATA, 2, [metadata])
    if nodata is not None:
        txt = repr(float(nodata))
        add(T_GDAL_NODATA, 2, [txt])

    # --- layout: header | IFD | overflow values | chunk data ---
    e = "<"
    if big:
        hdr_len, entry_sz, cnt_fmt, off_fmt, inline = 16, 20, "Q", "Q", 8
    else:
        hdr_len, entry_sz, cnt_fmt, off_fmt, inline = 8, 12, "I", "I", 4
    count_ft = 16 if big else 4  # LONG8 / LONG for offsets+counts
    # chunk offset/count tags appended last (values known after layout)
    off_tag = T_TILE_OFFSETS if tile_size else T_STRIP_OFFSETS
    cnt_tag = T_TILE_COUNTS if tile_size else T_STRIP_COUNTS
    add(off_tag, count_ft, [0] * len(chunks))
    add(cnt_tag, count_ft, [len(c) for c in chunks])
    tags.sort(key=lambda t: t[0])

    n = len(tags)
    ifd_off = hdr_len
    ifd_size = (8 + n * entry_sz + 8) if big else (2 + n * entry_sz + 4)
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def encode_vals(ftype, vals) -> bytes:
        code, _ = _FIELD[ftype]
        if ftype == 2:
            return vals[0].encode("latin-1") + b"\0"
        return struct.pack(e + code * len(vals), *vals)

    # first pass: compute overflow sizes to find data start
    sizes = []
    for tag, ftype, count, vals in tags:
        b = encode_vals(ftype, vals)
        if ftype == 2:
            count = len(b)
        sizes.append((len(b), count))
    data_off = overflow_off + sum(sz for sz, _ in sizes if sz > inline)
    if data_off % 2:
        data_off += 1
    # chunk offsets now known
    pos = data_off
    chunk_offsets = []
    for c in chunks:
        chunk_offsets.append(pos)
        pos += len(c)
    tags = [(t, f, c, chunk_offsets if t == off_tag else v) for t, f, c, v in tags]

    out = bytearray()
    if big:
        out += b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
    else:
        out += b"II" + struct.pack("<HI", 42, ifd_off)
    entries = bytearray()
    ov_cursor = overflow_off
    for (tag, ftype, count, vals), (sz, cnt2) in zip(tags, sizes):
        b = encode_vals(ftype, vals)
        count = cnt2
        ent = struct.pack(e + "HH", tag, ftype) + struct.pack(e + cnt_fmt, count)
        if len(b) <= inline:
            ent += b + b"\0" * (inline - len(b))
        else:
            ent += struct.pack(e + off_fmt, ov_cursor)
            overflow += b
            ov_cursor += len(b)
        entries += ent
    if big:
        out += struct.pack("<Q", n) + entries + struct.pack("<Q", 0)
    else:
        out += struct.pack("<H", n) + entries + struct.pack("<I", 0)
    out += overflow
    out += b"\0" * (data_off - len(out))
    for c in chunks:
        out += c
    return bytes(out)


def encode_tiff(arr: np.ndarray, **kw) -> bytes:
    return encode_geotiff(arr, **kw)


# --------------------------------------------------------------------- COG

T_SUBFILETYPE = 254


def _ifd_chain(r: _Reader) -> list[int]:
    """Offsets of every IFD, following the next-IFD pointers."""
    offs = []
    off = r.first_ifd
    while off:
        offs.append(off)
        if r.big:
            n = struct.unpack(r.e + "Q", r.d[off:off + 8])[0]
            ptr = off + 8 + n * 20
            off = struct.unpack(r.e + "Q", r.d[ptr:ptr + 8])[0]
        else:
            n = struct.unpack(r.e + "H", r.d[off:off + 2])[0]
            ptr = off + 2 + n * 12
            off = struct.unpack(r.e + "I", r.d[ptr:ptr + 4])[0]
    return offs


def read_cog(data: bytes) -> list[tuple[np.ndarray, dict]]:
    """Decode every IFD of a (COG-style) multi-IFD TIFF — [(array, info)]
    per level, full resolution first."""
    r = _Reader(data)
    return [read_geotiff(data, off) for off in _ifd_chain(r)]


def _2x_reduce(a: np.ndarray, method: str) -> np.ndarray:
    """2× overview reduction (gcore/overview.cpp average/nearest for the
    COG pyramid).  Edge rows/cols replicate to even dimensions first."""
    h, w = a.shape[:2]
    if h % 2:
        a = np.concatenate([a, a[-1:]], axis=0)
    if w % 2:
        a = np.concatenate([a, a[:, -1:]], axis=1)
    if method == "nearest":
        return a[::2, ::2]
    q = a.reshape(a.shape[0] // 2, 2, a.shape[1] // 2, 2, *a.shape[2:])
    m = q.astype(np.float64).mean(axis=(1, 3))
    if np.issubdtype(a.dtype, np.integer):
        return np.floor(m + 0.5).astype(a.dtype)
    return m.astype(a.dtype)


def encode_cog(
    arr: np.ndarray,
    *,
    geotransform=None,
    epsg: int | None = None,
    nodata: float | None = None,
    compression: str = "deflate",
    tile_size: int = 256,
    resampler: str = "average",
) -> bytes:
    """Cloud-Optimized GeoTIFF writer (frmts/gtiff/cogdriver.cpp layout):
    classic little-endian TIFF with ALL IFDs up front (full-resolution
    IFD0 chained to NewSubfileType=1 overview IFDs), tiled chunks, and
    the tile data section ordered smallest-overview-first with the
    full-resolution tiles LAST — so a range reader gets header + all
    metadata in one initial fetch and overview zooms stream before full
    data.  Overviews reduce 2× until the level fits one tile."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype.kind not in _SF_OF:
        raise NotImplementedError(f"dtype {arr.dtype} not supported")
    if tile_size % 16:
        raise ValueError("TIFF tile size must be a multiple of 16")
    comp_id = {"none": 1, "deflate": 8, "lzw": 5, "packbits": 32773,
               "jpeg": 7, "zstd": 50000, "lerc": 34887}[compression]
    if comp_id == 7 and (arr.dtype != np.uint8 or arr.shape[2] not in (1, 3)):
        raise NotImplementedError("JPEG compression needs uint8, 1 or 3 bands")

    levels = [arr]
    while max(levels[-1].shape[0], levels[-1].shape[1]) > tile_size:
        levels.append(_2x_reduce(levels[-1], resampler))

    level_chunks = []
    for a in levels:
        level_chunks.append([
            compress_cog_tile(blk, compression)
            for blk in iter_cog_tiles(a, tile_size)])
    return _cog_assemble(
        [a.shape for a in levels], [a.dtype for a in levels], level_chunks,
        tile_size=tile_size, comp_id=comp_id, geotransform=geotransform,
        epsg=epsg, nodata=nodata)


def iter_cog_tiles(a: np.ndarray, tile_size: int):
    """Row-major padded (tile_size, tile_size, spp) tiles of one level."""
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    a_le = np.ascontiguousarray(a, dtype=a.dtype.newbyteorder("<"))
    th = tw = tile_size
    for j in range((h + th - 1) // th):
        for i in range((w + tw - 1) // tw):
            blk = np.zeros((th, tw, spp), dtype=a_le.dtype)
            hh, ww = min(th, h - j * th), min(tw, w - i * tw)
            blk[:hh, :ww] = a_le[j * th:j * th + hh, i * tw:i * tw + ww]
            yield blk


def compress_cog_tile(blk: np.ndarray, compression: str) -> bytes:
    """Compress one padded tile — the CPU-heavy kernel the distributed
    COG sink (state/cogsink.py) runs inside map_batches.  'jpeg' tiles
    are SELF-CONTAINED streams (tables inline, no shared JPEGTables):
    spec-legal, and it keeps distributed tile compression independent —
    no cross-task coordination of a shared tables blob."""
    if compression == "jpeg":
        from gdal_ray.codecs.jpeg import encode_jpeg

        img = blk[:, :, 0] if blk.shape[2] == 1 else blk
        return encode_jpeg(np.ascontiguousarray(img, dtype=np.uint8))
    if compression == "lerc":
        from gdal_ray.compress import lerc_encode

        b = np.ascontiguousarray(blk, dtype=blk.dtype.newbyteorder("="))
        return lerc_encode(b[:, :, 0] if b.shape[2] == 1 else b)
    raw = np.ascontiguousarray(blk, dtype=blk.dtype.newbyteorder("<")).tobytes()
    if compression == "none":
        return raw
    if compression == "deflate":
        return zlib.compress(raw, 6)
    if compression == "lzw":
        return _lzw_encode(raw)
    if compression == "zstd":
        from gdal_ray.compress import zstd_compress

        return zstd_compress(raw)
    return _packbits(raw)


def _cog_assemble(level_shapes, level_dtypes, level_chunks, *, tile_size,
                  comp_id, geotransform=None, epsg=None, nodata=None) -> bytes:
    """COG layout pass over PRE-COMPRESSED tiles: IFD chain fully before
    tile data, data smallest-overview-first / full-res last
    (cogdriver.cpp).  level_shapes: [(h, w, spp)] full-res first;
    level_chunks: row-major compressed tile bytes per level."""
    e = "<"
    hdr_len, entry_sz, inline = 8, 12, 4
    tw = th = tile_size
    levels = level_shapes

    def encode_vals(ftype, vals) -> bytes:
        code, _ = _FIELD[ftype]
        if ftype == 2:
            return vals[0].encode("latin-1") + b"\0"
        return struct.pack(e + code * len(vals), *vals)

    level_tags: list[list] = []
    for li, ((h, w, spp), dt, chunks) in enumerate(
            zip(level_shapes, level_dtypes, level_chunks)):
        dt = np.dtype(dt)
        sf = _SF_OF[dt.kind]
        bits = dt.itemsize * 8
        tags: list[tuple[int, int, int, list]] = []

        def add(tag, ftype, vals, tags=tags):
            tags.append((tag, ftype, len(vals), vals))

        if li > 0:
            add(T_SUBFILETYPE, 4, [1])  # reduced-resolution subfile
        add(T_WIDTH, 4, [w])
        add(T_LENGTH, 4, [h])
        add(T_BITS, 3, [bits] * spp)
        add(T_COMPRESSION, 3, [comp_id])
        if comp_id == 7:
            add(T_PHOTOMETRIC, 3, [6 if spp == 3 else 1])
        else:
            add(T_PHOTOMETRIC, 3, [2 if spp >= 3 else 1])
        add(T_SAMPLES, 3, [spp])
        if spp in (2, 4):
            add(T_EXTRASAMPLES, 3, [2] * (spp - 3 if spp > 3 else spp - 1))
        add(T_SAMPLE_FORMAT, 3, [sf] * spp)
        add(T_TILE_W, 3, [tw])
        add(T_TILE_H, 3, [th])
        if li == 0:
            if geotransform is not None:
                gt = geotransform
                add(T_MODEL_PIXEL_SCALE, 12, [gt[1], -gt[5], 0.0])
                add(T_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])
            if epsg is not None:
                model = 2 if 4000 <= epsg < 5000 else 1
                add(T_GEO_KEYS, 3,
                    [1, 1, 1, 3, GK_MODEL_TYPE, 0, 1, model,
                     GK_RASTER_TYPE, 0, 1, 1,
                     (GK_GEOGRAPHIC_TYPE if model == 2 else GK_PROJECTED_CS),
                     0, 1, epsg])
            if nodata is not None:
                add(T_GDAL_NODATA, 2, [repr(float(nodata))])
        add(T_TILE_OFFSETS, 4, [0] * len(chunks))
        add(T_TILE_COUNTS, 4, [len(c) for c in chunks])
        tags.sort(key=lambda t: t[0])
        level_tags.append(tags)

    # layout pass: header | IFD0 block | IFD1 block | ... | tile data
    # (data ordered smallest level first, level 0 LAST — the COG rule)
    ifd_offs = []
    pos = hdr_len
    block_overflow_sizes = []
    for tags in level_tags:
        ifd_offs.append(pos)
        n = len(tags)
        ov = 0
        for tag, ftype, count, vals in tags:
            b = encode_vals(ftype, vals)
            if len(b) > inline:
                ov += len(b)
        block_overflow_sizes.append(ov)
        pos += 2 + n * entry_sz + 4 + ov
    data_off = pos + (pos % 2)
    # assign chunk offsets, smallest overview first
    chunk_offsets: list[list[int]] = [None] * len(levels)
    p = data_off
    for li in range(len(levels) - 1, -1, -1):
        offs = []
        for c in level_chunks[li]:
            offs.append(p)
            p += len(c)
        chunk_offsets[li] = offs

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_offs[0])
    for li, tags in enumerate(level_tags):
        tags = [(t, f, c, chunk_offsets[li] if t == T_TILE_OFFSETS else v)
                for t, f, c, v in tags]
        n = len(tags)
        entries = bytearray()
        ov_cursor = ifd_offs[li] + 2 + n * entry_sz + 4
        overflow = bytearray()
        for tag, ftype, count, vals in tags:
            b = encode_vals(ftype, vals)
            cnt = len(b) if ftype == 2 else count
            ent = struct.pack(e + "HH", tag, ftype) + struct.pack(e + "I", cnt)
            if len(b) <= inline:
                ent += b + b"\0" * (inline - len(b))
            else:
                ent += struct.pack(e + "I", ov_cursor)
                overflow += b
                ov_cursor += len(b)
            entries += ent
        next_ifd = ifd_offs[li + 1] if li + 1 < len(levels) else 0
        out += struct.pack("<H", n) + entries + struct.pack("<I", next_ifd)
        out += overflow
    out += b"\0" * (data_off - len(out))
    for li in range(len(levels) - 1, -1, -1):
        for c in level_chunks[li]:
            out += c
    return bytes(out)
