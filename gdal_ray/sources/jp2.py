"""JPEG 2000 structural driver — JP2 container boxes (ISO/IEC 15444-1
Annex I) + codestream main-header markers (Annex A), the identify/info
surface of the reference's frmts/jp2openjpeg/jp2openjpegdataset.cpp.

Structural layer: box walk (incl. XLBox long lengths), jp2h/ihdr image
header, colr colour specification, the full main-header marker walk
(SIZ/COD/QCD/COM), and the tile-part index from SOT markers — the layout
a distributed reader needs to range-read one tile per Ray task,
exactly the gtiff_reader shape (driver parses only headers; tasks seek).

Pixel decode: full from-spec EBCOT in codecs/j2k.py (MQ coder, tag
trees, three-pass bit-plane decoding, 5/3 + 9/7 inverse DWT, RCT/ICT)
— bit-exact against the GDAL autotest fixtures' published checksums.
``read_jp2`` fans tiles out: each Ray task splices main header + its
own tile-parts and decodes only that tile.
"""

from __future__ import annotations

import os
import struct

_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"

# GeoJP2 GeoTIFF-box UUID (gt_wkt_srs.cpp msi_uuid2)
_GEOJP2_UUID = bytes.fromhex("b14bf8bd083d4b43a5ae8cd7d5a6ce03")


def _parse_gmljp2(payload: bytes):
    """GMLJP2 RectifiedGrid -> (geotransform, epsg) or None.

    Mirrors gdaljp2metadata.cpp GetGeoTransform semantics: gml:pos is
    the CENTER of the first cell (half-pixel shift applied); the two
    offsetVectors are matched to column/row steps by magnitude; for
    urn-form geographic CRS (EPSG 4xxx) coordinates are lat/lon and are
    swapped to x/y.  Robust to embedded NULs (autotest
    byte_gmljp2_with_nul_car)."""
    import re

    xml = payload.replace(b"\x00", b"").decode("utf-8", "replace")
    m_pos = re.search(r"<gml:pos>([-\d.eE+ ]+)</gml:pos>", xml)
    m_ov = re.findall(
        r"<gml:offsetVector[^>]*>([-\d.eE+ ]+)</gml:offsetVector>", xml)
    m_srs = re.search(r'srsName="([^"]*)"', xml)
    if not (m_pos and len(m_ov) >= 2):
        return None
    px, py = (float(v) for v in m_pos.group(1).split()[:2])
    ov1 = [float(v) for v in m_ov[0].split()[:2]]
    ov2 = [float(v) for v in m_ov[1].split()[:2]]
    epsg = None
    flip = False
    if m_srs:
        srs = m_srs.group(1)
        em = re.search(r"EPSG:+(\d+)", srs)
        if em:
            epsg = int(em.group(1))
        # urn form uses authority axis order; geographic EPSG (4xxx) is
        # lat/lon -> swap (the 3035 fixture stores easting/northing
        # despite the urn, matching the reference's inverted-axis check)
        flip = srs.startswith("urn:") and epsg is not None \
            and 4000 <= epsg <= 4999
    if flip:
        px, py = py, px
        ov1 = [ov1[1], ov1[0]]
        ov2 = [ov2[1], ov2[0]]
    # column step = the vector with the dominant x component
    if abs(ov1[0]) >= abs(ov2[0]):
        vx, vy = ov1, ov2
    else:
        vx, vy = ov2, ov1
    gt = (px - 0.5 * vx[0] - 0.5 * vy[0], vx[0], vy[0],
          py - 0.5 * vx[1] - 0.5 * vy[1], vx[1], vy[1])
    return gt, epsg

_PROGRESSIONS = {0: "LRCP", 1: "RLCP", 2: "RPCL", 3: "PCRL", 4: "CPRL"}

_COLR_CS = {16: "sRGB", 17: "greyscale", 18: "sYCC"}


def _boxes(buf: bytes, off: int, end: int):
    """Yield (type, payload_off, payload_len) for boxes in buf[off:end]."""
    while off + 8 <= end:
        ln = struct.unpack_from(">I", buf, off)[0]
        btype = buf[off + 4:off + 8]
        hdr = 8
        if ln == 1:  # XLBox: 64-bit length follows
            ln = struct.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif ln == 0:  # to end of file
            ln = end - off
        if ln < hdr:
            raise ValueError("JP2: corrupt box length")
        yield btype, off + hdr, ln - hdr
        off += ln


def _parse_codestream(buf: bytes, off: int, end: int) -> dict:
    """Main-header marker walk + SOT tile-part index (Annex A)."""
    if buf[off:off + 2] != b"\xffO":  # SOC = 0xFF4F
        raise ValueError("JP2: codestream does not start with SOC")
    pos = off + 2
    out: dict = {"tile_parts": []}
    while pos + 4 <= end:
        if buf[pos] != 0xFF:
            raise ValueError(f"JP2: expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOC
            break
        seg_len = struct.unpack_from(">H", buf, pos + 2)[0]
        body = pos + 4
        if marker == 0x51:  # SIZ
            (rsiz, xsiz, ysiz, xo, yo, xt, yt, xto, yto, csiz) = \
                struct.unpack_from(">HIIIIIIIIH", buf, body)
            comps = []
            for c in range(csiz):
                ssiz, xr, yr = struct.unpack_from(">BBB", buf, body + 36 + 3 * c)
                comps.append({"depth": (ssiz & 0x7F) + 1,
                              "signed": bool(ssiz & 0x80),
                              "dx": xr, "dy": yr})
            out.update({
                "profile": rsiz,
                "width": xsiz - xo, "height": ysiz - yo,
                "x_off": xo, "y_off": yo, "tile_x_off": xto,
                "tile_y_off": yto,
                "tile_width": xt, "tile_height": yt,
                "n_tiles_x": -(-(xsiz - xto) // xt),
                "n_tiles_y": -(-(ysiz - yto) // yt),
                "components": comps,
            })
        elif marker == 0x52:  # COD
            scod = buf[body]
            prog, n_layers = struct.unpack_from(">BH", buf, body + 1)
            levels = buf[body + 5]
            out.update({
                "progression": _PROGRESSIONS.get(prog, f"?{prog}"),
                "n_layers": n_layers,
                "n_resolutions": levels + 1,
                "reversible": buf[body + 9] == 1,  # 5/3 vs 9/7 transform
            })
        elif marker == 0x64:  # COM
            out.setdefault("comments", []).append(
                buf[body + 2:body + seg_len - 2].decode("latin-1", "replace"))
        elif marker == 0x90:  # SOT: tile-part index entry
            isot, psot, tpsot, _ = struct.unpack_from(">HIBB", buf, body)
            if psot == 0:  # last tile-part: runs to EOC
                psot = end - pos - 2
            out["tile_parts"].append(
                {"tile": isot, "part": tpsot, "offset": pos, "length": psot})
            pos += psot
            continue
        pos = body + seg_len - 2


    return out


def jp2_info(path: str) -> dict:
    """Header-only parse of a .jp2/.jpx container or raw .j2k codestream.
    Reads the header region + walks tile-part markers (seek-only past
    payload bytes) — no pixel data is decoded."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        buf = f.read()
    info: dict = {"driver": "JP2", "file_size": size}
    if buf[:2] == b"\xffO":  # raw codestream (.j2k/.j2c)
        info["container"] = "raw-codestream"
        cs = _parse_codestream(buf, 0, len(buf))
    elif buf[:12] == _SIG:
        info["container"] = "jp2"
        cs = None
        gml_georef = None
        for btype, boff, blen in _boxes(buf, 0, len(buf)):
            if btype == b"ftyp":
                info["brand"] = buf[boff:boff + 4].decode("latin-1")
            elif btype == b"jp2h":
                for st, soff, slen in _boxes(buf, boff, boff + blen):
                    if st == b"ihdr":
                        h, w, nc, bpc = struct.unpack_from(">IIHB", buf, soff)
                        info.update({"ihdr": {"width": w, "height": h,
                                              "bands": nc,
                                              "depth": (bpc & 0x7F) + 1}})
                    elif st == b"colr" and buf[soff] == 1:
                        ecs = struct.unpack_from(">I", buf, soff + 3)[0]
                        info["colorspace"] = _COLR_CS.get(ecs, f"enum:{ecs}")
            elif btype == b"uuid" and buf[boff:boff + 16] == _GEOJP2_UUID:
                # GeoJP2: degenerate GeoTIFF carrying the georeferencing
                # (gt_wkt_srs.cpp); parse with the TIFF codec's geokey walk
                try:
                    from gdal_ray.codecs.tiff import read_geotiff

                    _, gi = read_geotiff(buf[boff + 16:boff + blen])
                    if gi.get("geotransform"):
                        info["geotransform"] = gi["geotransform"]
                    if gi.get("epsg"):
                        info["epsg"] = gi["epsg"]
                except Exception:
                    pass
            elif btype == b"asoc":
                # GMLJP2: gml.data asoc wrapping xml boxes
                g = _parse_gmljp2(buf[boff:boff + blen])
                if g is not None:
                    gml_georef = g
            elif btype == b"jp2c":
                cs = _parse_codestream(buf, boff, boff + blen)
        if cs is None:
            raise ValueError("JP2: no contiguous codestream (jp2c) box")
        # precedence: GeoJP2 (uuid) over GMLJP2, the reference's default
        # GEOREF_SOURCES order (jp2openjpeg.py:3344 expects 26711)
        if gml_georef is not None and "geotransform" not in info:
            info["geotransform"] = gml_georef[0]
            if gml_georef[1] is not None:
                info["epsg"] = gml_georef[1]
            info["georef_source"] = "GMLJP2"
        elif "geotransform" in info:
            info["georef_source"] = "GeoJP2"
    else:
        raise ValueError("not a JP2 container or JPEG 2000 codestream")
    tps = cs.pop("tile_parts")
    info.update(cs)
    info["n_tile_parts"] = len(tps)
    info["tile_parts"] = tps  # per-task range-read layout
    if info.get("width") and tps:
        info["compression_ratio"] = round(
            info["width"] * info["height"]
            * sum(c["depth"] for c in info["components"]) / 8
            / max(1, sum(t["length"] for t in tps)), 2)
    return info


def decode_jp2(path: str):
    """Full EBCOT decode (codecs/j2k.py, from ISO 15444-1 Annex B-G):
    returns the image array — (h, w) or (h, w, bands)."""
    from gdal_ray.codecs.j2k import decode_jp2_bytes

    with open(path, "rb") as f:
        return decode_jp2_bytes(f.read())


def read_jp2(path: str, *, batch_size: int = 4):
    """-> Dataset of decoded tile chunks (row0, col0, h, w, band, data).

    One Ray task decodes one JPEG 2000 tile: the driver parses only the
    main header + SOT index (jp2_info seeks past payload), then each
    task range-reads the shared main-header region plus its own
    tile-part byte ranges and decodes a spliced single-tile codestream
    — payload bytes of other tiles are never read by the task.  This is
    the gtiff_reader shape; a 100k-tile mosaic fans out across the
    cluster with no per-task whole-file reads."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.codecs.j2k import decode_j2k

    info = jp2_info(path)
    tps = info["tile_parts"]
    if not tps:
        raise ValueError("JP2: no tile-parts")
    # codestream start: first SOT minus the main header length is not
    # recorded directly; recover it from the container walk
    with open(path, "rb") as f:
        head = f.read(tps[0]["offset"])
    if info["container"] == "jp2":
        soc = head.rfind(b"\xffO\xffQ")  # SOC+SIZ inside jp2c
    else:
        soc = 0
    main_header = head[soc:]
    per_tile: dict = {}
    for tp in tps:
        per_tile.setdefault(tp["tile"], []).append(tp)
    items = [{"tile": t} for t in sorted(per_tile)]

    def load(batch: pa.Table) -> pa.Table:
        rows = {"row0": [], "col0": [], "h": [], "w": [], "band": [],
                "data": []}
        xt, yt = info["tile_width"], info["tile_height"]
        ntx = info["n_tiles_x"]
        with open(path, "rb") as f:
            for it in batch.to_pylist():
                t = it["tile"]
                parts = sorted(per_tile[t], key=lambda p: p["part"])
                body = b""
                for tp in parts:
                    f.seek(tp["offset"])
                    body += f.read(tp["length"])
                sub = decode_j2k(main_header + body + b"\xff\xd9",
                                 only_tile=t)
                ty0 = max(info["tile_y_off"] + (t // ntx) * yt,
                          info["y_off"]) - info["y_off"]
                tx0 = max(info["tile_x_off"] + (t % ntx) * xt,
                          info["x_off"]) - info["x_off"]
                th, tw = sub.shape[0], sub.shape[1]
                nb = 1 if sub.ndim == 2 else sub.shape[2]
                for b in range(nb):
                    plane = sub if sub.ndim == 2 else sub[:, :, b]
                    rows["row0"].append(ty0)
                    rows["col0"].append(tx0)
                    rows["h"].append(th)
                    rows["w"].append(tw)
                    rows["band"].append(b)
                    rows["data"].append(
                        __import__("numpy").ascontiguousarray(plane).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "col0": pa.array(rows["col0"], pa.int64()),
            "h": pa.array(rows["h"], pa.int64()),
            "w": pa.array(rows["w"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    nb = max(1, min(len(items), 32))
    return rd.from_items(items, override_num_blocks=nb).map_batches(
        load, batch_format="pyarrow", batch_size=batch_size)


def write_jp2(path: str, arr, *, tile_size: int | None = None, **kw):
    """Lossless JP2 writer (reversible 5/3, optional tiling).  With
    `tile_size`, tiles are independent codestream segments — the
    distributed variant encodes per-tile bodies in parallel Ray tasks
    and the driver splices SOT segments (see write_jp2_parallel)."""
    from gdal_ray.codecs.j2k import encode_jp2

    data = encode_jp2(arr, tile_size=tile_size, **kw)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def write_jp2_parallel(path: str, arr, *, tile_size: int = 256, **kw):
    """Distributed lossless JP2 write: each Ray task tier-1-encodes one
    tile (the expensive part — MQ coding is bit-serial per code-block
    but tiles are independent); the driver assembles main header + SOT
    segments in tile order.  Mirrors state/cogsink.py's layout pass."""
    import numpy as np
    import ray

    from gdal_ray.codecs import j2k as J

    a = np.asarray(arr)
    if tile_size % 2:
        raise ValueError("tile_size must be even")
    H, W = a.shape[0], a.shape[1]
    C = 1 if a.ndim == 2 else a.shape[2]
    depth = kw.get("depth") or {np.uint8: 8, np.int8: 8, np.uint16: 16,
                                np.int16: 16}.get(a.dtype.type, 8)
    signed = kw.get("signed")
    if signed is None:
        signed = a.dtype.kind == "i"
    mct = kw.get("mct", True)
    levels = kw.get("levels")
    if levels is None:
        levels = max(0, min(5, (min(H, W) - 1).bit_length() - 2))

    @ray.remote
    def encode_tile_task(sub, tx0, ty0, tx1, ty1):
        use_mct = 1 if (mct and C >= 3) else 0
        extra = 1 if use_mct else 0

        def eps_fn(ci, kind):
            return depth + extra + J._BAND_GAIN[kind]

        planes = []
        for c in range(C):
            p = (sub[:, :, c] if sub.ndim == 3 else sub).astype(np.int64)
            if not signed:
                p = p - (1 << (depth - 1))
            planes.append(p)
        if use_mct:
            r_, g, b_ = planes[0], planes[1], planes[2]
            planes[0] = (r_ + 2 * g + b_) >> 2
            planes[1] = b_ - g
            planes[2] = r_ - g
        return J._encode_tile(planes, tx0, ty0, tx1, ty1, levels, 2, eps_fn)

    ntx, nty = -(-W // tile_size), -(-H // tile_size)
    refs = []
    for q in range(nty):
        for p_i in range(ntx):
            tx0, ty0 = p_i * tile_size, q * tile_size
            tx1, ty1 = min(tx0 + tile_size, W), min(ty0 + tile_size, H)
            sub = a[ty0:ty1, tx0:tx1]
            refs.append(encode_tile_task.remote(sub, tx0, ty0, tx1, ty1))
    bodies = ray.get(refs)
    # main header assembled driver-side (same parameters the per-tile
    # tasks used), then per-tile SOT segments spliced in tile order
    import struct as _s

    out = bytearray(b"\xffO")
    siz = _s.pack(">HHIIIIIIIIH", 38 + 3 * C, 0, W, H, 0, 0,
                  tile_size, tile_size, 0, 0, C)
    ssiz = (depth - 1) | (0x80 if signed else 0)
    for _ in range(C):
        siz += _s.pack(">BBB", ssiz, 1, 1)
    out += b"\xffQ" + siz
    use_mct = 1 if (mct and C >= 3) else 0
    out += b"\xffR" + _s.pack(">HBBHBBBBBB", 12, 0, 0, 1, use_mct,
                              levels, 4, 4, 0, 1)
    extra = 1 if use_mct else 0
    exps = [depth + extra]
    for _ in range(levels):
        exps += [depth + extra + 1, depth + extra + 1, depth + extra + 2]
    out += b"\xff\x5c" + _s.pack(">HB", 3 + len(exps), 2 << 5) + \
        bytes(e << 3 for e in exps)
    for isot, body in enumerate(bodies):
        psot = 12 + 2 + len(body)
        out += b"\xff\x90" + _s.pack(">HHIBB", 10, isot, psot, 0, 1)
        out += b"\xff\x93" + body
    out += b"\xff\xd9"
    cs = bytes(out)
    # minimal container
    def box(btype, payload):
        return _s.pack(">I", 8 + len(payload)) + btype + payload
    bpc = (depth - 1) | (0x80 if signed else 0)
    data = (box(b"jP  ", b"\r\n\x87\n")
            + box(b"ftyp", b"jp2 " + _s.pack(">I", 0) + b"jp2 ")
            + box(b"jp2h", box(b"ihdr", _s.pack(">IIHBBBB", H, W, C, bpc,
                                                7, 0, 0))
                  + box(b"colr", _s.pack(">BBBI", 1, 0, 0,
                                         16 if C >= 3 else 17)))
            + box(b"jp2c", cs))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def decode_jp2_parallel(path: str, *, batch_cblocks: int = 64):
    """Whole-image decode with tier-1 fanned out over Ray — the
    single-tile giant-image case (e.g. a 10980x10980 Sentinel-2 band is
    ONE tile, so read_jp2's per-tile fan-out degenerates to one task).
    Packet parsing (cheap, serial by spec) runs driver-side; the
    independent code-blocks — where ~95% of decode time goes — are
    decoded in Ray tasks of `batch_cblocks` each; band assembly and the
    vectorized inverse DWT run driver-side."""
    import ray

    from gdal_ray.codecs.j2k import _decode_cblock, decode_jp2_bytes

    @ray.remote
    def t1_batch(jobs):
        return [_decode_cblock(*j) for j in jobs]

    def executor(jobs):
        if len(jobs) < 2 * batch_cblocks:
            return [_decode_cblock(*j) for j in jobs]
        refs = [t1_batch.remote(jobs[i:i + batch_cblocks])
                for i in range(0, len(jobs), batch_cblocks)]
        out = []
        for r in ray.get(refs):
            out.extend(r)
        return out

    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"\xffO":
        from gdal_ray.codecs.j2k import decode_j2k

        return decode_j2k(buf, cblock_executor=executor)
    return decode_jp2_bytes_parallel(buf, executor)


def decode_jp2_bytes_parallel(buf: bytes, executor):
    """Container-aware variant of decode_jp2_parallel's core."""
    import struct as _s

    from gdal_ray.codecs.j2k import decode_j2k

    off, end = 0, len(buf)
    while off + 8 <= end:
        ln = _s.unpack_from(">I", buf, off)[0]
        btype = buf[off + 4:off + 8]
        hdr = 8
        if ln == 1:
            ln = _s.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif ln == 0:
            ln = end - off
        if btype == b"jp2c":
            return decode_j2k(buf[off + hdr:off + ln],
                              cblock_executor=executor)
        off += ln
    raise ValueError("JP2: no contiguous codestream (jp2c) box")
