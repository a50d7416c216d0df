"""JPEG 2000 structural driver — JP2 container boxes (ISO/IEC 15444-1
Annex I) + codestream main-header markers (Annex A), the identify/info
surface of the reference's frmts/jp2openjpeg/jp2openjpegdataset.cpp.

What is REAL here: box walk (incl. XLBox long lengths), jp2h/ihdr image
header, colr colour specification, the full main-header marker walk
(SIZ/COD/QCD/COM), and the tile-part index from SOT markers — the layout
a distributed reader needs to range-read one tile-part per Ray task,
exactly the gtiff_reader shape (driver parses only headers; tasks seek).

What is GATED: entropy decode.  JPEG 2000 payload decode is EBCOT
(arithmetic-coded code blocks, Annex C/D) — out of scope for this
engine; ``decode_jp2`` raises loudly rather than pretending.  Raster
archives in JP2 (Sentinel-2, NITF-embedded) therefore identify and
index, and their metadata joins pipelines; pixels need a real codec.
"""

from __future__ import annotations

import os
import struct

_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"

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
            elif btype == b"jp2c":
                cs = _parse_codestream(buf, boff, boff + blen)
        if cs is None:
            raise ValueError("JP2: no contiguous codestream (jp2c) box")
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
    """GATE: EBCOT entropy decode (ISO 15444-1 Annex C/D arithmetic-coded
    code blocks) is not implemented — JP2 files identify and index
    (jp2_info) but cannot decode to pixels in this engine."""
    raise NotImplementedError(
        "JPEG 2000 EBCOT decode not implemented; jp2_info() provides "
        "identification, geometry and the tile-part range-read index")
