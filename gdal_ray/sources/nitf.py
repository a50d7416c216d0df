"""NITF 2.1 driver (MIL-STD-2500C) — uncompressed (IC=NC) image segments.

The reference's NITF driver (frmts/nitf/nitffile.c NITFCreate — the field
offsets/widths below mirror its PLACE/OVR table, which is the published
MIL-STD-2500C layout; frmts/nitf/nitfimage.c for the IMODE B/P/S block
layouts).  Wire facts: every header field is fixed-width ASCII; the file
header carries per-segment subheader/data lengths (LISH/LI) so segment
data offsets are computable without touching the segments; image data is
big-endian, laid out as a grid of NBPR×NBPC constant-size blocks
(NPPBH×NPPBV pixels, edge blocks zero-padded) in one of three interleave
modes:

  IMODE B — band-interleaved by block (each block: band planes in order)
  IMODE P — pixel-interleaved within block
  IMODE S — band-sequential (all blocks of band 1, then band 2, ...)

Scale shape: `nitf_meta` parses the headers driver-side (a few KB);
`read_nitf` fans one Ray task out per block row with exact byte ranges —
the established gtiff_reader/dted pattern.  Writer emits NITF02.10,
single or multiple image segments, IC=NC, ICORDS=' ' or 'D' (decimal
degrees IGEOLO, 3-decimal quantization per the spec field width).

Gates (loud): NITF 2.0 (different security field layout), compressed IC
codes, NBANDS>9, LUTs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_SECURITY_LEN = 167  # FSCLAS..FSCTLN (2500C table A-1); same block per image

# dtype -> (PVTYPE, bits)
_PVT = {
    np.dtype(np.uint8): ("INT", 8),
    np.dtype(np.uint16): ("INT", 16),
    np.dtype(np.uint32): ("INT", 32),
    np.dtype(np.int16): ("SI", 16),
    np.dtype(np.int32): ("SI", 32),
    np.dtype(np.float32): ("R", 32),
    np.dtype(np.float64): ("R", 64),
}
_DT = {("INT", 8): ">u1", ("INT", 16): ">u2", ("INT", 32): ">u4",
       ("SI", 16): ">i2", ("SI", 32): ">i4",
       ("R", 32): ">f4", ("R", 64): ">f8"}


def _f(text: str, width: int) -> bytes:
    """Fixed-width ASCII field, left-justified space-padded (BCS-A)."""
    b = text.encode("ascii")
    if len(b) > width:
        raise ValueError(f"field {text!r} exceeds width {width}")
    return b.ljust(width)


def _n(value: int, width: int) -> bytes:
    """Fixed-width zero-padded numeric field."""
    s = f"{value:0{width}d}".encode()
    if len(s) > width:
        raise ValueError(f"numeric {value} exceeds width {width}")
    return s


def _security(clas: str = "U") -> bytes:
    return _f(clas, 1) + b" " * (_SECURITY_LEN - 1)


def _igeolo_d(gt: tuple, w: int, h: int) -> bytes:
    """ICORDS='D' IGEOLO: UL,UR,LR,LL corner (lat,lon) as ±dd.ddd±ddd.ddd
    (the 60-char field quantizes to 3 decimals — callers needing exact
    georef round their geotransform accordingly)."""
    def corner(px, py):
        x = gt[0] + px * gt[1] + py * gt[2]
        y = gt[3] + px * gt[4] + py * gt[5]
        return f"{y:+07.3f}{x:+08.3f}"

    s = corner(0, 0) + corner(w, 0) + corner(w, h) + corner(0, h)
    return _f(s, 60)


def _parse_igeolo_d(field: str, w: int, h: int):
    """Inverse of _igeolo_d for north-up images -> 6-term geotransform."""
    c = [(float(field[i * 15:i * 15 + 7]), float(field[i * 15 + 7:i * 15 + 15]))
         for i in range(4)]  # (lat, lon) UL UR LR LL
    ulx, uly = c[0][1], c[0][0]
    return (ulx, (c[1][1] - ulx) / w, 0.0, uly, 0.0, (c[3][0] - uly) / h)


def _blockize(a: np.ndarray, nppbv: int, nppbh: int) -> np.ndarray:
    """(h, w, bands) -> (nbpc, nbpr, nppbv, nppbh, bands), edge-padded."""
    h, w, bands = a.shape
    nbpc = -(-h // nppbv)
    nbpr = -(-w // nppbh)
    pad = np.zeros((nbpc * nppbv, nbpr * nppbh, bands), dtype=a.dtype)
    pad[:h, :w] = a
    return (pad.reshape(nbpc, nppbv, nbpr, nppbh, bands)
               .transpose(0, 2, 1, 3, 4))


def encode_nitf(
    arrs,
    *,
    block_size: int | None = None,
    imode: str = "B",
    geotransform: tuple | None = None,
    ostaid: str = "GRAFT",
    iid1: str = "Missing",
    icat: str = "VIS",
) -> bytes:
    """One NITF 2.1 file, IC=NC.  arrs: one (h,w[,bands]) array or a list
    (one image segment each, same options applied to all)."""
    if not isinstance(arrs, (list, tuple)):
        arrs = [arrs]
    arrs = [a[:, :, None] if a.ndim == 2 else a for a in arrs]
    if imode not in ("B", "P", "S"):
        raise NotImplementedError(f"IMODE {imode!r} (B/P/S supported)")

    subheaders, datas = [], []
    for a in arrs:
        h, w, bands = a.shape
        if bands > 9:
            raise NotImplementedError("NBANDS > 9 (XBANDS) not supported")
        if a.dtype not in _PVT:
            raise NotImplementedError(f"dtype {a.dtype} not supported")
        pvtype, bits = _PVT[a.dtype]
        bs = block_size or 1024
        nppbh, nppbv = min(w, bs), min(h, bs)
        blocks = _blockize(a, nppbv, nppbh)
        nbpc, nbpr = blocks.shape[0], blocks.shape[1]
        be = blocks.astype(_DT[(pvtype, bits)])
        if imode == "B":      # per block: band planes in order
            data = be.transpose(0, 1, 4, 2, 3).tobytes()
        elif imode == "P":    # per block: pixel-interleaved
            data = be.tobytes()
        else:                 # S: all blocks of band 1, then band 2, ...
            data = be.transpose(4, 0, 1, 2, 3).tobytes()

        irep = ("MONO" if bands == 1 else
                "RGB" if bands == 3 and a.dtype == np.uint8 else "MULTI")
        repband = (["M"] if bands == 1 else ["R", "G", "B"]
                   if irep == "RGB" else ["M"] * bands)
        sh = bytearray()
        sh += _f("IM", 2) + _f(iid1, 10) + _f("20021216151629", 14)
        sh += _f("", 17) + _f("", 80)                      # TGTID, IID2
        sh += _security() + _f("0", 1) + _f("Unknown", 42)  # ENCRYP, ISORCE
        sh += _n(h, 8) + _n(w, 8) + _f(pvtype, 3) + _f(irep, 8)
        sh += _f(icat, 8) + _n(bits, 2) + _f("R", 1)        # ABPP, PJUST
        if geotransform is not None:
            sh += _f("D", 1) + _igeolo_d(geotransform, w, h)
        else:
            sh += _f(" ", 1)
        sh += _f("0", 1)                                    # NICOM
        sh += _f("NC", 2) + _n(bands, 1)                    # IC, NBANDS
        for rb in repband:
            sh += _f(rb, 2) + _f("", 6) + _f("N", 1) + _f("", 3) + _f("0", 1)
        sh += _f("0", 1) + _f(imode, 1)                     # ISYNC, IMODE
        sh += _n(nbpr, 4) + _n(nbpc, 4) + _n(nppbh, 4) + _n(nppbv, 4)
        sh += _n(bits, 2) + _n(1, 3) + _n(0, 3)             # NBPP IDLVL IALVL
        sh += _n(0, 5) + _n(0, 5) + _f("1.0 ", 4)           # ILOC, IMAG
        sh += _n(0, 5) + _n(0, 5)                           # UDIDL, IXSHDL
        subheaders.append(bytes(sh))
        datas.append(data)

    n = len(arrs)
    hl = 388 + 16 * n
    fl = hl + sum(len(s) + len(d) for s, d in zip(subheaders, datas))
    hdr = bytearray()
    hdr += _f("NITF02.10", 9) + _f("03", 2) + _f("BF01", 4)
    hdr += _f(ostaid, 10) + _f("20021216151629", 14) + _f("", 80)
    hdr += _security() + _n(0, 5) + _n(0, 5) + _f("0", 1)  # FSCOP FSCPYS ENCRYP
    hdr += bytes(3)                                        # FBKGC (binary)
    hdr += _f("", 24) + _f("", 18)                         # ONAME, OPHONE
    hdr += _n(fl, 12) + _n(hl, 6) + _n(n, 3)
    for s, d in zip(subheaders, datas):
        hdr += _n(len(s), 6) + _n(len(d), 10)              # LISH, LI
    hdr += _n(0, 3) + _n(0, 3) + _n(0, 3) + _n(0, 3) + _n(0, 3)  # NUMS..NUMRES
    hdr += _n(0, 5) + _n(0, 5)                             # UDHDL, XHDL
    assert len(hdr) == hl
    return bytes(hdr) + b"".join(s + d for s, d in zip(subheaders, datas))


def write_nitf(path: str, arrs, **kw) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(encode_nitf(arrs, **kw))
    os.replace(tmp, path)


# ------------------------------------------------------------------ read


def nitf_meta(path: str) -> dict:
    """Parse the file header + every image subheader (driver-side, a few
    KB of reads) -> {"version", "ostaid", "images": [per-segment dict]}."""
    with open(path, "rb") as fh:
        head = fh.read(9).decode("ascii", "replace")
        if head == "NITF02.00":
            raise NotImplementedError(
                "NITF 2.0 (different security field layout) not supported")
        if head not in ("NITF02.10", "NSIF01.00"):
            raise ValueError(f"not a NITF 2.1 file: {head!r}")
        fh.seek(354)
        hl = int(fh.read(6))
        numi = int(fh.read(3))
        seglens = [(int(fh.read(6)), int(fh.read(10))) for _ in range(numi)]
        fh.seek(15)
        ostaid = fh.read(10).decode().strip()

        images, off = [], hl
        for lish, li in seglens:
            fh.seek(off)
            sh = fh.read(lish)
            images.append(_parse_image_subheader(sh, off, li))
            off += lish + li
    out = {"version": head, "ostaid": ostaid, "header_len": hl,
           "driver": "NITF", "images": images}
    if images:  # top-level mirrors of segment 0 for the info door
        for k in ("width", "height", "bands", "dtype", "geotransform"):
            out[k] = images[0][k]
    return out


def _parse_image_subheader(sh: bytes, seg_off: int, li: int) -> dict:
    if sh[:2] != b"IM":
        raise ValueError("image subheader does not start with IM")
    m = {"iid1": sh[2:12].decode().strip()}
    m["height"] = int(sh[333:341])
    m["width"] = int(sh[341:349])
    pvtype = sh[349:352].decode().strip()
    m["irep"] = sh[352:360].decode().strip()
    icords = sh[371:372].decode()
    pos = 372
    m["geotransform"] = None
    if icords != " ":
        igeolo = sh[pos:pos + 60].decode()
        pos += 60
        if icords == "D":
            m["geotransform"] = _parse_igeolo_d(igeolo, m["width"], m["height"])
        # G/S/U/P geodetic-seconds/UTM/MGRS forms: parsed lazily if needed
    nicom = int(sh[pos:pos + 1]); pos += 1 + 80 * nicom
    ic = sh[pos:pos + 2].decode(); pos += 2
    if ic not in ("NC", "NM", "C8"):
        raise NotImplementedError(f"compressed NITF (IC={ic}) not supported")
    if ic == "NM":
        raise NotImplementedError("IC=NM (masked blocks) not supported")
    m["ic"] = ic
    if ic not in ("NC", "NM"):
        m["comrat"] = sh[pos:pos + 4].decode().strip()  # COMRAT present
        pos += 4
    nbands = int(sh[pos:pos + 1]); pos += 1
    if nbands == 0:
        raise NotImplementedError("XBANDS (NBANDS > 9) not supported")
    m["bands"] = nbands
    for _ in range(nbands):
        nluts = int(sh[pos + 12:pos + 13])
        if nluts:
            raise NotImplementedError("band LUTs not supported")
        pos += 13
    m["imode"] = sh[pos + 1:pos + 2].decode()
    m["nbpr"] = int(sh[pos + 2:pos + 6])
    m["nbpc"] = int(sh[pos + 6:pos + 10])
    m["nppbh"] = int(sh[pos + 10:pos + 14])
    m["nppbv"] = int(sh[pos + 14:pos + 18])
    nbpp = int(sh[pos + 18:pos + 20])
    if (pvtype, nbpp) not in _DT:
        raise NotImplementedError(f"PVTYPE={pvtype} NBPP={nbpp}")
    m["dtype"] = np.dtype(_DT[(pvtype, nbpp)]).newbyteorder("=").name
    m["wire_dtype"] = _DT[(pvtype, nbpp)]
    m["data_offset"] = seg_off + len(sh)
    m["data_len"] = li
    return m


def _block_range(m: dict, brow: int, bcol: int, band: int | None):
    """(offset, nbytes) of one block's bytes for IMODE B/P (band=None:
    whole block) or one band-plane for IMODE S."""
    bpp = np.dtype(m["wire_dtype"]).itemsize
    plane = m["nppbh"] * m["nppbv"] * bpp
    blk_full = plane * m["bands"]
    k = brow * m["nbpr"] + bcol
    if m["imode"] in ("B", "P"):
        return m["data_offset"] + k * blk_full, blk_full
    # S: band-sequential
    nblocks = m["nbpr"] * m["nbpc"]
    return m["data_offset"] + (band * nblocks + k) * plane, plane


def _decode_block(raw: bytes, m: dict) -> np.ndarray:
    """One IMODE B/P block -> (nppbv, nppbh, bands) native-endian."""
    dt = np.dtype(m["wire_dtype"])
    v, hh, bands = m["nppbv"], m["nppbh"], m["bands"]
    a = np.frombuffer(raw, dtype=dt)
    if m["imode"] == "B":
        a = a.reshape(bands, v, hh).transpose(1, 2, 0)
    else:  # P
        a = a.reshape(v, hh, bands)
    return np.ascontiguousarray(a.astype(dt.newbyteorder("=")))


def read_nitf_array(path: str, segment: int = 0) -> np.ndarray:
    """Full decode of one image segment -> (h, w, bands) (tests/info)."""
    m = nitf_meta(path)["images"][segment]
    if m.get("ic") == "C8":
        # JPEG 2000 codestream fills the segment data (frmts/nitf +
        # jp2openjpeg interop path); decode via the from-spec EBCOT codec
        from gdal_ray.codecs.j2k import decode_j2k

        with open(path, "rb") as fh:
            fh.seek(m["data_offset"])
            arr = decode_j2k(fh.read(m["data_len"]))
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr[:m["height"], :m["width"]]
    v, hh, bands = m["nppbv"], m["nppbh"], m["bands"]
    dt = np.dtype(m["wire_dtype"])
    out = np.zeros((m["nbpc"] * v, m["nbpr"] * hh, bands),
                   dtype=dt.newbyteorder("="))
    with open(path, "rb") as fh:
        for br in range(m["nbpc"]):
            for bc in range(m["nbpr"]):
                if m["imode"] in ("B", "P"):
                    off, nb = _block_range(m, br, bc, None)
                    fh.seek(off)
                    blk = _decode_block(fh.read(nb), m)
                else:
                    blk = np.empty((v, hh, bands), dtype=dt.newbyteorder("="))
                    for b in range(bands):
                        off, nb = _block_range(m, br, bc, b)
                        fh.seek(off)
                        blk[:, :, b] = np.frombuffer(
                            fh.read(nb), dtype=dt).reshape(v, hh)
                out[br * v:(br + 1) * v, bc * hh:(bc + 1) * hh] = blk
    return out[:m["height"], :m["width"]]


def read_nitf(path: str, *, segment: int = 0, rows_per_task: int = 1):
    """-> ray.data.Dataset, one row per block: (block_row, block_col,
    y0, x0, h, w, data: binary native-endian pixel-interleaved, edge
    blocks cropped).  Header parses driver-side; each Ray task range-reads
    only its blocks (the gtiff_reader pattern)."""
    import ray.data as rd

    m = nitf_meta(path)["images"][segment]
    if m.get("ic") == "C8":
        # JPEG 2000 codestream fills the whole segment: one task decodes
        # it via the from-spec EBCOT codec and emits strip rows matching
        # the block-row contract (the codestream is not range-readable
        # per NITF block, so the parallel unit is the J2K decode itself).
        def load_c8(t: pa.Table, _m=m) -> pa.Table:
            from gdal_ray.codecs.j2k import decode_j2k

            with open(path, "rb") as fh:
                fh.seek(_m["data_offset"])
                arr = decode_j2k(fh.read(_m["data_len"]))
            if arr.ndim == 2:
                arr = arr[:, :, None]
            arr = arr[:_m["height"], :_m["width"]]
            sv = _m["nppbv"]
            rows = {k: [] for k in ("block_row", "block_col", "y0", "x0",
                                    "h", "w", "data")}
            for br in range(_m["nbpc"]):
                y0 = br * sv
                ch = min(sv, _m["height"] - y0)
                if ch <= 0:
                    continue
                rows["block_row"].append(br)
                rows["block_col"].append(0)
                rows["y0"].append(y0)
                rows["x0"].append(0)
                rows["h"].append(ch)
                rows["w"].append(_m["width"])
                rows["data"].append(
                    np.ascontiguousarray(arr[y0:y0 + ch]).tobytes())
            return pa.table({k: pa.array(vv, pa.binary() if k == "data"
                                         else pa.int64())
                             for k, vv in rows.items()})

        return rd.from_items([{"seg": segment}]).map_batches(
            load_c8, batch_format="pyarrow")
    items = [{"brow": r} for r in range(0, m["nbpc"], rows_per_task)]
    v, hh = m["nppbv"], m["nppbh"]

    def load(t: pa.Table, _m=m) -> pa.Table:
        rows = {k: [] for k in ("block_row", "block_col", "y0", "x0",
                                "h", "w", "data")}
        dt = np.dtype(_m["wire_dtype"])
        with open(path, "rb") as fh:
            for it in t.to_pylist():
                for br in range(it["brow"],
                                min(it["brow"] + rows_per_task, _m["nbpc"])):
                    for bc in range(_m["nbpr"]):
                        if _m["imode"] in ("B", "P"):
                            off, nb = _block_range(_m, br, bc, None)
                            fh.seek(off)
                            blk = _decode_block(fh.read(nb), _m)
                        else:
                            blk = np.empty((v, hh, _m["bands"]),
                                           dtype=dt.newbyteorder("="))
                            for b in range(_m["bands"]):
                                off, nb = _block_range(_m, br, bc, b)
                                fh.seek(off)
                                blk[:, :, b] = np.frombuffer(
                                    fh.read(nb), dtype=dt).reshape(v, hh)
                        y0, x0 = br * v, bc * hh
                        ch = min(v, _m["height"] - y0)
                        cw = min(hh, _m["width"] - x0)
                        rows["block_row"].append(br)
                        rows["block_col"].append(bc)
                        rows["y0"].append(y0)
                        rows["x0"].append(x0)
                        rows["h"].append(ch)
                        rows["w"].append(cw)
                        rows["data"].append(
                            np.ascontiguousarray(blk[:ch, :cw]).tobytes())
        return pa.table({k: pa.array(vv, pa.binary() if k == "data"
                                     else pa.int64())
                         for k, vv in rows.items()})

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")
