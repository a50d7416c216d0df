"""EXIF APP1 segment: build + parse, from the public Exif 2.3 / TIFF 6.0
specifications (a TIFF IFD embedded in a JPEG APP1 marker after the
"Exif\\0\\0" signature).

Reference semantics: the reference reads the same structure via
frmts/jpeg (exif.cpp EXIFExtractMetadata) into EXIF_* metadata keys and
GPS coordinates; this module implements the wire format directly —
little-endian IFDs, SHORT/LONG/ASCII/RATIONAL field types, out-of-line
value areas, and the GPS sub-IFD (tags 0x0001-0x0004: hemisphere refs +
degree/minute/second RATIONAL triplets).

Why it matters at 100 TB: a real image crawl carries provenance in EXIF
— capture time, orientation, and GPS position — and the geo pipeline's
cell assignment (XYZ/S2) starts from exactly these fields when imagery
is not already georeferenced.  Parsing is header-only (the APP1 segment
is within the first few KB), so the distributed shape is a plain
map_batches over bytes with no decode.
"""

from __future__ import annotations

import struct

import numpy as np

SOI = b"\xff\xd8"
_EXIF_SIG = b"Exif\x00\x00"

# field type → (struct code, size)
_TYPES = {1: ("B", 1), 2: ("s", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8)}


def _entry(tag: int, ftype: int, count: int, value: bytes,
           data_area: bytearray, data_base: int) -> bytes:
    """One 12-byte IFD entry; values >4 bytes go to the data area."""
    if len(value) <= 4:
        return struct.pack("<HHI", tag, ftype, count) + value.ljust(4, b"\0")
    off = data_base + len(data_area)
    data_area.extend(value)
    if len(data_area) % 2:
        data_area.extend(b"\0")
    return struct.pack("<HHI", tag, ftype, count) + struct.pack("<I", off)


def _rational3(d: int, m: int, s_num: int, s_den: int) -> bytes:
    return struct.pack("<IIIIII", d, 1, m, 1, s_num, s_den)


def build_exif_app1(*, orientation: int = 1, datetime: str | None = None,
                    lat_dms: tuple[int, int, int, int] | None = None,
                    lon_dms: tuple[int, int, int, int] | None = None,
                    lat_ref: str = "N", lon_ref: str = "E") -> bytes:
    """APP1 marker segment bytes (FFE1 + length + Exif TIFF block).

    lat_dms/lon_dms = (deg, min, sec_numerator, sec_denominator).
    """
    # layout: TIFF header (8) | IFD0 | [GPS IFD] | data area
    n0 = 1 + (1 if datetime else 0) + (1 if lat_dms else 0)
    ifd0_size = 2 + 12 * n0 + 4
    gps_off = 8 + ifd0_size
    n_gps = 4 if lat_dms else 0
    gps_size = (2 + 12 * n_gps + 4) if lat_dms else 0
    data_base = gps_off + gps_size
    data = bytearray()

    entries0 = [_entry(0x0112, 3, 1, struct.pack("<H", orientation),
                       data, data_base)]
    if datetime:
        dt = datetime.encode().ljust(19, b"\0")[:19] + b"\0"
        entries0.append(_entry(0x0132, 2, 20, dt, data, data_base))
    if lat_dms:
        entries0.append(_entry(0x8825, 4, 1, struct.pack("<I", gps_off),
                               data, data_base))
    entries0.sort(key=lambda e: struct.unpack_from("<H", e)[0])
    ifd0 = (struct.pack("<H", len(entries0)) + b"".join(entries0)
            + struct.pack("<I", 0))

    gps = b""
    if lat_dms:
        ge = [
            _entry(0x0001, 2, 2, lat_ref.encode() + b"\0", data, data_base),
            _entry(0x0002, 5, 3, _rational3(*lat_dms), data, data_base),
            _entry(0x0003, 2, 2, lon_ref.encode() + b"\0", data, data_base),
            _entry(0x0004, 5, 3, _rational3(*lon_dms), data, data_base),
        ]
        gps = (struct.pack("<H", len(ge)) + b"".join(ge)
               + struct.pack("<I", 0))

    tiff = b"II*\x00" + struct.pack("<I", 8) + ifd0 + gps + bytes(data)
    body = _EXIF_SIG + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def inject_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment immediately after SOI."""
    if jpeg[:2] != SOI:
        raise ValueError("not a JPEG (no SOI)")
    return SOI + app1 + jpeg[2:]


def _parse_ifd(tiff: bytes, off: int, bo: str) -> dict[int, object]:
    out: dict[int, object] = {}
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    for i in range(n):
        e = off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(bo + "HHI", tiff, e)
        if ftype not in _TYPES:
            continue
        code, sz = _TYPES[ftype]
        nbytes = sz * count * (2 if ftype == 5 else 1)
        if nbytes <= 4:
            voff = e + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", tiff, e + 8)
        if ftype == 2:
            raw = tiff[voff:voff + count]
            out[tag] = raw.split(b"\0", 1)[0].decode("ascii", "replace")
        elif ftype == 5:
            vals = struct.unpack_from(bo + "II" * count, tiff, voff)
            out[tag] = [(vals[2 * k], vals[2 * k + 1]) for k in range(count)]
        else:
            out[tag] = list(struct.unpack_from(bo + code * count, tiff, voff))
    return out


def parse_exif(jpeg: bytes) -> dict:
    """Extract orientation / datetime / GPS from a JPEG's APP1 segment.

    Returns {} when no EXIF is present.  GPS is returned both as raw
    rationals and as signed decimal degrees computed in the documented
    IEEE order: (D + M/60.0) + (S_num/S_den)/3600.0, negated for S/W."""
    pos = 2
    tiff = None
    while pos + 4 <= len(jpeg) and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == _EXIF_SIG:
            tiff = jpeg[pos + 10:pos + 2 + seglen]
            break
        if marker == 0xDA:      # SOS — entropy data follows, stop scanning
            break
        pos += 2 + seglen
    if tiff is None:
        return {}
    bo = "<" if tiff[:2] == b"II" else ">"
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    ifd0 = _parse_ifd(tiff, ifd0_off, bo)
    out: dict = {}
    if 0x0112 in ifd0:
        out["orientation"] = int(ifd0[0x0112][0])
    if 0x0132 in ifd0:
        out["datetime"] = ifd0[0x0132]
    if 0x8825 in ifd0:
        gps = _parse_ifd(tiff, int(ifd0[0x8825][0]), bo)
        out["gps"] = gps
        if 0x0002 in gps and 0x0004 in gps:
            def _deg(r3, ref, neg):
                (d, dd), (m, md), (s, sd) = r3
                val = (d / dd + (m / md) / 60.0) + (s / sd) / 3600.0
                return -val if ref in neg else val
            out["lat"] = _deg(gps[0x0002], gps.get(0x0001, "N"), ("S",))
            out["lon"] = _deg(gps[0x0004], gps.get(0x0003, "E"), ("W",))
    return out


def apply_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Normalize pixels to orientation 1 (the Exif 2.3 §4.6.4 table —
    same mapping the reference applies via EXIF_Orientation metadata):

      1 identity                 5 transpose (flip over main diagonal)
      2 mirror horizontal        6 rotate 90° CW
      3 rotate 180°              7 transverse (flip over anti-diagonal)
      4 mirror vertical          8 rotate 90° CCW
    """
    if orientation in (1, 0):
        return img
    if orientation == 2:
        return img[:, ::-1]
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return img[::-1, :]
    if orientation == 5:
        return np.swapaxes(img, 0, 1)
    if orientation == 6:
        return np.swapaxes(img, 0, 1)[:, ::-1]
    if orientation == 7:
        return np.swapaxes(img, 0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.swapaxes(img, 0, 1)[::-1, :]
    raise ValueError(f"EXIF orientation {orientation} out of range 1-8")
