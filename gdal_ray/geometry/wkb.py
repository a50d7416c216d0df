"""Minimal WKB (ISO well-known binary) codec, little-endian, pure stdlib+numpy.

Covers Point(1), LineString(2), Polygon(3), MultiPoint(4), MultiLineString(5),
MultiPolygon(6) in 2-D — the subset the engine's vector columns use.  Format
per the reference's codec ``ogr/ogr_wkb.cpp`` (standard OGC WKB): byte order
flag, uint32 geometry type, then counts + float64 coordinates.
"""

from __future__ import annotations

import struct
from enum import IntEnum

import numpy as np


class GeomType(IntEnum):
    POINT = 1
    LINESTRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, GeomType.POINT, x, y)


def _encode_ring(ring: np.ndarray) -> bytes:
    """ring: (n, 2) float64; closed or open (auto-closes)."""
    ring = np.asarray(ring, dtype=np.float64)
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    return struct.pack("<I", len(ring)) + ring.astype("<f8").tobytes()


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """rings[0] = exterior, rest = holes; each (n,2) float64."""
    body = struct.pack("<BII", 1, GeomType.POLYGON, len(rings))
    return body + b"".join(_encode_ring(r) for r in rings)


def encode_multipolygon(polygons: list[list[np.ndarray]]) -> bytes:
    body = struct.pack("<BII", 1, GeomType.MULTIPOLYGON, len(polygons))
    return body + b"".join(encode_polygon(p) for p in polygons)


def encode_linestring(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype=np.float64)
    return (struct.pack("<BII", 1, GeomType.LINESTRING, len(pts))
            + pts.astype("<f8").tobytes())


def encode_multipoint(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype=np.float64)
    body = struct.pack("<BII", 1, GeomType.MULTIPOINT, len(pts))
    return body + b"".join(encode_point(x, y) for x, y in pts)


def encode_multilinestring(lines: list[np.ndarray]) -> bytes:
    body = struct.pack("<BII", 1, GeomType.MULTILINESTRING, len(lines))
    return body + b"".join(encode_linestring(l) for l in lines)


def _read_u32(buf: memoryview, off: int, bo: str) -> tuple[int, int]:
    return struct.unpack_from(bo + "I", buf, off)[0], off + 4


def _decode_geom(buf: memoryview, off: int):
    byte_order = buf[off]
    bo = "<" if byte_order == 1 else ">"
    off += 1
    gtype, off = _read_u32(buf, off, bo)
    gtype = gtype & 0xFF  # strip 2.5D/SRID high bits (1000/3000 offsets not supported)
    dt = np.dtype(bo + "f8")
    if gtype == GeomType.POINT:
        xy = np.frombuffer(buf, dtype=dt, count=2, offset=off)
        return (GeomType.POINT, xy.astype(np.float64)), off + 16
    if gtype == GeomType.LINESTRING:
        n, off = _read_u32(buf, off, bo)
        pts = np.frombuffer(buf, dtype=dt, count=2 * n, offset=off).reshape(n, 2)
        return (GeomType.LINESTRING, pts.astype(np.float64)), off + 16 * n
    if gtype == GeomType.POLYGON:
        nrings, off = _read_u32(buf, off, bo)
        rings = []
        for _ in range(nrings):
            n, off = _read_u32(buf, off, bo)
            pts = np.frombuffer(buf, dtype=dt, count=2 * n, offset=off).reshape(n, 2)
            rings.append(pts.astype(np.float64))
            off += 16 * n
        return (GeomType.POLYGON, rings), off
    if gtype in (GeomType.MULTIPOINT, GeomType.MULTILINESTRING, GeomType.MULTIPOLYGON):
        nparts, off = _read_u32(buf, off, bo)
        parts = []
        for _ in range(nparts):
            part, off = _decode_geom(buf, off)
            parts.append(part)
        return (GeomType(gtype), parts), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def decode_wkb(wkb: bytes):
    """-> (GeomType, payload).  Polygon payload = list of (n,2) rings;
    multi* payload = list of decoded parts."""
    geom, _ = _decode_geom(memoryview(wkb), 0)
    return geom


def polygon_parts(wkb: bytes) -> list[list[np.ndarray]]:
    """Structured rings of a (Multi)Polygon: one list of rings per part,
    rings[0] of each part is the exterior, the rest are holes."""
    gtype, payload = decode_wkb(wkb)
    if gtype == GeomType.POLYGON:
        return [payload]
    if gtype == GeomType.MULTIPOLYGON:
        return [prings for ptype, prings in payload]
    raise ValueError(f"expected (Multi)Polygon, got {gtype}")


def polygon_rings(wkb: bytes) -> list[np.ndarray]:
    """All rings of a Polygon or MultiPolygon as a flat list of (n,2) arrays.

    For even-odd point-in-polygon, holes and multiple parts are just more
    rings — crossing parity over all rings gives the correct result
    (same even-odd rule as the reference scanline fill, alg/llrasterize.cpp).
    """
    gtype, payload = decode_wkb(wkb)
    if gtype == GeomType.POLYGON:
        return payload
    if gtype == GeomType.MULTIPOLYGON:
        rings: list[np.ndarray] = []
        for ptype, prings in payload:
            if ptype != GeomType.POLYGON:
                raise ValueError("MultiPolygon part is not a Polygon")
            rings.extend(prings)
        return rings
    raise ValueError(f"expected (Multi)Polygon, got {gtype}")
