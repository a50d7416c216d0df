"""Minimal WKB (ISO well-known binary) codec, little-endian, pure stdlib+numpy.

Covers Point(1), LineString(2), Polygon(3), MultiPoint(4), MultiLineString(5),
MultiPolygon(6), and — round 5 — the curve types CircularString(8),
CompoundCurve(9), CurvePolygon(10), MultiCurve(11), MultiSurface(12),
which decode by LINEARIZATION into the linear machinery exactly as the
reference's OGRGeometry::getLinearGeometry does (ogr/ogrgeometryfactory
.cpp curveToLineString, default max angle step 4° = OGR_ARC_STEPSIZE).
Z/M flags (ISO +1000/+2000/+3000 offsets and EWKB high bits) and the
EWKB SRID word are accepted on decode; Z/M ordinates are dropped.
Format per the reference's codec ``ogr/ogr_wkb.cpp`` (standard OGC
WKB): byte order flag, uint32 geometry type, counts + float64 coords.
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
    CIRCULARSTRING = 8
    COMPOUNDCURVE = 9
    CURVEPOLYGON = 10
    MULTICURVE = 11
    MULTISURFACE = 12


ARC_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default (ogrgeometryfactory.cpp)


def _arc_points(p0, p1, p2, max_step_deg: float = ARC_STEP_DEG):
    """Linearize one circular arc through (p0, p1, p2) -> (n,2) points
    INCLUDING both endpoints, stepping <= max_step_deg along the arc
    (collinear points degrade to the straight segment), following OGR's
    curveToLineString semantics."""
    import math

    ax, ay = float(p0[0]), float(p0[1])
    bx, by = float(p1[0]), float(p1[1])
    cx, cy = float(p2[0]), float(p2[1])
    if (ax, ay) == (cx, cy):
        # full circle: p1 is the antipodal point (OGR's convention for
        # CIRCULARSTRING(p, q, p)); center is the p-q midpoint
        ux, uy = (ax + bx) / 2.0, (ay + by) / 2.0
        r = math.hypot(bx - ax, by - ay) / 2.0
        if r == 0.0:
            return np.array([[ax, ay], [cx, cy]])
        a0 = math.atan2(ay - uy, ax - ux)
        n = max(2, int(math.ceil(360.0 / max_step_deg)))
        ang = a0 + 2.0 * math.pi * np.arange(n + 1) / n
        pts = np.column_stack([ux + r * np.cos(ang), uy + r * np.sin(ang)])
        pts[0] = (ax, ay)
        pts[-1] = (cx, cy)
        return pts
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-12 * max(abs(ax) + abs(bx) + abs(cx) + 1.0, 1.0):
        return np.array([[ax, ay], [cx, cy]])  # collinear -> chord
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    a0 = math.atan2(ay - uy, ax - ux)
    a1 = math.atan2(by - uy, bx - ux)
    a2 = math.atan2(cy - uy, cx - ux)
    two_pi = 2.0 * math.pi
    # direction: sweep from a0 through a1 to a2
    ccw1 = (a1 - a0) % two_pi
    ccw2 = (a2 - a1) % two_pi
    cw1 = (a0 - a1) % two_pi
    cw2 = (a1 - a2) % two_pi
    if ccw1 + ccw2 <= cw1 + cw2:
        sweep = ccw1 + ccw2
    else:
        sweep = -(cw1 + cw2)
    r = math.hypot(ax - ux, ay - uy)
    n = max(2, int(math.ceil(abs(sweep) / math.radians(max_step_deg))))
    ang = a0 + sweep * np.arange(n + 1) / n
    pts = np.column_stack([ux + r * np.cos(ang), uy + r * np.sin(ang)])
    pts[0] = (ax, ay)
    pts[-1] = (cx, cy)
    return pts


def linearize_circularstring(pts: np.ndarray,
                             max_step_deg: float = ARC_STEP_DEG
                             ) -> np.ndarray:
    """(2k+1, 2) CircularString control points -> linearized (n,2)."""
    out = [pts[:1]]
    for i in range(0, len(pts) - 2, 2):
        out.append(_arc_points(pts[i], pts[i + 1], pts[i + 2],
                               max_step_deg)[1:])
    return np.vstack(out)


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
    raw, off = _read_u32(buf, off, bo)
    # ISO (+1000 Z / +2000 M / +3000 ZM) and EWKB (high-bit) dimension
    # flags; EWKB SRID word skipped (ogr/ogr_wkb.cpp accepts both)
    z = bool(raw & 0x80000000)
    m = bool(raw & 0x40000000)
    if raw & 0x20000000:
        off += 4  # EWKB embedded SRID
    gtype = raw & 0x0FFFFFFF
    if gtype >= 3000:
        gtype -= 3000
        z = m = True
    elif gtype >= 2000:
        gtype -= 2000
        m = True
    elif gtype >= 1000:
        gtype -= 1000
        z = True
    ndim = 2 + int(z) + int(m)
    dt = np.dtype(bo + "f8")

    def read_pts(n, off):
        pts = np.frombuffer(buf, dtype=dt, count=ndim * n,
                            offset=off).reshape(n, ndim)
        return pts[:, :2].astype(np.float64), off + 8 * ndim * n

    if gtype == GeomType.CIRCULARSTRING:
        n, off = _read_u32(buf, off, bo)
        pts, off = read_pts(n, off)
        return (GeomType.LINESTRING, linearize_circularstring(pts)), off
    if gtype == GeomType.COMPOUNDCURVE:
        nseg, off = _read_u32(buf, off, bo)
        parts = []
        for _ in range(nseg):
            (ptype, payload), off = _decode_geom(buf, off)
            if ptype != GeomType.LINESTRING:
                raise ValueError("CompoundCurve segment is not a curve")
            parts.append(payload if not parts else payload[1:])
        return (GeomType.LINESTRING,
                np.vstack(parts) if parts else np.empty((0, 2))), off
    if gtype == GeomType.CURVEPOLYGON:
        nrings, off = _read_u32(buf, off, bo)
        rings = []
        for _ in range(nrings):
            (rtype, payload), off = _decode_geom(buf, off)
            if rtype == GeomType.LINESTRING:
                rings.append(payload)
            elif rtype == GeomType.POLYGON:  # nested linear ring form
                rings.extend(payload)
            else:
                raise ValueError("CurvePolygon ring is not a curve")
        return (GeomType.POLYGON, rings), off
    if gtype in (GeomType.MULTICURVE, GeomType.MULTISURFACE):
        nparts, off = _read_u32(buf, off, bo)
        parts = []
        for _ in range(nparts):
            part, off = _decode_geom(buf, off)
            parts.append(part)
        out_t = (GeomType.MULTILINESTRING if gtype == GeomType.MULTICURVE
                 else GeomType.MULTIPOLYGON)
        return (out_t, parts), off
    if gtype == GeomType.POINT:
        xy, off = read_pts(1, off)
        return (GeomType.POINT, xy[0]), off
    if gtype == GeomType.LINESTRING:
        n, off = _read_u32(buf, off, bo)
        pts, off = read_pts(n, off)
        return (GeomType.LINESTRING, pts), off
    if gtype == GeomType.POLYGON:
        nrings, off = _read_u32(buf, off, bo)
        rings = []
        for _ in range(nrings):
            n, off = _read_u32(buf, off, bo)
            pts, off = read_pts(n, off)
            rings.append(pts)
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
    if gtype == GeomType.POLYGON:  # includes linearized CurvePolygon
        return [payload]
    if gtype == GeomType.MULTIPOLYGON:  # includes linearized MultiSurface
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


def encode_circularstring(pts: np.ndarray) -> bytes:
    body = struct.pack("<BII", 1, GeomType.CIRCULARSTRING, len(pts))
    return body + np.ascontiguousarray(pts, dtype="<f8").tobytes()


def encode_compoundcurve(segments: list[bytes]) -> bytes:
    """segments: encoded LINESTRING / CIRCULARSTRING WKBs sharing
    endpoints."""
    body = struct.pack("<BII", 1, GeomType.COMPOUNDCURVE, len(segments))
    return body + b"".join(segments)


def encode_curvepolygon(rings: list[bytes]) -> bytes:
    """rings: encoded LINESTRING / CIRCULARSTRING / COMPOUNDCURVE ring
    WKBs (each closed)."""
    body = struct.pack("<BII", 1, GeomType.CURVEPOLYGON, len(rings))
    return body + b"".join(rings)
