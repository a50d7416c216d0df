"""WKT geometry codec (OGC Simple Features well-known text).

Reference semantics: OGRGeometry::importFromWkt / exportToWkt
(ogr/ogrgeometry.cpp and per-type importFromWkt overloads) for the 2-D
subset the WKB codec covers: Point, LineString, Polygon, MultiPoint,
MultiLineString, MultiPolygon, plus EMPTY.  Numbers render like OGR's
%.15g (shortest round-trip via Python repr of float)."""

from __future__ import annotations

import numpy as np

from gdal_ray.geometry.wkb import (
    GeomType,
    decode_wkb,
    encode_linestring,
    encode_multilinestring,
    encode_multipoint,
    encode_multipolygon,
    encode_point,
    encode_polygon,
)


def _fmt(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _ring_txt(pts) -> str:
    return "(" + ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts) + ")"


def wkb_to_wkt(wkb: bytes) -> str:
    gtype, payload = decode_wkb(wkb)
    if gtype == GeomType.POINT:
        return f"POINT ({_fmt(payload[0])} {_fmt(payload[1])})"
    if gtype == GeomType.LINESTRING:
        return "LINESTRING " + _ring_txt(payload)
    if gtype == GeomType.POLYGON:
        return "POLYGON (" + ",".join(_ring_txt(r) for r in payload) + ")"
    if gtype == GeomType.MULTIPOINT:
        return "MULTIPOINT (" + ",".join(
            f"({_fmt(p[0])} {_fmt(p[1])})" for _, p in payload) + ")"
    if gtype == GeomType.MULTILINESTRING:
        return "MULTILINESTRING (" + ",".join(_ring_txt(p) for _, p in payload) + ")"
    if gtype == GeomType.MULTIPOLYGON:
        return "MULTIPOLYGON (" + ",".join(
            "(" + ",".join(_ring_txt(r) for r in rings) + ")"
            for _, rings in payload) + ")"
    raise ValueError(f"unsupported WKB type {gtype}")


class _S:
    """Cursor over a WKT string."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def skip_ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\n\r":
            self.i += 1

    def word(self) -> str:
        self.skip_ws()
        j = self.i
        while j < len(self.s) and (self.s[j].isalpha() or self.s[j] == "_"):
            j += 1
        w, self.i = self.s[self.i:j], j
        return w.upper()

    def expect(self, ch: str):
        self.skip_ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            raise ValueError(f"WKT parse error at {self.s[self.i:self.i+15]!r}: expected {ch!r}")
        self.i += 1

    def accept(self, ch: str) -> bool:
        self.skip_ws()
        if self.i < len(self.s) and self.s[self.i] == ch:
            self.i += 1
            return True
        return False

    def number(self) -> float:
        self.skip_ws()
        j = self.i
        while j < len(self.s) and self.s[j] not in " \t\n\r,()":
            j += 1
        try:
            v = float(self.s[self.i:j])
        except ValueError:
            raise ValueError(f"WKT parse error: bad number {self.s[self.i:j]!r}") from None
        self.i = j
        return v


def _coords(sc: _S) -> np.ndarray:
    sc.expect("(")
    pts = []
    while True:
        x = sc.number()
        y = sc.number()
        pts.append((x, y))
        if not sc.accept(","):
            break
    sc.expect(")")
    return np.asarray(pts, dtype=np.float64)


def _ring_list(sc: _S) -> list[np.ndarray]:
    sc.expect("(")
    rings = [_coords(sc)]
    while sc.accept(","):
        rings.append(_coords(sc))
    sc.expect(")")
    return rings


def wkt_to_wkb(wkt: str) -> bytes:
    sc = _S(wkt)
    kind = sc.word()
    sc.skip_ws()
    if sc.s[sc.i:sc.i + 5].upper() == "EMPTY":
        raise ValueError(f"{kind} EMPTY has no WKB payload in the 2-D subset")
    if kind == "POINT":
        sc.expect("(")
        x, y = sc.number(), sc.number()
        sc.expect(")")
        return encode_point(x, y)
    if kind == "LINESTRING":
        return encode_linestring(_coords(sc))
    if kind == "POLYGON":
        return encode_polygon(_ring_list(sc))
    if kind == "MULTIPOINT":
        sc.expect("(")
        pts = []
        while True:
            if sc.accept("("):          # MULTIPOINT ((1 2),(3 4)) form
                pts.append((sc.number(), sc.number()))
                sc.expect(")")
            else:                        # MULTIPOINT (1 2,3 4) form
                pts.append((sc.number(), sc.number()))
            if not sc.accept(","):
                break
        sc.expect(")")
        return encode_multipoint(np.asarray(pts, dtype=np.float64))
    if kind == "MULTILINESTRING":
        return encode_multilinestring(_ring_list(sc))
    if kind == "MULTIPOLYGON":
        sc.expect("(")
        polys = [_ring_list(sc)]
        while sc.accept(","):
            polys.append(_ring_list(sc))
        sc.expect(")")
        return encode_multipolygon(polys)
    raise ValueError(f"unsupported WKT geometry type {kind!r}")
