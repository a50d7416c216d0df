"""GML (Geography Markup Language) simple-features vector driver —
GML 3.2 / 2.1 subset (reference: ogr/ogrsf_frmts/gml, gmlreader.cpp).

Supported feature geometry (the WFS simple-features profile):
  gml:Point        <gml:pos>x y</gml:pos> (3.2) or
                   <gml:coordinates>x,y</gml:coordinates> (2.1)
  gml:LineString   <gml:posList>x y x y …</gml:posList> / coordinates
  gml:Polygon      exterior/interior LinearRing posList (3.2) or
                   outerBoundaryIs/innerBoundaryIs (2.1)
  gml:Curve        <gml:segments> of LineStringSegment / GeodesicString
                   / Arc / ArcString / Circle — curve segments linearize
                   through the geometry/wkb arc kernel (round 5), and a
                   Ring/Curve polygon boundary goes through the same
                   path (reference: gml2ogrgeometry.cpp Arc handling)
Feature members: any element directly inside gml:featureMember /
wfs:member / members; simple child elements become string attributes.

Scale shape: the driver scans featureMember byte spans (the KML
byte-scan idiom — no XML parse driver-side), Ray tasks regex-parse only
their spans.  Writer emits a 3.2-flavored FeatureCollection.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa

from gdal_ray.geometry.wkb import encode_point, encode_polygon

_MEMBER_TAGS = ("gml:featureMember", "wfs:member", "gml:member",
                "featureMember", "member")


def _spans(buf: bytes, tag: str) -> list[tuple[int, int]]:
    opens, closes = [], []
    o, c = f"<{tag}".encode(), f"</{tag}>".encode()
    i = 0
    while True:
        i = buf.find(o, i)
        if i < 0:
            break
        nxt = buf[i + len(o):i + len(o) + 1]
        if nxt in (b">", b" ", b"\t", b"\n"):
            opens.append(i)
        i += len(o)
    i = 0
    while True:
        i = buf.find(c, i)
        if i < 0:
            break
        closes.append(i + len(c))
        i += len(c)
    return list(zip(opens, closes))


def _member_spans(path: str) -> tuple[str, list[tuple[int, int]]]:
    with open(path, "rb") as f:
        buf = f.read()
    for tag in _MEMBER_TAGS:
        sp = _spans(buf, tag)
        if sp:
            return tag, sp
    return "", []


_POS_RE = re.compile(
    r"<(?:gml:)?(?:posList|pos|coordinates)[^>]*>([^<]+)<", re.S)
_EXTERIOR_RE = re.compile(
    r"<(?:gml:)?(?:exterior|outerBoundaryIs)>(.*?)</(?:gml:)?"
    r"(?:exterior|outerBoundaryIs)>", re.S)
_INTERIOR_RE = re.compile(
    r"<(?:gml:)?(?:interior|innerBoundaryIs)>(.*?)</(?:gml:)?"
    r"(?:interior|innerBoundaryIs)>", re.S)
_SIMPLE_RE = re.compile(r"<(?:\w+:)?(\w+)>([^<]+)</(?:\w+:)?\1>")
_SEGMENT_RE = re.compile(
    r"<(?:gml:)?(LineStringSegment|GeodesicString|ArcString|Arc|Circle)"
    r"[^>]*>(.*?)</(?:gml:)?\1>", re.S)


def _coords(text: str) -> np.ndarray:
    """posList ('x y x y …') or GML2 coordinates ('x,y x,y …') -> (n,2)."""
    t = text.strip()
    if "," in t:
        pts = [p.split(",")[:2] for p in t.split()]
        return np.array([[float(a), float(b)] for a, b in pts])
    vals = np.array(t.split(), dtype=np.float64)
    return vals.reshape(-1, 2)


def _full_circle(p0, p1, p2, step_deg: float = 4.0) -> np.ndarray:
    """Three distinct points -> the FULL circle through them (gml:Circle),
    2π sweep from p0, closed (first == last point)."""
    ax, ay = float(p0[0]), float(p0[1])
    bx, by = float(p1[0]), float(p1[1])
    cx, cy = float(p2[0]), float(p2[1])
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    import math

    r = math.hypot(ax - ux, ay - uy)
    a0 = math.atan2(ay - uy, ax - ux)
    n = max(8, int(math.ceil(360.0 / step_deg)))
    ang = a0 + 2.0 * math.pi * np.arange(n + 1) / n
    pts = np.column_stack([ux + r * np.cos(ang), uy + r * np.sin(ang)])
    pts[0] = (ax, ay)
    pts[-1] = (ax, ay)
    return pts


def _segments_to_pts(xml: str) -> "np.ndarray | None":
    """<gml:segments> content -> linearized (n,2) points, honoring
    segment order and shared endpoints (Arc/ArcString/Circle linearize
    via the WKB curve kernel, 4-degree OGR default step)."""
    from gdal_ray.geometry.wkb import (_arc_points,
                                       linearize_circularstring)

    parts = []
    for m in _SEGMENT_RE.finditer(xml):
        kind = m.group(1)
        pm = _POS_RE.search(m.group(2))
        if not pm:
            continue
        pts = _coords(pm.group(1))
        if kind in ("LineStringSegment", "GeodesicString"):
            lin = pts
        elif kind in ("Arc", "ArcString"):
            lin = linearize_circularstring(pts)
        else:  # Circle: three distinct points define the full circle
            lin = _full_circle(pts[0], pts[1], pts[2])
        parts.append(lin if not parts else lin[1:])
    if not parts:
        return None
    return np.vstack(parts)


def _parse_member(xml: str):
    """member XML -> (wkb|None, {attr: str})."""
    wkb = None
    if "Polygon" in xml:
        rings = []
        for rx in (_EXTERIOR_RE, _INTERIOR_RE):
            for m in rx.finditer(xml):
                frag = m.group(1)
                if "segments" in frag or "Arc" in frag or "Circle" in frag:
                    pts = _segments_to_pts(frag)
                    if pts is not None:
                        rings.append(pts)
                    continue
                pm = _POS_RE.search(frag)
                if pm:
                    rings.append(_coords(pm.group(1)))
        if rings:
            wkb = encode_polygon(rings)
    elif "Curve" in xml and "segments" in xml:
        pts = _segments_to_pts(xml)
        if pts is not None:
            import struct

            wkb = struct.pack("<BII", 1, 2, len(pts)) + \
                np.ascontiguousarray(pts, dtype="<f8").tobytes()
    elif "LineString" in xml:
        m = _POS_RE.search(xml)
        if m:
            import struct

            pts = _coords(m.group(1))
            wkb = struct.pack("<BII", 1, 2, len(pts)) + \
                np.ascontiguousarray(pts, dtype="<f8").tobytes()
    elif "Point" in xml:
        m = _POS_RE.search(xml)
        if m:
            pt = _coords(m.group(1))
            wkb = encode_point(float(pt[0, 0]), float(pt[0, 1]))
    attrs = {}
    geom_tags = ("pos", "posList", "coordinates", "Point", "LineString",
                 "Polygon", "exterior", "interior", "LinearRing",
                 "outerBoundaryIs", "innerBoundaryIs", "Curve",
                 "segments", "LineStringSegment", "Arc", "ArcString",
                 "Circle", "GeodesicString", "Ring", "curveMember")
    for m in _SIMPLE_RE.finditer(xml):
        name, val = m.group(1), m.group(2).strip()
        if name not in geom_tags and val:
            attrs[name] = val
    return wkb, attrs


def read_gml_meta(path: str) -> dict:
    tag, spans = _member_spans(path)
    return {"format": "GML", "member_tag": tag, "n_features": len(spans)}


def read_gml(path: str, *, rows_per_block: int = 2048):
    """-> Dataset (fid, wkb, + string attributes) — member spans parse
    per Ray task."""
    import ray.data as rd

    tag, spans = _member_spans(path)
    # attribute schema from the first member (WFS responses are uniform)
    attr_names: list[str] = []
    if spans:
        with open(path, "rb") as f:
            f.seek(spans[0][0])
            head = f.read(spans[0][1] - spans[0][0]).decode("utf-8",
                                                            "replace")
        _w, attrs0 = _parse_member(head)
        attr_names = sorted(attrs0)
    items = [{"lo": i, "hi": min(i + rows_per_block, len(spans))}
             for i in range(0, len(spans), rows_per_block)]

    def load(b: pa.Table) -> pa.Table:
        with open(path, "rb") as f:
            buf = f.read()
        out = {"fid": [], "wkb": []}
        for n in attr_names:
            out[n] = []
        for span in b.to_pylist():
            for k in range(span["lo"], span["hi"]):
                s0, s1 = spans[k]
                wkb, attrs = _parse_member(
                    buf[s0:s1].decode("utf-8", "replace"))
                out["fid"].append(k)
                out["wkb"].append(wkb)
                for n in attr_names:
                    out[n].append(attrs.get(n))
        arrays = {"fid": pa.array(out["fid"], pa.int64()),
                  "wkb": pa.array(out["wkb"], pa.binary())}
        for n in attr_names:
            arrays[n] = pa.array(out[n], pa.string())
        return pa.table(arrays)

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")


def write_gml(path: str, tbl: pa.Table) -> None:
    """(wkb, attrs…) -> GML 3.2-flavored FeatureCollection (driver-side
    sink for tests/interchange)."""
    from gdal_ray.geometry.wkb import polygon_parts

    attrs = [c for c in tbl.column_names if c not in ("fid", "wkb")]
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2"'
           ' xmlns:eng="urn:gdal-ray">']
    wkbs = tbl.column("wkb").to_pylist()
    for k, wkb in enumerate(wkbs):
        out.append(f'  <gml:featureMember>')
        out.append(f'    <eng:feature gml:id="f{k}">')
        for c in attrs:
            v = tbl.column(c)[k].as_py()
            if v is not None:
                out.append(f"      <eng:{c}>{v}</eng:{c}>")
        if wkb is not None:
            g = int.from_bytes(wkb[1:5], "little") & 0xFF
            if g == 1:
                x, y = np.frombuffer(wkb[5:21], "<f8")
                out.append("      <gml:Point><gml:pos>"
                           f"{x:.17g} {y:.17g}</gml:pos></gml:Point>")
            elif g == 3:
                rings = polygon_parts(wkb)[0]
                out.append("      <gml:Polygon>")
                for ri, r in enumerate(rings):
                    kind = "exterior" if ri == 0 else "interior"
                    pos = " ".join(f"{p[0]:.17g} {p[1]:.17g}" for p in r)
                    out.append(f"        <gml:{kind}><gml:LinearRing>"
                               f"<gml:posList>{pos}</gml:posList>"
                               f"</gml:LinearRing></gml:{kind}>")
                out.append("      </gml:Polygon>")
            else:
                raise NotImplementedError(f"GML write for wkb type {g}")
        out.append("    </eng:feature>")
        out.append("  </gml:featureMember>")
    out.append("</gml:FeatureCollection>")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(out) + "\n")
    os.replace(tmp, path)
