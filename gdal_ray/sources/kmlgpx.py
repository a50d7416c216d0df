"""KML + GPX vector drivers — ogr/ogrsf_frmts/kml (kml2ogr geometry
subset: Point / LineString / Polygon Placemarks with ExtendedData) and
ogr/ogrsf_frmts/gpx (wpt / trk layers) analogues, from the public OGC
KML 2.2 and Topografix GPX 1.1 schemas.

Read path: XML is not line-splittable, so the driver byte-scans for
top-level element spans (``<Placemark``/``</Placemark>`` etc. — a
memchr-speed pass, no XML parse) and Ray tasks range-read + parse only
their own elements.  Assumption (documented): elements are unprefixed
(``<Placemark>``, not ``<kml:Placemark>``) — what every mainstream
writer, including this one and the reference, emits.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pyarrow as pa

from gdal_ray.sources.geojson import geometry_to_wkb, wkb_to_geometry


# ---------------------------------------------------------------- shared

def _element_spans(path: str, tag: str) -> list[tuple[int, int]]:
    """Byte spans of every <tag ...>...</tag> element (no XML parse)."""
    with open(path, "rb") as f:
        buf = f.read()
    opens, closes = [], []
    o, c = f"<{tag}".encode(), f"</{tag}>".encode()
    i = 0
    while True:
        i = buf.find(o, i)
        if i < 0:
            break
        nxt = buf[i + len(o):i + len(o) + 1]
        if nxt in (b">", b" ", b"\t", b"\n"):  # not a prefix of a longer tag
            opens.append(i)
        i += len(o)
    i = 0
    while True:
        i = buf.find(c, i)
        if i < 0:
            break
        closes.append(i + len(c))
        i += len(c)
    if len(opens) != len(closes):
        raise ValueError(f"{path}: unbalanced <{tag}> elements")
    return list(zip(opens, closes))


def _spans_dataset(path: str, spans, parse_one, *, spans_per_block=256):
    """Dataset over element spans; each task range-reads + parses its own."""
    import ray.data as rd

    items = [{"off": a, "end": b} for a, b in spans]

    def load(b: pa.Table) -> pa.Table:
        feats = []
        with open(path, "rb") as f:
            for it in b.to_pylist():
                f.seek(it["off"])
                el = ET.fromstring(f.read(it["end"] - it["off"]))
                feats.append(parse_one(el))
        from gdal_ray.sources.geojson import _features_to_table

        return _features_to_table(feats)

    nb = max(1, (len(items) + spans_per_block - 1) // spans_per_block)
    return rd.from_items(items, override_num_blocks=nb).map_batches(
        load, batch_format="pyarrow")


def _coords_text(coords, *, sep=" ") -> str:
    return sep.join(f"{x!r},{y!r}" for x, y in coords)


def _parse_coords(text: str) -> list[list[float]]:
    out = []
    for tok in (text or "").split():
        parts = tok.split(",")
        out.append([float(parts[0]), float(parts[1])])
    return out


# ------------------------------------------------------------------- KML

def _kml_geometry_xml(geom: dict) -> str:
    t = geom["type"]
    if t == "Point":
        return ("<Point><coordinates>"
                f"{_coords_text([geom['coordinates']])}"
                "</coordinates></Point>")
    if t == "LineString":
        return ("<LineString><coordinates>"
                f"{_coords_text(geom['coordinates'])}"
                "</coordinates></LineString>")
    if t == "Polygon":
        rings = geom["coordinates"]
        parts = ["<Polygon><outerBoundaryIs><LinearRing><coordinates>",
                 _coords_text(rings[0]),
                 "</coordinates></LinearRing></outerBoundaryIs>"]
        for r in rings[1:]:
            parts += ["<innerBoundaryIs><LinearRing><coordinates>",
                      _coords_text(r),
                      "</coordinates></LinearRing></innerBoundaryIs>"]
        parts.append("</Polygon>")
        return "".join(parts)
    raise NotImplementedError(f"KML geometry {t}")


def write_kml(table: pa.Table, path: str, *, name_col: str | None = None,
              geometry_col: str = "wkb") -> None:
    """Arrow table (wkb + attribute columns) -> KML document (Placemarks
    with ExtendedData).  Single-file XML is inherently one writer —
    driver-side streaming, atomic tmp+rename."""
    attrs = [c for c in table.column_names if c not in (geometry_col, name_col)]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>\n')
        wkbs = table.column(geometry_col).to_pylist()
        names = table.column(name_col).to_pylist() if name_col else None
        cols = {c: table.column(c).to_pylist() for c in attrs}
        for i, wkb in enumerate(wkbs):
            f.write("<Placemark>")
            if names is not None and names[i] is not None:
                f.write(f"<name>{escape(str(names[i]))}</name>")
            if attrs:
                f.write("<ExtendedData>")
                for c in attrs:
                    v = cols[c][i]
                    if v is not None:
                        nm = escape(c, {'"': "&quot;"})
                        f.write(f'<Data name="{nm}">'
                                f"<value>{escape(str(v))}</value></Data>")
                f.write("</ExtendedData>")
            f.write(_kml_geometry_xml(wkb_to_geometry(wkb)))
            f.write("</Placemark>\n")
        f.write("</Document></kml>\n")
    os.replace(tmp, path)


def _parse_placemark(el: ET.Element) -> dict:
    props: dict = {}
    name = el.findtext("name")
    if name is not None:
        props["name"] = name
    ext = el.find("ExtendedData")
    if ext is not None:
        for d in ext.findall("Data"):
            props[d.attrib["name"]] = d.findtext("value")
    pt = el.find("Point")
    ln = el.find("LineString")
    pg = el.find("Polygon")
    if pt is not None:
        geom = {"type": "Point",
                "coordinates": _parse_coords(pt.findtext("coordinates"))[0]}
    elif ln is not None:
        geom = {"type": "LineString",
                "coordinates": _parse_coords(ln.findtext("coordinates"))}
    elif pg is not None:
        rings = [_parse_coords(
            pg.find("outerBoundaryIs/LinearRing").findtext("coordinates"))]
        for ib in pg.findall("innerBoundaryIs/LinearRing"):
            rings.append(_parse_coords(ib.findtext("coordinates")))
        geom = {"type": "Polygon", "coordinates": rings}
    else:
        raise NotImplementedError("Placemark without Point/LineString/Polygon")
    return {"geometry": geom, "properties": props}


def read_kml(path: str, **kw):
    """KML -> Dataset(wkb, name, + ExtendedData columns)."""
    return _spans_dataset(path, _element_spans(path, "Placemark"),
                          _parse_placemark, **kw)


# ------------------------------------------------------------------- GPX

def write_gpx(table: pa.Table, path: str, *, name_col: str | None = None,
              geometry_col: str = "wkb") -> None:
    """Points -> <wpt>, LineStrings -> <trk>/<trkseg> (GPX 1.1)."""
    names = table.column(name_col).to_pylist() if name_col else None
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                '<gpx version="1.1" creator="gdal_ray" '
                'xmlns="http://www.topografix.com/GPX/1/1">\n')
        for i, wkb in enumerate(table.column(geometry_col).to_pylist()):
            g = wkb_to_geometry(wkb)
            nm = (f"<name>{escape(str(names[i]))}</name>"
                  if names is not None and names[i] is not None else "")
            if g["type"] == "Point":
                x, y = g["coordinates"]
                f.write(f'<wpt lat="{y!r}" lon="{x!r}">{nm}</wpt>\n')
            elif g["type"] == "LineString":
                pts = "".join(f'<trkpt lat="{y!r}" lon="{x!r}"></trkpt>'
                              for x, y in g["coordinates"])
                f.write(f"<trk>{nm}<trkseg>{pts}</trkseg></trk>\n")
            else:
                raise NotImplementedError(f"GPX geometry {g['type']}")
        f.write("</gpx>\n")
    os.replace(tmp, path)


def _parse_wpt(el: ET.Element) -> dict:
    props = {}
    if el.findtext("name") is not None:
        props["name"] = el.findtext("name")
    return {"geometry": {"type": "Point",
                         "coordinates": [float(el.attrib["lon"]),
                                         float(el.attrib["lat"])]},
            "properties": props}


def _parse_trk(el: ET.Element) -> dict:
    props = {}
    if el.findtext("name") is not None:
        props["name"] = el.findtext("name")
    coords = [[float(p.attrib["lon"]), float(p.attrib["lat"])]
              for seg in el.findall("trkseg") for p in seg.findall("trkpt")]
    return {"geometry": {"type": "LineString", "coordinates": coords},
            "properties": props}


def read_gpx(path: str, *, layer: str = "waypoints", **kw):
    """GPX -> Dataset; layer in {'waypoints', 'tracks'} (the reference
    exposes the same split as separate OGR layers)."""
    if layer == "waypoints":
        return _spans_dataset(path, _element_spans(path, "wpt"),
                              _parse_wpt, **kw)
    if layer == "tracks":
        return _spans_dataset(path, _element_spans(path, "trk"),
                              _parse_trk, **kw)
    raise ValueError(f"unknown GPX layer {layer!r}")
