"""AutoCAD DXF vector driver — ogr/ogrsf_frmts/dxf analogue, from the
public DXF reference (ASCII group-code/value pairs; Autodesk publishes
the format).  Covers the entity subset real CAD interchange uses:

  POINT, LINE, LWPOLYLINE, POLYLINE/VERTEX/SEQEND, CIRCLE, ARC,
  TEXT, MTEXT, SOLID, 3DFACE

with OGR's geometry semantics: closed polylines gain the closing vertex,
CIRCLE/ARC tessellate counter-clockwise at 4° steps (OGR_ARC_STEPSIZE
default), SOLID's third/fourth corners arrive swapped per the spec,
TEXT/MTEXT become Points carrying their string.  Attributes: layer
(group 8), entity type, text (group 1).  Bulge arcs (group 42) and 3D
elevations are ignored, as documented.

Read path (the kmlgpx idiom): the driver scans the ENTITIES section
once — a line walk that only looks at group codes, no value parsing —
and records one byte span per top-level entity (POLYLINE spans run
through their SEQEND).  Ray tasks range-read + parse only their own
spans, so a crawl of large drawings fans out without the driver ever
parsing geometry.

Write path: minimal spec-valid document (ENTITIES section only, the
form every reader including this one and OGR accepts): Points → POINT,
LineStrings → LWPOLYLINE (closing vertex folded into flag 70=1),
Polygon exteriors → closed LWPOLYLINE.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa

from gdal_ray.geometry import wkb as wkbmod

_TOP_ENTITIES = {
    b"POINT", b"LINE", b"LWPOLYLINE", b"POLYLINE", b"CIRCLE", b"ARC",
    b"TEXT", b"MTEXT", b"SOLID", b"3DFACE", b"INSERT", b"ELLIPSE",
    b"SPLINE", b"HATCH", b"DIMENSION",
}
_ARC_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default


def _entity_spans(path: str) -> list[tuple[int, int]]:
    """Byte spans of every top-level entity in the ENTITIES section.
    POLYLINE spans extend through their SEQEND."""
    with open(path, "rb") as f:
        buf = f.read()
    spans = []
    pos = 0
    in_entities = False
    cur_start = None
    in_polyline = False
    pending_code = None
    code_off = 0
    for line in buf.splitlines(keepends=True):
        stripped = line.strip()
        if pending_code is None:
            pending_code = stripped
            code_off = pos
        else:
            code, val = pending_code, stripped
            pending_code = None
            if code == b"0":
                if val == b"ENDSEC" and in_entities:
                    if cur_start is not None:
                        spans.append((cur_start, code_off))
                        cur_start = None
                    in_entities = False
                elif in_entities:
                    if val == b"SEQEND":
                        in_polyline = False  # span closes at NEXT code-0
                    elif in_polyline and val == b"VERTEX":
                        pass  # interior of the POLYLINE span
                    else:
                        if cur_start is not None:
                            spans.append((cur_start, code_off))
                            cur_start = None
                        if val in _TOP_ENTITIES:
                            cur_start = code_off
                            in_polyline = val == b"POLYLINE"
            elif code == b"2" and val == b"ENTITIES":
                in_entities = True
        pos += len(line)
    if cur_start is not None:
        spans.append((cur_start, len(buf)))
    return spans


def _pairs(text: bytes):
    lines = text.splitlines()
    for i in range(0, len(lines) - 1, 2):
        yield lines[i].strip().decode("ascii", "replace"), \
            lines[i + 1].strip().decode("ascii", "replace")


def _tessellate(cx, cy, r, a0_deg, a1_deg):
    """CCW arc points at <=4° steps, endpoints exact (OGR semantics)."""
    while a1_deg <= a0_deg:
        a1_deg += 360.0
    n = max(2, int(math.ceil((a1_deg - a0_deg) / _ARC_STEP_DEG)) + 1)
    ang = np.linspace(math.radians(a0_deg), math.radians(a1_deg), n)
    return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])


def _parse_entity(text: bytes):
    """-> (etype, layer, text, wkb) or None for unsupported entities."""
    it = list(_pairs(text))
    etype = it[0][1]
    layer = ""
    label = ""
    # coordinate groups: x codes 10..13 pair with y codes 20..23
    xs: dict[int, list[float]] = {0: [], 1: [], 2: [], 3: []}
    ys: dict[int, list[float]] = {0: [], 1: [], 2: [], 3: []}
    radius = None
    a0 = a1 = None
    flags = 0
    for code, val in it[1:]:
        if not code.lstrip("-").isdigit():
            continue
        c = int(code)
        if c == 8:
            layer = val
        elif c == 1:
            label = val
        elif 10 <= c <= 13:
            xs[c - 10].append(float(val))
        elif 20 <= c <= 23:
            ys[c - 20].append(float(val))
        elif c == 40:
            radius = float(val)
        elif c == 50:
            a0 = float(val)
        elif c == 51:
            a1 = float(val)
        elif c == 70:
            flags = int(val)
    if etype == "POINT" or etype in ("TEXT", "MTEXT"):
        if not xs[0]:
            return None
        wkb = wkbmod.encode_point(xs[0][0], ys[0][0])
    elif etype == "LINE":
        pts = np.array([[xs[0][0], ys[0][0]], [xs[1][0], ys[1][0]]])
        wkb = wkbmod.encode_linestring(pts)
    elif etype in ("LWPOLYLINE", "POLYLINE"):
        pts = np.column_stack([np.array(xs[0]), np.array(ys[0])])
        if len(pts) < 2:
            return None
        if flags & 1 and not np.array_equal(pts[0], pts[-1]):
            pts = np.vstack([pts, pts[:1]])  # closed flag -> closing vertex
        wkb = wkbmod.encode_linestring(pts)
    elif etype == "CIRCLE":
        wkb = wkbmod.encode_linestring(
            _tessellate(xs[0][0], ys[0][0], radius, 0.0, 360.0))
    elif etype == "ARC":
        wkb = wkbmod.encode_linestring(
            _tessellate(xs[0][0], ys[0][0], radius, a0, a1))
    elif etype in ("SOLID", "3DFACE"):
        # SOLID vertex order is 1,2,4,3 per the spec — swap the last two
        order = [0, 1, 3, 2] if etype == "SOLID" else [0, 1, 2, 3]
        pts = []
        for k in order:
            if xs[k]:
                pts.append([xs[k][0], ys[k][0]])
        ring = np.array(pts + pts[:1])
        wkb = wkbmod.encode_polygon([ring])
    else:
        return None  # INSERT/SPLINE/HATCH/...: documented skip
    return etype, layer, label, wkb


def read_dxf(path: str, *, spans_per_block: int = 512):
    """DXF -> Dataset (fid, etype, layer, text, wkb)."""
    import ray.data as rd

    spans = _entity_spans(path)
    items = [{"fid": i, "off": a, "end": b}
             for i, (a, b) in enumerate(spans)]

    def load(b: pa.Table) -> pa.Table:
        out = {"fid": [], "etype": [], "layer": [], "text": [], "wkb": []}
        with open(path, "rb") as f:
            for it in b.to_pylist():
                f.seek(it["off"])
                parsed = _parse_entity(f.read(it["end"] - it["off"]))
                if parsed is None:
                    continue
                etype, layer, label, wkb = parsed
                out["fid"].append(it["fid"])
                out["etype"].append(etype)
                out["layer"].append(layer)
                out["text"].append(label)
                out["wkb"].append(wkb)
        return pa.table({
            "fid": pa.array(out["fid"], pa.int64()),
            "etype": pa.array(out["etype"], pa.string()),
            "layer": pa.array(out["layer"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "wkb": pa.array(out["wkb"], pa.binary()),
        })

    nb = max(1, (len(items) + spans_per_block - 1) // spans_per_block)
    return rd.from_items(items, override_num_blocks=nb).map_batches(
        load, batch_format="pyarrow")


def dxf_info(path: str) -> dict:
    spans = _entity_spans(path)
    return {"driver": "DXF", "n_entities": len(spans),
            "file_size": os.path.getsize(path)}


# ---------------------------------------------------------------- writer

def _fmt(v: float) -> str:
    return repr(float(v))


def _emit_lwpolyline(out: list, pts: np.ndarray, layer: str, closed: bool):
    if closed and len(pts) > 1 and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    out += ["0", "LWPOLYLINE", "8", layer or "0",
            "90", str(len(pts)), "70", "1" if closed else "0"]
    for x, y in pts:
        out += ["10", _fmt(x), "20", _fmt(y)]


def write_dxf(ds_or_rows, path: str, *, geometry_col: str = "wkb",
              layer_col: str = "layer") -> int:
    """Rows with WKB geometry -> minimal spec-valid DXF (ENTITIES only).
    Points → POINT, LineStrings → LWPOLYLINE (closed ones via flag 70),
    Polygon rings → closed LWPOLYLINE each.  Single-writer text format:
    the driver streams rows; geometry stays WKB until here."""
    rows = ds_or_rows.to_pandas() if hasattr(ds_or_rows, "to_pandas") \
        else ds_or_rows
    from gdal_ray.geometry.wkb import GeomType, decode_wkb

    out = ["0", "SECTION", "2", "ENTITIES"]
    n = 0
    for _, row in rows.iterrows():
        layer = str(row[layer_col]) if layer_col in rows.columns else "0"
        gtype, payload = decode_wkb(bytes(row[geometry_col]))
        if gtype == GeomType.POINT:
            out += ["0", "POINT", "8", layer,
                    "10", _fmt(payload[0]), "20", _fmt(payload[1])]
        elif gtype == GeomType.LINESTRING:
            pts = np.asarray(payload)
            closed = len(pts) > 2 and np.array_equal(pts[0], pts[-1])
            _emit_lwpolyline(out, pts, layer, closed)
        elif gtype == GeomType.POLYGON:
            for ring in payload:
                _emit_lwpolyline(out, np.asarray(ring), layer, True)
        else:
            continue  # documented: multi* parts should be exploded upstream
        n += 1
    out += ["0", "ENDSEC", "0", "EOF", ""]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(out))
    os.replace(tmp, path)
    return n
