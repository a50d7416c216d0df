"""MapInfo Interchange Format (MIF/MID) vector driver — the ASCII
interchange pair MapInfo exports (reference: ogr/ogrsf_frmts/mitab,
mitab_mif*.cpp).

Layout (public MIF spec): `file.mif` holds a header (VERSION, CHARSET,
DELIMITER "<c>", COLUMNS n + typed fields, DATA) followed by one geometry
record per feature — POINT x y / PLINE [MULTIPLE k] with per-part vertex
counts / REGION k with per-ring counts / NONE — with optional styling
clauses (PEN/BRUSH/SYMBOL/SMOOTH) skipped on read.  `file.mid` holds the
delimited attribute rows, one per geometry, in DATA order.

Scale shape: the driver scans record start offsets (keyword-anchored)
driver-side, Ray tasks parse only their record spans (the KML/GeoJSONSeq
idiom); the MID attributes split by row range alongside.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa

from gdal_ray.geometry.wkb import (encode_multipolygon, encode_point,
                                   encode_polygon)

_GEOM_KEYWORDS = ("POINT", "PLINE", "REGION", "LINE", "NONE")


def _parse_header(text: str) -> dict:
    cols: list[tuple[str, str]] = []
    delim = "\t"
    lines = text.splitlines()
    i = 0
    ncols = 0
    while i < len(lines):
        line = lines[i].strip()
        up = line.upper()
        if up.startswith("DELIMITER"):
            m = re.search(r'"(.)"', line)
            if m:
                delim = m.group(1)
        elif up.startswith("COLUMNS"):
            ncols = int(line.split()[1])
            for j in range(ncols):
                i += 1
                parts = lines[i].split()
                cols.append((parts[0], parts[1].lower()))
        elif up == "DATA":
            i += 1
            break
        i += 1
    return {"delimiter": delim, "columns": cols, "data_line": i}


def _parse_records(lines: list[str]):
    """DATA-section lines -> list of (wkb|None) geometries."""
    geoms = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        up = line.upper()
        if not line:
            i += 1
            continue
        if up.startswith("POINT"):
            _, xs, ys = line.split()[:3]
            geoms.append(encode_point(float(xs), float(ys)))
            i += 1
        elif up.startswith("LINE "):
            p = line.split()
            ring = np.array([[float(p[1]), float(p[2])],
                             [float(p[3]), float(p[4])]])
            geoms.append(_encode_linestring(ring))
            i += 1
        elif up.startswith("PLINE"):
            p = line.split()
            nparts = 1
            i += 1
            if len(p) > 1 and p[1].upper() == "MULTIPLE":
                nparts = int(p[2])
                counts = []
            elif len(p) > 1:
                counts = [int(p[1])]
                nparts = 0  # count already known
            parts_pts = []
            if nparts:  # MULTIPLE: each part has its own count line
                for _ in range(nparts):
                    cnt = int(lines[i].split()[0])
                    i += 1
                    pts, i = _read_pts(lines, i, cnt)
                    parts_pts.append(pts)
            else:
                pts, i = _read_pts(lines, i, counts[0])
                parts_pts.append(pts)
            geoms.append(_encode_multilinestring(parts_pts))
        elif up.startswith("REGION"):
            nrings = int(line.split()[1])
            i += 1
            rings = []
            for _ in range(nrings):
                cnt = int(lines[i].split()[0])
                i += 1
                pts, i = _read_pts(lines, i, cnt)
                rings.append(pts)
            # MIF regions: each ring may be an island or a hole; the
            # mitab heuristic (winding + containment) reduces here to:
            # first ring exterior, CCW-consistent follow-ons exterior of
            # new parts, others holes of the previous exterior
            geoms.append(_rings_to_polygon_wkb(rings))
        elif up == "NONE":
            geoms.append(None)
            i += 1
        elif up.split()[0] in ("PEN", "BRUSH", "SYMBOL", "SMOOTH", "CENTER"):
            i += 1  # styling clauses
        else:
            i += 1
    return geoms


def _read_pts(lines, i, cnt):
    pts = np.empty((cnt, 2))
    for j in range(cnt):
        a, b = lines[i].split()[:2]
        pts[j] = (float(a), float(b))
        i += 1
    return pts, i


def _encode_linestring(pts: np.ndarray) -> bytes:
    import struct

    out = struct.pack("<BII", 1, 2, len(pts))
    out += np.asarray(pts, dtype="<f8").tobytes()
    return out


def _encode_multilinestring(parts: list[np.ndarray]) -> bytes:
    import struct

    if len(parts) == 1:
        return _encode_linestring(parts[0])
    out = struct.pack("<BII", 1, 5, len(parts))
    for p in parts:
        out += _encode_linestring(p)
    return out


def _rings_to_polygon_wkb(rings: list[np.ndarray]) -> bytes:
    """MIF REGION rings -> (Multi)Polygon: a ring whose representative
    vertex lies strictly inside an earlier exterior is that exterior's
    hole (even-odd containment — the mitab regrouping), otherwise it
    starts a new part."""
    from gdal_ray.geometry.predicates import points_in_rings

    parts: list[list[np.ndarray]] = []
    for r in rings:
        placed = False
        # representative point: midpoint of the first edge nudged toward
        # the ring centroid (robust against shared-boundary vertices)
        cx, cy = r[:, 0].mean(), r[:, 1].mean()
        px = r[0, 0] * 0.99 + cx * 0.01
        py = r[0, 1] * 0.99 + cy * 0.01
        for part in parts:
            inside = points_in_rings(np.array([px]), np.array([py]),
                                     [part[0]])[0]
            if inside:
                part.append(r)
                placed = True
                break
        if not placed:
            parts.append([r])
    if len(parts) == 1:
        return encode_polygon(parts[0])
    return encode_multipolygon(parts)


def read_mif_meta(path: str) -> dict:
    with open(path, encoding="latin-1") as f:
        text = f.read()
    hdr = _parse_header(text)
    lines = text.splitlines()
    data_lines = lines[hdr["data_line"]:]
    # record start offsets (keyword-anchored) for the parallel read
    starts = [j for j, ln in enumerate(data_lines)
              if ln.strip().upper().split()[:1]
              and ln.strip().upper().split()[0] in _GEOM_KEYWORDS]
    return {"format": "MIF", "columns": hdr["columns"],
            "delimiter": hdr["delimiter"], "n_features": len(starts),
            "data_line": hdr["data_line"], "record_starts": starts}


def read_mifmid(path: str, *, rows_per_block: int = 2048):
    """-> Dataset (fid, wkb, <attrs…>) — record spans parse per task."""
    import ray.data as rd

    m = read_mif_meta(path)
    midp = os.path.splitext(path)[0] + ".mid"
    if not os.path.exists(midp):
        midp = os.path.splitext(path)[0] + ".MID"
    starts = m["record_starts"]
    n = len(starts)
    items = [{"lo": s, "hi": min(s + rows_per_block, n)}
             for s in range(0, n, rows_per_block)]
    cols = m["columns"]
    delim = m["delimiter"]
    data_line = m["data_line"]

    def load(b: pa.Table) -> pa.Table:
        with open(path, encoding="latin-1") as f:
            data_lines = f.read().splitlines()[data_line:]
        mid_lines = open(midp, encoding="latin-1").read().splitlines() \
            if os.path.exists(midp) else []
        out = {"fid": [], "wkb": []}
        for name, _t in cols:
            out[name] = []
        for span in b.to_pylist():
            lo, hi = span["lo"], span["hi"]
            for k in range(lo, hi):
                s0 = starts[k]
                s1 = starts[k + 1] if k + 1 < n else len(data_lines)
                geoms = _parse_records(data_lines[s0:s1])
                wkb = geoms[0] if geoms else None
                out["fid"].append(k)
                out["wkb"].append(wkb)
                vals = (mid_lines[k].split(delim)
                        if k < len(mid_lines) else [])
                for ci, (name, typ) in enumerate(cols):
                    v = vals[ci].strip().strip('"') if ci < len(vals) else None
                    if v is not None and typ.startswith(("integer", "smallint")):
                        v = int(v) if v else None
                    elif v is not None and typ.startswith(("float", "decimal")):
                        v = float(v) if v else None
                    out[name].append(v)
        arrays = {"fid": pa.array(out["fid"], pa.int64()),
                  "wkb": pa.array(out["wkb"], pa.binary())}
        for name, typ in cols:
            if typ.startswith(("integer", "smallint")):
                arrays[name] = pa.array(out[name], pa.int64())
            elif typ.startswith(("float", "decimal")):
                arrays[name] = pa.array(out[name], pa.float64())
            else:
                arrays[name] = pa.array(out[name], pa.string())
        return pa.table(arrays)

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")


def write_mifmid(path: str, tbl: pa.Table, *, delimiter: str = ",") -> None:
    """(fid?, wkb, attrs…) Arrow table -> .mif + .mid pair (driver-side
    sink for tests/interchange)."""
    from gdal_ray.geometry.wkb import polygon_parts

    def wkb_geom_type(w: bytes) -> int:
        return int.from_bytes(w[1:5], "little" if w[0] else "big") & 0xFF

    attrs = [c for c in tbl.column_names if c not in ("fid", "wkb")]

    def mif_type(field):
        t = tbl.schema.field(field).type
        if pa.types.is_integer(t):
            return "Integer"
        if pa.types.is_floating(t):
            return "Float"
        return "Char(254)"

    mif = ["VERSION 300", 'CHARSET "Neutral"', f'DELIMITER "{delimiter}"',
           f"COLUMNS {len(attrs)}"]
    for c in attrs:
        mif.append(f"  {c} {mif_type(c)}")
    mif.append("DATA")
    mid = []
    wkbs = tbl.column("wkb").to_pylist()
    for k, wkb in enumerate(wkbs):
        if wkb is None:
            mif.append("NONE")
        else:
            g = wkb_geom_type(wkb)
            if g == 1:
                x, y = np.frombuffer(wkb[5:21], "<f8")
                mif.append(f"POINT {x:.17g} {y:.17g}")
            elif g in (3, 6):
                rings = [r for part in polygon_parts(wkb) for r in part]
                mif.append(f"REGION {len(rings)}")
                for r in rings:
                    mif.append(f"  {len(r)}")
                    mif.extend(f"{p[0]:.17g} {p[1]:.17g}" for p in r)
            else:
                raise NotImplementedError(f"MIF write for wkb type {g}")
        row = []
        for c in attrs:
            v = tbl.column(c)[k].as_py()
            t = tbl.schema.field(c).type
            row.append(f'"{v}"' if pa.types.is_string(t) else str(v))
        mid.append(delimiter.join(row))
    base = os.path.splitext(path)[0]
    with open(base + ".mif", "w") as f:
        f.write("\n".join(mif) + "\n")
    with open(base + ".mid", "w") as f:
        f.write("\n".join(mid) + "\n")
