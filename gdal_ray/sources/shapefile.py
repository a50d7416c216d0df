"""ESRI Shapefile vector driver (.shp / .shx / .dbf), implemented from the
public ESRI Shapefile Technical Description (July 1998) and the dBASE
III/IV file layout — no shapelib.

Reference semantics: ogr/ogrsf_frmts/shape (shape2ogr.cpp record
translation, ogrshapelayer.cpp) — geometry becomes the engine's `wkb`
column, DBF attributes become Arrow columns, the implicit FID is
`fid` (0-based record order, as OGR numbers shapefile features).

Shape-type mapping (spec §"Main File Record Contents"):

- 1 Point            -> WKB Point
- 3 PolyLine         -> LineString (one part) / MultiLineString
- 5 Polygon          -> Polygon / MultiPolygon (rings regrouped by the
  spec's orientation rule: outer rings are clockwise, holes
  counter-clockwise; holes attach to the containing outer ring the way
  OGRShapeGeomFieldDefn/organizePolygons resolves well-formed files)
- 8 MultiPoint       -> MultiPoint
- Z/M variants (11/13/15/18/21/23/25/28) decode with Z/M dropped (the
  engine's WKB column is 2-D), type 0 Null -> null wkb.

Scale shape: the .shx index (tiny — 8 bytes/record) is read driver-side
and split into contiguous record ranges; each Ray read task opens the
.shp once and decodes only its byte range, so a billion-record shapefile
reads as parallel as its record count.  Writing is single-file by
format definition (sequential record numbers + a running .shx), so
`write_shapefile` is a driver-side sink for final/small layers — the
partitioned scale path is one shapefile per block via
`write_shapefile_parts` (content-addressed part names, atomic rename).
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa

from gdal_ray.geometry.predicates import points_in_rings
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

SHP_MAGIC = 9994
SHP_VERSION = 1000

# shape-type constants (spec table 1)
S_NULL, S_POINT, S_POLYLINE, S_POLYGON, S_MULTIPOINT = 0, 1, 3, 5, 8
_Z = {11: S_POINT, 13: S_POLYLINE, 15: S_POLYGON, 18: S_MULTIPOINT,
      21: S_POINT, 23: S_POLYLINE, 25: S_POLYGON, 28: S_MULTIPOINT}


# ---------------------------------------------------------------- geometry


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2.0


def _rings_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Regroup a type-5 record's ring soup into Polygon/MultiPolygon.
    Spec: outer = clockwise (negative signed area with y-up), holes CCW."""
    outers = [r for r in rings if _signed_area(r) <= 0]
    holes = [r for r in rings if _signed_area(r) > 0]
    if not outers:  # degenerate: treat everything as outers
        outers, holes = rings, []
    if len(outers) == 1:
        return encode_polygon([outers[0]] + holes)
    polys: list[list[np.ndarray]] = [[o] for o in outers]
    for hle in holes:
        placed = False
        for p in polys:
            o = p[0]
            bx0, by0 = o.min(axis=0)
            bx1, by1 = o.max(axis=0)
            hx, hy = hle[0]
            if bx0 <= hx <= bx1 and by0 <= hy <= by1 and \
                    bool(points_in_rings(np.array([hx]), np.array([hy]), [o])[0]):
                p.append(hle)
                placed = True
                break
        if not placed:  # orphan hole -> promote to its own outer (OGR idiom)
            polys.append([hle])
    return encode_multipolygon(polys)


def _record_to_wkb(buf: memoryview) -> bytes | None:
    stype = struct.unpack("<i", buf[0:4])[0]
    stype = _Z.get(stype, stype)
    if stype == S_NULL:
        return None
    if stype == S_POINT:
        x, y = struct.unpack("<2d", buf[4:20])
        return encode_point(x, y)
    if stype == S_MULTIPOINT:
        n = struct.unpack("<i", buf[36:40])[0]
        pts = np.frombuffer(buf[40:40 + 16 * n], dtype="<f8").reshape(n, 2)
        return encode_multipoint(pts)
    if stype in (S_POLYLINE, S_POLYGON):
        nparts, npts = struct.unpack("<2i", buf[36:44])
        parts = np.frombuffer(buf[44:44 + 4 * nparts], dtype="<i4")
        p0 = 44 + 4 * nparts
        pts = np.frombuffer(buf[p0:p0 + 16 * npts], dtype="<f8").reshape(npts, 2)
        bounds = np.append(parts, npts)
        pieces = [pts[bounds[i]:bounds[i + 1]].astype(np.float64)
                  for i in range(nparts)]
        if stype == S_POLYLINE:
            if len(pieces) == 1:
                return encode_linestring(pieces[0])
            return encode_multilinestring(pieces)
        return _rings_to_wkb(pieces)
    raise NotImplementedError(f"shapefile shape type {stype}")


def _orient(ring: np.ndarray, clockwise: bool) -> np.ndarray:
    a = _signed_area(ring)
    if (a <= 0) != clockwise:
        return ring[::-1]
    return ring


def _wkb_to_record(wkb: bytes | None) -> tuple[int, bytes]:
    """-> (shape_type, content bytes after the type word)."""
    if wkb is None:
        return S_NULL, b""
    gtype, payload = decode_wkb(wkb)
    if gtype == GeomType.POINT:
        return S_POINT, struct.pack("<2d", float(payload[0]), float(payload[1]))
    if gtype == GeomType.MULTIPOINT:
        pts = np.asarray([p for _, p in payload], dtype=np.float64)
        return S_MULTIPOINT, _bbox_bytes(pts) + struct.pack("<i", len(pts)) + \
            pts.astype("<f8").tobytes()
    if gtype in (GeomType.LINESTRING, GeomType.MULTILINESTRING):
        parts = [payload] if gtype == GeomType.LINESTRING else [p for _, p in payload]
        return S_POLYLINE, _parts_bytes(parts)
    if gtype in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        if gtype == GeomType.POLYGON:
            groups = [payload]
        else:
            groups = [rings for _, rings in payload]
        rings: list[np.ndarray] = []
        for g in groups:
            rings.append(_close(_orient(np.asarray(g[0], np.float64), True)))
            for hole in g[1:]:
                rings.append(_close(_orient(np.asarray(hole, np.float64), False)))
        return S_POLYGON, _parts_bytes(rings)
    raise NotImplementedError(f"cannot write WKB type {gtype} to shapefile")


def _close(r: np.ndarray) -> np.ndarray:
    if len(r) and not (r[0] == r[-1]).all():
        return np.vstack([r, r[:1]])
    return r


def _bbox_bytes(pts: np.ndarray) -> bytes:
    return struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                       pts[:, 0].max(), pts[:, 1].max())


def _parts_bytes(parts: list[np.ndarray]) -> bytes:
    allpts = np.vstack(parts)
    offs = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<i4")
    return (_bbox_bytes(allpts) + struct.pack("<2i", len(parts), len(allpts))
            + offs.tobytes() + allpts.astype("<f8").tobytes())


# ---------------------------------------------------------------- .shp/.shx


def _shp_header(stype: int, bbox, length_bytes: int) -> bytes:
    h = struct.pack(">i5i", SHP_MAGIC, 0, 0, 0, 0, 0)
    h += struct.pack(">i", length_bytes // 2)
    h += struct.pack("<2i", SHP_VERSION, stype)
    h += struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3], 0, 0, 0, 0)
    return h


def write_shp_bytes(wkbs: list[bytes | None]) -> tuple[bytes, bytes]:
    """-> (.shp bytes, .shx bytes) for one record sequence."""
    records: list[bytes] = []
    stype = S_NULL
    bbox = [np.inf, np.inf, -np.inf, -np.inf]
    for wkb in wkbs:
        st, content = _wkb_to_record(wkb)
        if st != S_NULL:
            stype = st
        body = struct.pack("<i", st) + content
        records.append(body)
        if st != S_NULL and len(content) >= 16:
            if st == S_POINT:
                x, y = struct.unpack("<2d", content[:16])
                x0, y0, x1, y1 = x, y, x, y
            else:
                x0, y0, x1, y1 = struct.unpack("<4d", content[:32])
            bbox = [min(bbox[0], x0), min(bbox[1], y0),
                    max(bbox[2], x1), max(bbox[3], y1)]
    if not np.isfinite(bbox[0]):
        bbox = [0.0, 0.0, 0.0, 0.0]
    shp = bytearray()
    shx = bytearray()
    off = 100  # bytes
    for i, body in enumerate(records):
        shp += struct.pack(">2i", i + 1, len(body) // 2) + body
        shx += struct.pack(">2i", off // 2, len(body) // 2)
        off += 8 + len(body)
    shp_b = _shp_header(stype, bbox, 100 + len(shp)) + bytes(shp)
    shx_b = _shp_header(stype, bbox, 100 + len(shx)) + bytes(shx)
    return shp_b, shx_b


def read_shx_offsets(shx: bytes) -> np.ndarray:
    """-> (N, 2) int64 array of (byte offset, content byte length)."""
    body = np.frombuffer(shx[100:], dtype=">i4").astype(np.int64).reshape(-1, 2)
    return body * 2


def decode_shp_records(shp: bytes, offsets: np.ndarray) -> list[bytes | None]:
    """Decode the records named by (offset, length) rows (from .shx)."""
    mv = memoryview(shp)
    out = []
    for off, ln in offsets:
        out.append(_record_to_wkb(mv[int(off) + 8:int(off) + 8 + int(ln)]))
    return out


# ---------------------------------------------------------------- .dbf


def write_dbf_bytes(table: pa.Table) -> bytes:
    """dBASE III memo-less file for the attribute columns (OGR field-type
    mapping: string -> C, int -> N(18,0), float -> N(24,15), bool -> L)."""
    fields = []  # (name, type, length, decimals, fmt fn)
    cols = []
    for name in table.schema.names:
        col = table.column(name)
        t = col.type
        nm = name[:10]
        if pa.types.is_integer(t):
            fields.append((nm, b"N", 18, 0))
            cols.append([("%18d" % v.as_py()) if v.is_valid else " " * 18 for v in col])
        elif pa.types.is_floating(t):
            fields.append((nm, b"N", 24, 15))
            cols.append([("%24.15f" % v.as_py())[:24] if v.is_valid else " " * 24
                         for v in col])
        elif pa.types.is_boolean(t):
            fields.append((nm, b"L", 1, 0))
            cols.append([("T" if v.as_py() else "F") if v.is_valid else "?" for v in col])
        else:
            vals = [("" if not v.is_valid else str(v.as_py())) for v in col]
            width = max(1, min(254, max((len(s.encode("latin-1", "replace")) for s in vals),
                                        default=1)))
            fields.append((nm, b"C", width, 0))
            cols.append([s.encode("latin-1", "replace")[:width].ljust(width).decode("latin-1")
                         for s in vals])
    nrec = table.num_rows
    rec_len = 1 + sum(f[2] for f in fields)
    hdr_len = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 0x03, 126, 1, 1, nrec, hdr_len, rec_len)
    for nm, ft, ln, dec in fields:
        out += struct.pack("<11s1sIBB14x", nm.encode("latin-1"), ft, 0, ln, dec)
    out += b"\x0d"
    for i in range(nrec):
        out += b" "  # not deleted
        for c in cols:
            out += c[i].encode("latin-1", "replace")
    out += b"\x1a"
    return bytes(out)


def read_dbf_bytes(dbf: bytes, rows: np.ndarray | None = None) -> pa.Table:
    """-> Arrow table (C -> string, N/F -> int64 or float64 by decimals,
    L -> bool).  `rows` selects record indices (for range reads)."""
    nrec, hdr_len, rec_len = struct.unpack("<IHH", dbf[4:12])
    fields = []
    p = 32
    while dbf[p] != 0x0D:
        name = dbf[p:p + 11].split(b"\0")[0].decode("latin-1")
        ftype = chr(dbf[p + 11])
        ln, dec = dbf[p + 16], dbf[p + 17]
        fields.append((name, ftype, ln, dec))
        p += 32
    base = hdr_len
    idx = np.arange(nrec) if rows is None else np.asarray(rows)
    cols: dict[str, list] = {f[0]: [] for f in fields}
    for i in idx:
        r = dbf[base + int(i) * rec_len: base + (int(i) + 1) * rec_len]
        q = 1
        for name, ftype, ln, dec in fields:
            raw = r[q:q + ln]
            q += ln
            s = raw.decode("latin-1").strip()
            if ftype in ("N", "F"):
                if not s:
                    cols[name].append(None)
                elif dec == 0 and ftype == "N" and "." not in s:
                    cols[name].append(int(s))
                else:
                    cols[name].append(float(s))
            elif ftype == "L":
                cols[name].append(None if s in ("", "?") else s in ("T", "t", "Y", "y"))
            else:
                cols[name].append(s)
    arrays = {}
    for name, ftype, ln, dec in fields:
        if ftype in ("N", "F"):
            ty = pa.int64() if (dec == 0 and ftype == "N") else pa.float64()
            arrays[name] = pa.array(cols[name], ty)
        elif ftype == "L":
            arrays[name] = pa.array(cols[name], pa.bool_())
        else:
            arrays[name] = pa.array(cols[name], pa.string())
    return pa.table(arrays) if arrays else pa.table({})


# ---------------------------------------------------------------- dataset IO


def read_shapefile(base: str, *, records_per_block: int = 65536):
    """base (without extension, or the .shp path) -> ray.data.Dataset with
    columns fid:int64, wkb:binary (+ DBF attribute columns).  The .shx
    index is split driver-side into record ranges; each Ray task decodes
    only its range of the .shp/.dbf."""
    import ray.data as rd

    if base.endswith(".shp"):
        base = base[:-4]
    with open(base + ".shx", "rb") as f:
        offsets = read_shx_offsets(f.read())
    n = len(offsets)
    has_dbf = os.path.exists(base + ".dbf")
    dbf_hdr = b""
    if has_dbf:
        with open(base + ".dbf", "rb") as f:
            head = f.read(32)
            hdr_len = struct.unpack("<H", head[8:10])[0]
            f.seek(0)
            dbf_hdr = f.read(hdr_len)
    # one item per record range, carrying ONLY its slice of the index —
    # tasks seek straight to their byte range (no whole-file reads)
    ranges = []
    for s in range(0, max(n, 1), records_per_block):
        e = min(s + records_per_block, n)
        sl = offsets[s:e]
        ranges.append({"start": s, "stop": e,
                       "offs": sl[:, 0].tolist(), "lens": sl[:, 1].tolist()})

    def load(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            start, stop = row["start"], row["stop"]
            offs = np.asarray(row["offs"], dtype=np.int64)
            lens = np.asarray(row["lens"], dtype=np.int64)
            rows = np.arange(start, stop)
            if len(offs):
                byte0 = int(offs[0])
                byte1 = int(offs[-1]) + 8 + int(lens[-1])
                with open(base + ".shp", "rb") as f:
                    f.seek(byte0)
                    shp = f.read(byte1 - byte0)
                rel = np.stack([offs - byte0, lens], axis=1)
                wkbs = decode_shp_records(shp, rel)
            else:
                wkbs = []
            t = pa.table({"fid": pa.array(rows, pa.int64()),
                          "wkb": pa.array(wkbs, pa.binary())})
            if has_dbf and len(rows):
                nrec0, hdr_len, rec_len = struct.unpack("<IHH", dbf_hdr[4:12])
                with open(base + ".dbf", "rb") as f:
                    f.seek(hdr_len + start * rec_len)
                    body = f.read((stop - start) * rec_len)
                # re-head the slice so the record decoder sees rows 0..k
                patched = (dbf_hdr[:4] + struct.pack("<I", stop - start)
                           + dbf_hdr[8:]) + body
                attrs = read_dbf_bytes(patched)
                for name in attrs.schema.names:
                    t = t.append_column(name, attrs.column(name))
            outs.append(t)
        return pa.concat_tables(outs)

    return rd.from_items(ranges).map_batches(load, batch_format="pyarrow")


def read_prj(base: str):
    """.prj sidecar (WKT1) -> '+proj=…' string, or None when absent or
    the projection family is unsupported (crs_wkt.wkt_to_proj)."""
    if base.endswith(".shp"):
        base = base[:-4]
    try:
        with open(base + ".prj") as f:
            wkt = f.read()
    except OSError:
        return None
    from gdal_ray.crs_wkt import wkt_to_proj

    try:
        return wkt_to_proj(wkt)
    except (NotImplementedError, ValueError):
        return None


def write_shapefile(table: pa.Table, base: str, *, geometry_col: str = "wkb",
                    epsg: int | None = None) -> None:
    """Single-file sink (.shp/.shx/.dbf [+ .prj]), atomic tmp+rename per
    member; ``epsg`` writes the WKT1 sidecar (crs_wkt.epsg_to_wkt)."""
    if base.endswith(".shp"):
        base = base[:-4]
    wkbs = [v.as_py() if v.is_valid else None for v in table.column(geometry_col)]
    shp, shx = write_shp_bytes(wkbs)
    attrs = table.drop_columns([geometry_col])
    dbf = write_dbf_bytes(attrs)
    members = [(".shp", shp), (".shx", shx), (".dbf", dbf)]
    if epsg is not None:
        from gdal_ray.crs_wkt import epsg_to_wkt

        members.append((".prj", epsg_to_wkt(epsg).encode("ascii")))
    for ext, data in members:
        tmp = base + ext + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, base + ext)


def write_shapefile_parts(ds, out_dir: str, *, geometry_col: str = "wkb") -> int:
    """Scale path: one shapefile per block, content-addressed names,
    atomic publish.  Returns the number of parts written."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"part": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        key = hashlib.sha1(b.column(geometry_col).combine_chunks()
                           .buffers()[-1].to_pybytes()).hexdigest()[:16]
        write_shapefile(b, os.path.join(out_dir, f"part-{key}"),
                        geometry_col=geometry_col)
        return pa.table({"part": pa.array([f"part-{key}"], pa.string()),
                         "rows": pa.array([b.num_rows], pa.int64())})

    parts = ds.map_batches(sink, batch_format="pyarrow").to_pandas()
    return int(len(parts))
