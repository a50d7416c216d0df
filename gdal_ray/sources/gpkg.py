"""GeoPackage (OGC 1.3) vector driver over stdlib sqlite3 — no GDAL.

Reference semantics: ogr/ogrsf_frmts/gpkg (ogrgeopackagedatasource.cpp
metadata-table management, ogrgeopackagelayer.cpp feature IO,
ogrgeopackagetablelayer.cpp GeoPackageBinary codec).  A GeoPackage is an
SQLite database with required metadata tables (`gpkg_spatial_ref_sys`,
`gpkg_contents`, `gpkg_geometry_columns`) and one SQLite table per
feature layer whose geometry column stores a *GeoPackageBinary* blob:

    byte[0:2]  = b"GP" magic
    byte[2]    = version (0 = GeoPackage 1.x)
    byte[3]    = flags: bit0 header byte order (1 = LE), bits1-3 envelope
                 indicator (0 none, 1 xy, 2 xyz, 3 xym, 4 xyzm),
                 bit4 empty-geometry, bit5 extended type
    int32      = srs_id (header byte order)
    double[k]  = envelope per indicator (0/4/6/6/8 values)
    bytes      = standard ISO WKB

Geometry maps to the engine's `wkb:binary` column; the SQLite `fid`
INTEGER PRIMARY KEY becomes `fid:int64` (OGR's FID mapping).  The
reference's `gpkg_ogr_contents` feature-count side table is also
maintained (ogrgeopackagetablelayer.cpp CreateFeatureCountTriggers
idiom, minus triggers — we write the final count once).

Scale shape: SQLite is a single-writer file format, so `write_gpkg` is
a driver-side sink for final/small layers (the partitioned scale path is
one .gpkg per block via `write_gpkg_parts`, content-addressed + atomic
rename — same pattern as the shapefile driver).  Reading scales: rowid
ranges are enumerated driver-side from min/max(fid) and each Ray task
opens the database read-only/immutable and SELECTs only its range, so a
billion-row layer reads as parallel as its row count.
"""

from __future__ import annotations

import hashlib
import os
import sqlite3
import struct

import numpy as np
import pyarrow as pa

from gdal_ray.geometry.wkb import decode_wkb, polygon_rings  # noqa: F401

_WGS84_WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
)


# ------------------------------------------------------------ binary codec


def encode_gpkg_blob(wkb: bytes | None, srs_id: int = 4326) -> bytes | None:
    """WKB -> GeoPackageBinary with an xy envelope (indicator 1, LE)."""
    if wkb is None:
        return None
    env = _wkb_envelope(wkb)
    if env is None:  # empty geometry: no envelope, empty flag set
        flags = 0x01 | 0x10
        return b"GP\x00" + bytes([flags]) + struct.pack("<i", srs_id) + wkb
    flags = 0x01 | (1 << 1)
    return (
        b"GP\x00"
        + bytes([flags])
        + struct.pack("<i", srs_id)
        + struct.pack("<4d", env[0], env[1], env[2], env[3])
        + wkb
    )


_ENV_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def decode_gpkg_blob(blob: bytes | None) -> tuple[int, bytes | None]:
    """GeoPackageBinary -> (srs_id, WKB or None for empty)."""
    if blob is None:
        return 0, None
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob (missing GP magic)")
    flags = blob[3]
    bo = "<" if (flags & 0x01) else ">"
    srs_id = struct.unpack(bo + "i", blob[4:8])[0]
    ind = (flags >> 1) & 0x07
    if ind not in _ENV_DOUBLES:
        raise ValueError(f"invalid envelope contents indicator {ind}")
    off = 8 + 8 * _ENV_DOUBLES[ind]
    if flags & 0x10:  # empty geometry
        return srs_id, None
    return srs_id, bytes(blob[off:])


def _wkb_envelope(wkb: bytes) -> tuple[float, float, float, float] | None:
    """(minx, maxx, miny, maxy) — GeoPackage envelope ordering."""
    pts = _all_points(wkb)
    if pts is None or len(pts) == 0:
        return None
    return (
        float(pts[:, 0].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].min()),
        float(pts[:, 1].max()),
    )


def _all_points(wkb: bytes) -> np.ndarray | None:
    gtype, payload = decode_wkb(wkb)
    from gdal_ray.geometry.wkb import GeomType

    if gtype == GeomType.POINT:
        return np.asarray([payload], np.float64)
    if gtype == GeomType.LINESTRING:
        return np.asarray(payload, np.float64)
    if gtype == GeomType.POLYGON:
        return np.vstack([np.asarray(r, np.float64) for r in payload]) if payload else None
    if gtype in (GeomType.MULTIPOINT, GeomType.MULTILINESTRING):
        parts = [np.atleast_2d(np.asarray(p, np.float64)) for _, p in payload]
        return np.vstack(parts) if parts else None
    if gtype == GeomType.MULTIPOLYGON:
        rings = [np.asarray(r, np.float64) for _, rs in payload for r in rs]
        return np.vstack(rings) if rings else None
    raise NotImplementedError(f"envelope for WKB type {gtype}")


# ------------------------------------------------------------ metadata DDL

_DDL = [
    """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""",
    """CREATE TABLE IF NOT EXISTS gpkg_contents (
        table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
        srs_id INTEGER)""",
    """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
        table_name TEXT NOT NULL, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL,
        PRIMARY KEY (table_name, column_name))""",
    """CREATE TABLE IF NOT EXISTS gpkg_ogr_contents (
        table_name TEXT NOT NULL PRIMARY KEY, feature_count INTEGER)""",
]

_SRS_ROWS = [
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
    ("WGS 84 geodetic", 4326, "EPSG", 4326, _WGS84_WKT, None),
]

_GEOM_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON",
    4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON",
}


def _arrow_to_sqlite_type(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_integer(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    return "TEXT"


def _sqlite_to_arrow_type(decl: str) -> pa.DataType:
    d = (decl or "").upper()
    if d.startswith("BOOL"):
        return pa.bool_()
    if "INT" in d:
        return pa.int64()
    if d in ("REAL", "DOUBLE", "FLOAT") or d.startswith("DOUBLE"):
        return pa.float64()
    if d == "BLOB":
        return pa.binary()
    return pa.string()


# ------------------------------------------------------------ write


def write_gpkg(
    table: pa.Table,
    path: str,
    *,
    layer: str = "layer",
    geometry_col: str = "wkb",
    srs_id: int = 4326,
) -> None:
    """Single-file sink: metadata tables + one feature table, atomic
    tmp+rename.  A `fid` column (if present) becomes the INTEGER PRIMARY
    KEY; otherwise fids are 1..N in row order (OGR numbering)."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    con = sqlite3.connect(tmp)
    try:
        cur = con.cursor()
        cur.execute("PRAGMA application_id = 0x47504B47")  # "GPKG"
        cur.execute("PRAGMA user_version = 10300")  # GeoPackage 1.3
        for ddl in _DDL:
            cur.execute(ddl)
        cur.executemany(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            _SRS_ROWS,
        )
        if srs_id not in (r[1] for r in _SRS_ROWS):
            # real WKT1 definition when the code is in the emit family
            # (crs_wkt); the code-only fallback matches OGR's behavior
            # for definitions it cannot resolve
            try:
                from gdal_ray.crs_wkt import epsg_to_wkt

                definition = epsg_to_wkt(srs_id)
            except NotImplementedError:
                definition = f"EPSG:{srs_id}"
            cur.execute(
                "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
                (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id, definition, None),
            )

        has_geom = geometry_col in table.schema.names
        attr_names = [
            n for n in table.schema.names if n not in (geometry_col, "fid")
        ]
        cols_sql = ["fid INTEGER PRIMARY KEY AUTOINCREMENT"]
        if has_geom:
            cols_sql.append(f'"{geometry_col}" BLOB')
        for n in attr_names:
            cols_sql.append(
                f'"{n}" {_arrow_to_sqlite_type(table.schema.field(n).type)}'
            )
        cur.execute(f'CREATE TABLE "{layer}" ({", ".join(cols_sql)})')

        fids = (
            [v.as_py() for v in table.column("fid")]
            if "fid" in table.schema.names
            else list(range(1, table.num_rows + 1))
        )
        geom_types: set[int] = set()
        env = [np.inf, np.inf, -np.inf, -np.inf]  # minx,miny,maxx,maxy
        blobs: list[bytes | None] = []
        if has_geom:
            for v in table.column(geometry_col):
                wkb = v.as_py() if v.is_valid else None
                blobs.append(encode_gpkg_blob(wkb, srs_id))
                if wkb is not None:
                    gt, _ = decode_wkb(wkb)
                    geom_types.add(int(gt))
                    e = _wkb_envelope(wkb)
                    if e is not None:
                        env = [
                            min(env[0], e[0]), min(env[1], e[2]),
                            max(env[2], e[1]), max(env[3], e[3]),
                        ]
        attr_cols = [
            [v.as_py() if v.is_valid else None for v in table.column(n)]
            for n in attr_names
        ]
        n_binds = 1 + (1 if has_geom else 0) + len(attr_names)
        sql = (
            f'INSERT INTO "{layer}" VALUES ({",".join("?" * n_binds)})'
        )
        rows = []
        for i in range(table.num_rows):
            r = [fids[i]]
            if has_geom:
                r.append(blobs[i])
            r.extend(c[i] for c in attr_cols)
            rows.append(tuple(r))
        cur.executemany(sql, rows)

        if len(geom_types) == 1:
            gname = _GEOM_NAMES.get(next(iter(geom_types)), "GEOMETRY")
        else:
            gname = "GEOMETRY"
        if has_geom:
            cur.execute(
                "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
                (layer, geometry_col, gname, srs_id),
            )
        have_env = np.isfinite(env[0])
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (
                layer,
                "features" if has_geom else "attributes",
                layer,
                env[0] if have_env else None,
                env[1] if have_env else None,
                env[2] if have_env else None,
                env[3] if have_env else None,
                srs_id,
            ),
        )
        cur.execute(
            "INSERT INTO gpkg_ogr_contents VALUES (?,?)",
            (layer, table.num_rows),
        )
        con.commit()
    finally:
        con.close()
    os.replace(tmp, path)


def write_gpkg_parts(ds, out_dir: str, *, geometry_col: str = "wkb",
                     layer: str = "layer", srs_id: int = 4326) -> int:
    """Scale path: one .gpkg per block, content-addressed names, atomic
    publish.  Returns the number of parts written."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"part": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        key = hashlib.sha1(
            b.column(geometry_col).combine_chunks().buffers()[-1].to_pybytes()
            if geometry_col in b.schema.names
            else str(b.to_pydict()).encode()
        ).hexdigest()[:16]
        name = f"part-{key}.gpkg"
        write_gpkg(b, os.path.join(out_dir, name),
                   layer=layer, geometry_col=geometry_col, srs_id=srs_id)
        return pa.table({"part": pa.array([name], pa.string()),
                         "rows": pa.array([b.num_rows], pa.int64())})

    parts = ds.map_batches(sink, batch_format="pyarrow").to_pandas()
    return int(len(parts))


# ------------------------------------------------------------ read


def list_layers(path: str) -> list[dict]:
    """-> [{name, geometry_col, geometry_type, srs_id, feature_count}]."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cur = con.cursor()
        out = []
        for (name,) in cur.execute(
            "SELECT table_name FROM gpkg_contents"
            " WHERE data_type IN ('features', 'attributes') ORDER BY table_name"
        ):
            g = cur.execute(
                "SELECT column_name, geometry_type_name, srs_id"
                " FROM gpkg_geometry_columns WHERE table_name = ?",
                (name,),
            ).fetchone()
            n = cur.execute(
                f'SELECT count(*) FROM "{name}"'
            ).fetchone()[0]
            out.append({
                "name": name,
                "geometry_col": g[0] if g else None,
                "geometry_type": g[1] if g else None,
                "srs_id": g[2] if g else None,
                "feature_count": n,
            })
        return out
    finally:
        con.close()


def _layer_schema(path: str, layer: str) -> list[tuple[str, str, bool]]:
    """-> [(column, declared sqlite type, is_pk)] via PRAGMA table_info."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return [
            (r[1], r[2], bool(r[5]))
            for r in con.execute(f'PRAGMA table_info("{layer}")')
        ]
    finally:
        con.close()


def read_gpkg(path: str, layer: str | None = None, *,
              rows_per_block: int = 65536):
    """-> ray.data.Dataset with columns fid:int64, wkb:binary (+ attribute
    columns).  fid ranges are enumerated driver-side; each Ray task opens
    the database read-only/immutable and SELECTs only its range."""
    import ray.data as rd

    layers = list_layers(path)
    if layer is None:
        if len(layers) != 1:
            raise ValueError(
                f"gpkg has {len(layers)} layers; pass layer= "
                f"({[l['name'] for l in layers]})"
            )
        meta = layers[0]
    else:
        match = [l for l in layers if l["name"] == layer]
        if not match:
            raise ValueError(f"layer {layer!r} not in {path}")
        meta = match[0]
    name, gcol = meta["name"], meta["geometry_col"]
    info = _layer_schema(path, name)
    pk = next((c for c, _, is_pk in info if is_pk), "rowid")
    attrs = [(c, d) for c, d, is_pk in info if not is_pk and c != gcol]

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo_hi = con.execute(
            f'SELECT min("{pk}"), max("{pk}") FROM "{name}"'
        ).fetchone()
    finally:
        con.close()
    lo, hi = (lo_hi[0] or 0), (lo_hi[1] if lo_hi[1] is not None else -1)
    ranges = [
        {"lo": s, "hi": min(s + rows_per_block - 1, hi)}
        for s in range(int(lo), int(hi) + 1, rows_per_block)
    ] or [{"lo": 0, "hi": -1}]

    sel_cols = [f'"{pk}"'] + ([f'"{gcol}"'] if gcol else []) \
        + [f'"{c}"' for c, _ in attrs]
    sel = (
        f'SELECT {", ".join(sel_cols)} FROM "{name}"'
        f' WHERE "{pk}" BETWEEN ? AND ? ORDER BY "{pk}"'
    )
    arrow_types = [(c, _sqlite_to_arrow_type(d)) for c, d in attrs]

    def load(batch: pa.Table) -> pa.Table:
        outs = []
        # immutable=1: no locking, safe concurrent readers
        con = sqlite3.connect(f"file:{path}?mode=ro&immutable=1", uri=True)
        try:
            for row in batch.to_pylist():
                rows = con.execute(sel, (row["lo"], row["hi"])).fetchall()
                fids = [r[0] for r in rows]
                cols: dict[str, pa.Array] = {
                    "fid": pa.array(fids, pa.int64())
                }
                k = 1
                if gcol:
                    wkbs = [decode_gpkg_blob(r[1])[1] for r in rows]
                    cols["wkb"] = pa.array(wkbs, pa.binary())
                    k = 2
                for j, (c, ty) in enumerate(arrow_types):
                    vals = [r[k + j] for r in rows]
                    if pa.types.is_boolean(ty):
                        vals = [None if v is None else bool(v) for v in vals]
                    cols[c] = pa.array(vals, ty)
                outs.append(pa.table(cols))
        finally:
            con.close()
        return pa.concat_tables(outs)

    return rd.from_items(ranges).map_batches(load, batch_format="pyarrow")
