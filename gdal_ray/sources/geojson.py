"""GeoJSON / GeoJSONSeq vector source + sink — the ogr2ogr ETL surface.

Reference semantics: the OGR GeoJSON driver
(ogr/ogrsf_frmts/geojson/ogrgeojsonreader.cpp — FeatureCollection →
features with geometry + properties) and the streaming GeoJSONSeq driver
(ogrgeojsonseqdriver.cpp — one feature JSON per line, RFC 8142 style).
Geometry converts to/from the engine's WKB column; properties become
Arrow columns (union of keys, nulls where absent).

Scale notes: GeoJSONSeq is the scale path — `read_geojsonseq` is
`ray.data.read_text` (parallel line splitting over block ranges) followed
by a per-batch parse, and `write_geojsonseq` streams one `.geojsonl` part
file per block with atomic tmp+rename publish (resume = skip nothing;
parts are content-addressed by block hash, so re-runs overwrite
identically).  Whole-file FeatureCollections cannot be split below file
granularity — `read_geojson` parallelizes across files.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa

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


def geometry_to_wkb(geom: dict) -> bytes:
    """GeoJSON geometry object -> WKB (2-D; same subset the WKB codec
    covers: Point/LineString/Polygon + Multi*)."""
    t = geom["type"]
    if t not in ("Point", "LineString", "Polygon", "MultiPoint",
                 "MultiLineString", "MultiPolygon"):
        raise ValueError(f"unsupported GeoJSON geometry type {t!r}")
    c = geom["coordinates"]
    if t == "Point":
        return encode_point(float(c[0]), float(c[1]))
    if t == "LineString":
        return encode_linestring(np.asarray(c, dtype=np.float64))
    if t == "Polygon":
        return encode_polygon([np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPoint":
        return encode_multipoint(np.asarray(c, dtype=np.float64))
    if t == "MultiLineString":
        return encode_multilinestring([np.asarray(l, dtype=np.float64) for l in c])
    return encode_multipolygon(
        [[np.asarray(r, dtype=np.float64) for r in p] for p in c])


def wkb_to_geometry(wkb: bytes) -> dict:
    """WKB -> GeoJSON geometry object (inverse of geometry_to_wkb)."""
    gtype, payload = decode_wkb(wkb)
    if gtype == GeomType.POINT:
        return {"type": "Point", "coordinates": [float(payload[0]), float(payload[1])]}
    if gtype == GeomType.LINESTRING:
        return {"type": "LineString", "coordinates": payload.tolist()}
    if gtype == GeomType.POLYGON:
        return {"type": "Polygon", "coordinates": [r.tolist() for r in payload]}
    if gtype == GeomType.MULTIPOINT:
        return {"type": "MultiPoint",
                "coordinates": [p.tolist() for _, p in payload]}
    if gtype == GeomType.MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [p.tolist() for _, p in payload]}
    if gtype == GeomType.MULTIPOLYGON:
        return {"type": "MultiPolygon",
                "coordinates": [[r.tolist() for r in rings] for _, rings in payload]}
    raise ValueError(f"unsupported WKB type {gtype}")


def _features_to_table(feats: list[dict]) -> pa.Table:
    """Feature dicts -> Arrow batch: wkb binary + one column per property
    key (union of keys; absent -> null), like the OGR driver's schema
    detection pass."""
    keys: list[str] = []
    seen = set()
    for f in feats:
        for k in (f.get("properties") or {}):
            if k not in seen:
                seen.add(k)
                keys.append(k)
    cols: dict[str, list] = {"wkb": []}
    for k in keys:
        cols[k] = []
    for f in feats:
        cols["wkb"].append(geometry_to_wkb(f["geometry"]))
        props = f.get("properties") or {}
        for k in keys:
            cols[k].append(props.get(k))
    out = {"wkb": pa.array(cols["wkb"], pa.binary())}
    for k in keys:
        out[k] = pa.array(cols[k])
    return pa.table(out)


def read_geojson(paths) -> "ray.data.Dataset":
    """Read FeatureCollection file(s) — one parse task per file (the
    format is not line-splittable; use GeoJSONSeq for big layers)."""
    import ray.data

    def parse(row: dict) -> pa.Table:
        doc = json.loads(bytes(row["bytes"]).decode("utf-8"))
        if doc.get("type") != "FeatureCollection":
            raise ValueError("expected a GeoJSON FeatureCollection")
        return _features_to_table(doc["features"])

    return ray.data.read_binary_files(paths).map_batches(
        lambda b: pa.concat_tables(
            [parse({"bytes": v}) for v in b.column("bytes").to_pylist()],
            promote_options="default"),
        batch_format="pyarrow", batch_size=1,
    )


def read_geojsonseq(paths) -> "ray.data.Dataset":
    """Read newline-delimited GeoJSON features (GeoJSONSeq / RFC 8142,
    optional leading RS char) — splits in parallel like any text source."""
    import ray.data

    def parse(b: pa.Table) -> pa.Table:
        feats = []
        for line in b.column("text").to_pylist():
            line = line.strip().lstrip("\x1e")
            if line:
                feats.append(json.loads(line))
        if not feats:
            return pa.schema([("wkb", pa.binary())]).empty_table()
        return _features_to_table(feats)

    return ray.data.read_text(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=4096)


def write_geojsonseq(ds, out_dir: str, *, geometry_col: str = "wkb") -> int:
    """Stream a Dataset with a WKB geometry column to a directory of
    `part-<hash>.geojsonl` files (one per block, atomic tmp+rename — the
    same publish discipline as the tile sink).  All non-geometry columns
    become feature properties.  Returns the number of features written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        props_cols = [c for c in b.column_names if c != geometry_col]
        lines = []
        for i in range(b.num_rows):
            feat = {
                "type": "Feature",
                "geometry": wkb_to_geometry(b.column(geometry_col)[i].as_py()),
                "properties": {c: b.column(c)[i].as_py() for c in props_cols},
            }
            lines.append(json.dumps(feat, separators=(",", ":")))
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        name = hashlib.sha256(payload).hexdigest()[:16]
        final = os.path.join(out_dir, f"part-{name}.geojsonl")
        tmp = f"{final}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, final)
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    counts = ds.map_batches(write_batch, batch_format="pyarrow").to_pandas()
    return int(counts["n"].sum()) if len(counts) else 0
