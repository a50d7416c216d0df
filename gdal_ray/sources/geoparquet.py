"""GeoParquet sink/source — the reference's Parquet vector driver
(ogr/ogrsf_frmts/parquet, ogrparquetwriterlayer.cpp) writes the published
GeoParquet 1.1 file metadata: a ``geo`` key whose JSON names the primary
geometry column, its WKB encoding, geometry types, and bbox.

Write path is Ray-native: each task writes its own block as one parquet
file carrying that file's own exact bbox in the ``geo`` metadata (the
spec scopes metadata per file) — a resumable partitioned layout whose
per-file bboxes double as a tile index for pruned reads.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gdal_ray.sources.gpkg import _wkb_envelope

_WKB_TYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon",
                   4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon"}


def _geo_meta(table: pa.Table, geometry_col: str) -> bytes:
    envs, types = [], set()
    for v in table.column(geometry_col).to_pylist():
        if v is None:
            continue
        e = _wkb_envelope(v)
        if e is not None:
            envs.append(e)
        code = int.from_bytes(v[1:5], "little" if v[0] == 1 else "big")
        types.add(_WKB_TYPE_NAMES.get(code % 1000, "Unknown"))
    col: dict = {"encoding": "WKB", "geometry_types": sorted(types)}
    if envs:
        a = np.asarray(envs)  # _wkb_envelope order: (minx, maxx, miny, maxy)
        col["bbox"] = [float(a[:, 0].min()), float(a[:, 2].min()),
                       float(a[:, 1].max()), float(a[:, 3].max())]
    return json.dumps({"version": "1.1.0", "primary_column": geometry_col,
                       "columns": {geometry_col: col}}).encode()


def write_geoparquet_table(table: pa.Table, path: str,
                           *, geometry_col: str = "wkb") -> None:
    """One Arrow table -> one GeoParquet file (atomic tmp+rename)."""
    meta = dict(table.schema.metadata or {})
    meta[b"geo"] = _geo_meta(table, geometry_col)
    tmp = path + ".tmp"
    pq.write_table(table.replace_schema_metadata(meta), tmp)
    os.replace(tmp, path)


def write_geoparquet(ds, out_dir: str, *, geometry_col: str = "wkb") -> int:
    """Dataset -> directory of GeoParquet part files, one per block,
    each carrying its own exact bbox.  Returns files written."""
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_block(block: pa.Table, i: int) -> int:
        write_geoparquet_table(block, os.path.join(out_dir, f"part-{i:05d}.parquet"),
                               geometry_col=geometry_col)
        return 1

    refs = [write_block.remote(ref, i) for i, ref in
            enumerate(ds.to_arrow_refs())]
    return sum(ray.get(refs))


def geoparquet_metadata(path: str) -> dict:
    """Parse the ``geo`` file metadata (footer only, no row groups read)."""
    meta = pq.read_schema(path).metadata or {}
    if b"geo" not in meta:
        raise ValueError(f"{path}: no GeoParquet 'geo' metadata")
    return json.loads(meta[b"geo"])


def read_geoparquet(paths, *, bbox=None, geometry_col: str | None = None):
    """GeoParquet file(s)/dir -> Dataset.  With ``bbox``, files whose
    metadata bbox is disjoint are pruned BEFORE any row leaves storage
    (footer-only reads) — the per-file bboxes written above make the
    directory its own tile index."""
    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(".parquet"))
        else:
            files = [paths]
    else:
        files = list(paths)
    if bbox is not None:
        keep = []
        for f in files:
            doc = geoparquet_metadata(f)
            col = doc["columns"][geometry_col or doc["primary_column"]]
            b = col.get("bbox")
            if b is None or not (b[0] > bbox[2] or b[2] < bbox[0]
                                 or b[1] > bbox[3] or b[3] < bbox[1]):
                keep.append(f)
        files = keep
    if not files:
        return rd.from_items([])
    return rd.read_parquet(files).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
