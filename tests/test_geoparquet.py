"""GeoParquet driver (sources/geoparquet.py) — ogr/ogrsf_frmts/parquet:
'geo' file metadata, per-file bboxes, footer-only bbox pruning."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources.geojson import geometry_to_wkb
from gdal_ray.sources.geoparquet import (
    geoparquet_metadata,
    read_geoparquet,
    write_geoparquet,
    write_geoparquet_table,
)


def _pts(x0, n=10):
    return pa.table({
        "wkb": pa.array([geometry_to_wkb(
            {"type": "Point", "coordinates": [x0 + float(i), float(i)]})
            for i in range(n)], pa.binary()),
        "v": pa.array(list(range(n)), pa.int64()),
    })


def test_metadata_shape(tmp_path):
    p = str(tmp_path / "a.parquet")
    write_geoparquet_table(_pts(100.0), p)
    doc = geoparquet_metadata(p)
    assert doc["version"] == "1.1.0"
    assert doc["primary_column"] == "wkb"
    col = doc["columns"]["wkb"]
    assert col["encoding"] == "WKB"
    assert col["geometry_types"] == ["Point"]
    assert col["bbox"] == [100.0, 0.0, 109.0, 9.0]


def test_dataset_roundtrip_and_prune(ray_session, tmp_path):
    import ray.data as rd

    t1, t2 = _pts(0.0), _pts(1000.0)
    ds = rd.from_arrow([t1, t2])
    out = str(tmp_path / "gp")
    assert write_geoparquet(ds, out) == 2

    full = read_geoparquet(out).to_pandas()
    assert len(full) == 20

    pruned = read_geoparquet(out, bbox=(995.0, -1.0, 1200.0, 20.0))
    got = pruned.to_pandas()
    assert len(got) == 10  # the far file only — other pruned by footer bbox
    assert len(read_geoparquet(out, bbox=(5000, 5000, 6000, 6000))
               .to_pandas()) == 0


def test_rejects_plain_parquet(tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "plain.parquet")
    pq.write_table(pa.table({"a": [1]}), p)
    with pytest.raises(ValueError):
        geoparquet_metadata(p)
