"""Resumable partitioned sink: manifest skip, lineage invalidation,
atomicity (state/manifest.py — reference resume idiom
gdalalg_raster_tile.cpp:377-382, gdal2tiles --resume)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_ray.state import manifest as mf


@pytest.fixture
def small_ds(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "cell": pa.array([0, 0, 1, 1, 2], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    return rd.from_arrow(t)


def test_write_then_resume_skips(tmp_path, small_ds, ray_session):
    out = str(tmp_path / "out")
    lin = mf.lineage_hash("pipeline-v1", "input-spec")
    res1 = mf.write_partitioned(small_ds, out, "cell", lin)
    assert sorted(res1["partition"]) == ["0", "1", "2"]
    assert not res1["skipped"].any()
    assert mf.completed_partitions(out, lin) == {"0", "1", "2"}
    # all data present
    got = pd.concat(
        [pd.read_parquet(os.path.join(out, f"part-{k}", "data.parquet")) for k in "012"]
    )
    assert len(got) == 5

    # drop one partition's manifest → only that partition is rewritten
    os.remove(os.path.join(out, "_manifest", "part-1.json"))
    res2 = mf.write_partitioned(small_ds, out, "cell", lin)
    r = res2.set_index("partition")
    assert bool(r.loc["0", "skipped"]) and bool(r.loc["2", "skipped"])
    assert not bool(r.loc["1", "skipped"])
    assert mf.completed_partitions(out, lin) == {"0", "1", "2"}


def test_lineage_change_invalidates(tmp_path, small_ds, ray_session):
    out = str(tmp_path / "out")
    lin1 = mf.lineage_hash("pipeline-v1")
    mf.write_partitioned(small_ds, out, "cell", lin1)
    lin2 = mf.lineage_hash("pipeline-v2")
    assert mf.completed_partitions(out, lin2) == set()
    res = mf.write_partitioned(small_ds, out, "cell", lin2)
    assert not res["skipped"].any()  # everything rewritten under new lineage


def test_manifest_records_metrics(tmp_path, small_ds, ray_session):
    out = str(tmp_path / "out")
    lin = mf.lineage_hash("x")
    mf.write_partitioned(small_ds, out, "cell", lin)
    with open(os.path.join(out, "_manifest", "part-0.json")) as f:
        m = json.load(f)
    assert m["rows_out"] == 2
    assert m["bytes_out"] > 0
    assert m["lineage_hash"] == lin
    # no stray tmp files (atomic rename)
    for root, _, files in os.walk(out):
        assert not [f for f in files if f.endswith(".tmp")]


def test_corrupt_manifest_not_complete(tmp_path, small_ds, ray_session):
    out = str(tmp_path / "out")
    lin = mf.lineage_hash("x")
    mf.write_partitioned(small_ds, out, "cell", lin)
    p = os.path.join(out, "_manifest", "part-0.json")
    with open(p, "w") as f:
        f.write("{not json")
    assert "0" not in mf.completed_partitions(out, lin)


def test_read_images_parquet_fallback(ray_session, tmp_path):
    from gdal_ray.sources import read_images
    from gdal_ray.synth import make_image_batch

    t = make_image_batch({"id": np.arange(8)})
    import pyarrow.parquet as pq

    path = str(tmp_path / "imgs.parquet")
    pq.write_table(t, path)
    ds = read_images(path, columns=["image_id", "w", "h"])
    df = ds.to_pandas()
    assert len(df) == 8 and list(df.columns) == ["image_id", "w", "h"]
