"""Zarr v2 driver conformance (sources/zarr.py vs the public v2 spec).

Reference: frmts/zarr (zarrv2group.cpp on-disk layout) — .zarray JSON +
C-order compressed chunk files, edge chunks stored full-size padded."""

import json
import os
import zlib

import numpy as np
import pytest

from gdal_ray.sources.zarr import (
    read_zarr,
    read_zarr_array,
    read_zarr_meta,
    write_zarr,
    write_zarr_tiles,
)


def test_roundtrip_uint8_zlib(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, size=(37, 53), dtype=np.uint8)
    p = str(tmp_path / "a.zarr")
    write_zarr(arr, p, chunks=(16, 16))
    assert (read_zarr_array(p) == arr).all()
    m = json.load(open(os.path.join(p, ".zarray")))
    assert m["zarr_format"] == 2 and m["chunks"] == [16, 16]
    assert m["compressor"]["id"] == "zlib"
    # edge chunks are stored FULL SIZE (v2 spec): decompressed size check
    raw = zlib.decompress(open(os.path.join(p, "2.3"), "rb").read())
    assert len(raw) == 16 * 16


def test_roundtrip_float64_raw_and_nan_fill(tmp_path):
    arr = np.arange(30, dtype="<f8").reshape(5, 6) * 0.5
    p = str(tmp_path / "f.zarr")
    write_zarr(arr, p, chunks=(4, 4), compressor=None, fill_value=np.nan)
    got = read_zarr_array(p)
    assert np.array_equal(got, arr)


def test_big_endian_dtype(tmp_path):
    arr = np.arange(12, dtype=">i4").reshape(3, 4)
    p = str(tmp_path / "be.zarr")
    write_zarr(arr, p, chunks=(2, 2))
    m = read_zarr_meta(p)
    assert m["dtype"] == ">i4"
    assert np.array_equal(read_zarr_array(p), arr)


def test_missing_chunk_reads_fill(tmp_path):
    arr = np.full((8, 8), 7, np.int32)
    p = str(tmp_path / "m.zarr")
    write_zarr(arr, p, chunks=(4, 4), fill_value=99)
    os.remove(os.path.join(p, "1.1"))
    got = read_zarr_array(p)
    assert (got[:4, :] == 7).all() and (got[4:, :4] == 7).all()
    assert (got[4:, 4:] == 99).all()


def test_dimension_separator_slash(tmp_path):
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    p = str(tmp_path / "s.zarr")
    write_zarr(arr, p, chunks=(2, 2), dimension_separator="/")
    assert os.path.exists(os.path.join(p, "0", "1"))
    assert np.array_equal(read_zarr_array(p), arr)


def test_unsupported_gates(tmp_path):
    arr = np.zeros((4, 4), np.uint8)
    p = str(tmp_path / "g.zarr")
    write_zarr(arr, p, chunks=(2, 2))
    m = json.load(open(os.path.join(p, ".zarray")))
    m["compressor"] = {"id": "blosc"}
    json.dump(m, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(NotImplementedError):
        read_zarr_meta(p)
    m["compressor"] = None
    m["order"] = "F"
    json.dump(m, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(NotImplementedError):
        read_zarr_meta(p)


def test_parallel_read_matches_array(ray_session, tmp_path):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 10_000, size=(50, 70)).astype("<i8")
    p = str(tmp_path / "r.zarr")
    write_zarr(arr, p, chunks=(16, 32))
    rows = read_zarr(p).to_pandas()
    assert len(rows) == 4 * 3
    out = np.zeros_like(arr)
    for _, r in rows.iterrows():
        blk = np.frombuffer(r["data"], dtype="<i8").reshape(r["h"], r["w"])
        out[r["cy"] * 16:r["cy"] * 16 + r["h"],
            r["cx"] * 32:r["cx"] * 32 + r["w"]] = blk
    assert np.array_equal(out, arr)


def test_parallel_tile_write(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, size=(32, 48), dtype=np.uint8)
    rows = {"cy": [], "cx": [], "data": []}
    for cy in range(2):
        for cx in range(3):
            rows["cy"].append(cy)
            rows["cx"].append(cx)
            rows["data"].append(
                np.ascontiguousarray(arr[cy * 16:(cy + 1) * 16,
                                         cx * 16:(cx + 1) * 16]).tobytes())
    t = pa.table({"cy": pa.array(rows["cy"], pa.int64()),
                  "cx": pa.array(rows["cx"], pa.int64()),
                  "data": pa.array(rows["data"], pa.binary())})
    p = str(tmp_path / "w.zarr")
    n = write_zarr_tiles(rd.from_arrow(t).repartition(3), p,
                         shape=(32, 48), chunks=(16, 16), dtype=np.uint8)
    assert n == 6
    assert np.array_equal(read_zarr_array(p), arr)


def test_tile_write_size_guard(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({"cy": pa.array([0], pa.int64()),
                  "cx": pa.array([0], pa.int64()),
                  "data": pa.array([b"short"], pa.binary())})
    with pytest.raises(Exception):
        write_zarr_tiles(rd.from_arrow(t), str(tmp_path / "bad.zarr"),
                         shape=(16, 16), chunks=(16, 16), dtype=np.uint8)
