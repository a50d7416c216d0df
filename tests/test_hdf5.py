"""HDF5 classic driver conformance (sources/hdf5.py vs the public HDF5
File Format Specification, v0 superblock).  Reference: frmts/hdf5 reads
the same wire format via libhdf5."""

import struct

import numpy as np
import pytest

from gdal_ray.sources.hdf5 import (
    MAGIC,
    read_hdf5,
    read_hdf5_meta,
    read_hdf5_var,
    write_hdf5,
)


def _sample():
    rng = np.random.default_rng(1)
    return {
        "temperature": rng.normal(280.0, 10.0, (40, 60)),
        "mask": (rng.random((40, 60)) > 0.5).astype(np.uint8),
        "levels": np.arange(17, dtype=np.int32),
        "f32grid": rng.normal(size=(8, 9, 3)).astype(np.float32),
    }


def test_wire_layout(tmp_path):
    """Spec anchors: signature, v0 superblock field offsets, B-tree /
    SNOD / HEAP signatures present."""
    p = str(tmp_path / "t.h5")
    write_hdf5(p, _sample())
    raw = open(p, "rb").read()
    assert raw[:8] == MAGIC
    assert raw[8] == 0                      # superblock version
    assert (raw[13], raw[14]) == (8, 8)     # offset/length sizes
    assert struct.unpack_from("<H", raw, 16)[0] == 4   # group leaf k
    eof = struct.unpack_from("<Q", raw, 40)[0]
    assert eof == len(raw)
    assert b"TREE" in raw and b"SNOD" in raw and b"HEAP" in raw


def test_roundtrip_all_dtypes(tmp_path):
    p = str(tmp_path / "t.h5")
    ds = _sample()
    write_hdf5(p, ds)
    m = read_hdf5_meta(p)
    assert set(m["datasets"]) == set(ds)
    for k, a in ds.items():
        got = read_hdf5_var(p, k)
        assert got.shape == a.shape and got.dtype == a.dtype
        np.testing.assert_array_equal(got, a)


def test_meta_headers_only(tmp_path):
    p = str(tmp_path / "t.h5")
    write_hdf5(p, _sample())
    m = read_hdf5_meta(p)
    d = m["datasets"]["temperature"]
    assert d["shape"] == (40, 60) and d["dtype"] == "<f8"
    assert d["nbytes"] == 40 * 60 * 8
    # contiguous extents are disjoint and inside the file
    spans = sorted((v["data_addr"], v["nbytes"]) for v in m["datasets"].values())
    import os

    for (a1, n1), (a2, _) in zip(spans, spans[1:]):
        assert a1 + n1 <= a2
    assert spans[-1][0] + spans[-1][1] <= os.path.getsize(p)


def test_ray_slab_read(tmp_path, ray_session):
    p = str(tmp_path / "t.h5")
    ds = _sample()
    write_hdf5(p, ds)
    rows = read_hdf5(p, "temperature", rows_per_block=16).take_all()
    rows.sort(key=lambda r: r["row0"])
    assert [r["n_rows"] for r in rows] == [16, 16, 8]
    got = np.frombuffer(b"".join(r["data"] for r in rows), "<f8").reshape(40, 60)
    np.testing.assert_array_equal(got, ds["temperature"])
    # all-dataset fan-out carries every name
    names = {r["name"] for r in read_hdf5(p).take_all()}
    assert names == set(ds)


def test_open_registry_and_info(tmp_path, ray_session):
    from gdal_ray.info import describe
    from gdal_ray.sources import open_raster

    p = str(tmp_path / "t.h5")
    write_hdf5(p, _sample())
    assert open_raster(p, var="levels").count() == 1
    d = describe(p)
    assert d["driver"] == "HDF5"
    assert d["datasets"]["f32grid"]["shape"] == [8, 9, 3]
    assert d["datasets"]["mask"]["dtype"] == "|u1"


def test_gates(tmp_path):
    p = str(tmp_path / "t.h5")
    with pytest.raises(ValueError, match="at least one"):
        write_hdf5(p, {})
    with pytest.raises(NotImplementedError, match="SNOD"):
        write_hdf5(p, {f"d{i}": np.zeros(2) for i in range(9)})
    write_hdf5(p, {"a": np.zeros((4, 4))})
    raw = bytearray(open(p, "rb").read())
    raw[8] = 2  # superblock v2
    bad = str(tmp_path / "bad.h5")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="superblock version 2"):
        read_hdf5_meta(bad)
