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
    with pytest.raises(NotImplementedError, match="multi-LEVEL"):
        write_hdf5(p, {f"d{i:04d}": np.zeros(1) for i in range(2049)})
    write_hdf5(p, {"a": np.zeros((4, 4))})
    raw = bytearray(open(p, "rb").read())
    raw[8] = 2  # superblock v2
    bad = str(tmp_path / "bad.h5")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="superblock version 2"):
        read_hdf5_meta(bad)


# -------------------------------------------------------- chunked layout


def test_chunked_roundtrip_with_edge_padding(tmp_path):
    p = str(tmp_path / "c.h5")
    ds = _sample()  # leading dims 40 / 17 / 8: chunk_rows=16 leaves edges
    write_hdf5(p, ds, chunk_rows=16)
    m = read_hdf5_meta(p)
    for k, v in ds.items():
        d = m["datasets"][k]
        assert d["layout"] == "chunked"
        assert d["chunk_shape"][0] == min(16, v.shape[0])
        assert len(d["chunks"]) == -(-v.shape[0] // d["chunk_shape"][0])
        assert np.array_equal(read_hdf5_var(p, k), v)


@pytest.mark.parametrize("deflate,shuffle", [(6, False), (None, True), (6, True)])
def test_chunked_filters_roundtrip(tmp_path, deflate, shuffle):
    p = str(tmp_path / "f.h5")
    ds = _sample()
    write_hdf5(p, ds, chunk_rows=16, deflate=deflate, shuffle=shuffle)
    m = read_hdf5_meta(p)
    want_ids = ([2] if shuffle else []) + ([1] if deflate else [])
    assert [f[0] for f in m["datasets"]["temperature"]["filters"]] == want_ids
    for k, v in ds.items():
        assert np.array_equal(read_hdf5_var(p, k), v)


def test_deflate_actually_compresses(tmp_path):
    import os

    p1, p2 = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
    data = {"x": np.tile(np.arange(100, dtype=np.int32), (500, 1))}
    write_hdf5(p1, data, chunk_rows=64)
    write_hdf5(p2, data, chunk_rows=64, deflate=6)
    assert os.path.getsize(p2) < os.path.getsize(p1) / 4


def test_chunk_btree_wire(tmp_path):
    """Node-type-1 B-tree anchors: signature, type, entries, key layout."""
    p = str(tmp_path / "w.h5")
    arr = np.arange(24, dtype=np.int32).reshape(6, 4)
    write_hdf5(p, {"a": arr}, chunk_rows=4)
    raw = open(p, "rb").read()
    i = raw.index(b"TREE", raw.index(b"TREE") + 4)  # 2nd TREE = chunk btree
    sig, ntype, level, nused = struct.unpack_from("<4sBBH", raw, i)
    assert (ntype, level, nused) == (1, 0, 2)
    # first key: chunk nbytes = 4 rows * 4 cols * 4 B, mask 0, offset (0,0,0)
    nbytes, mask = struct.unpack_from("<II", raw, i + 24)
    offs = struct.unpack_from("<3Q", raw, i + 32)
    assert (nbytes, mask, offs) == (64, 0, (0, 0, 0))
    # second key starts at row 4
    k2 = i + 24 + (8 + 24) + 8
    assert struct.unpack_from("<3Q", raw, k2 + 8)[0] == 4


def test_chunked_ray_fanout(tmp_path, ray_session):
    p = str(tmp_path / "r.h5")
    ds = _sample()
    write_hdf5(p, ds, chunk_rows=16, deflate=4, shuffle=True)
    rows = sorted(read_hdf5(p, "temperature").take_all(),
                  key=lambda r: r["row0"])
    got = np.concatenate(
        [np.frombuffer(r["data"], np.float64).reshape(-1, 60) for r in rows])
    assert np.array_equal(got, ds["temperature"])
    # one slab per chunk, edge slab cropped to the dataset extent
    assert [r["n_rows"] for r in rows] == [16, 16, 8]


def test_chunked_gates(tmp_path):
    p = str(tmp_path / "g.h5")
    with pytest.raises(ValueError, match="chunk"):
        write_hdf5(p, {"a": np.zeros(4)}, deflate=6)
    with pytest.raises(NotImplementedError, match="chunks"):
        write_hdf5(p, {"a": np.zeros(10000)}, chunk_rows=1)


# ------------------------------------------------------- netCDF-4 flavor


def test_attrs_roundtrip(tmp_path):
    from gdal_ray.sources.hdf5 import read_hdf5_meta, write_hdf5

    p = str(tmp_path / "a.h5")
    write_hdf5(
        p, {"v": np.arange(12, dtype=np.float32).reshape(3, 4)},
        attrs={"v": {"units": "K", "scale_factor": 0.5, "valid_range":
                     np.array([0, 100], dtype=np.int32), "count": 7}},
        root_attrs={"title": "test file", "version": 2},
    )
    m = read_hdf5_meta(p)
    a = m["datasets"]["v"]["attrs"]
    assert a["units"] == "K"
    assert a["scale_factor"] == 0.5
    assert list(a["valid_range"]) == [0, 100]
    assert a["count"] == 7
    assert m["attrs"]["title"] == "test file"
    assert m["attrs"]["version"] == 2


def test_netcdf4_roundtrip(tmp_path, ray_session):
    from gdal_ray.sources import open_raster
    from gdal_ray.sources.hdf5 import (netcdf4_meta, read_hdf5_var,
                                       write_netcdf4)

    p = str(tmp_path / "t.nc")
    temp = np.arange(24, dtype=np.float64).reshape(4, 6)
    lat = np.linspace(-30.0, 30.0, 4)
    write_netcdf4(
        p,
        {"temperature": (("lat", "lon"), temp),
         "lat": (("lat",), lat)},           # coordinate variable
        gatts={"Conventions": "CF-1.6"},
    )
    m = netcdf4_meta(p)
    assert m["dims"] == {"lat": 4, "lon": 6}
    assert m["vars"]["temperature"]["dims"] == ["lat", "lon"]
    assert "lon" not in m["vars"]  # bare dim: placeholder, not a variable
    assert m["vars"]["lat"]["dims"] == ["lat"]
    assert m["gatts"]["Conventions"] == "CF-1.6"
    np.testing.assert_array_equal(read_hdf5_var(p, "temperature"), temp)
    np.testing.assert_array_equal(read_hdf5_var(p, "lat"), lat)
    # .nc open registry routes on HDF5 magic
    rows = open_raster(p, var="temperature").take_all()
    got = np.concatenate([
        np.frombuffer(r["data"], dtype=np.float64) for r in
        sorted(rows, key=lambda r: r["row0"])]).reshape(4, 6)
    np.testing.assert_array_equal(got, temp)


def test_netcdf4_info_door(tmp_path):
    from gdal_ray.info import describe
    from gdal_ray.sources.hdf5 import write_netcdf4

    p = str(tmp_path / "t.nc")
    write_netcdf4(p, {"x": (("row", "col"),
                            np.ones((5, 3), dtype=np.int16))})
    d = describe(p)
    assert d["driver"] == "netCDF"
    assert d["version"] == "netCDF-4 (HDF5)"
    assert d["dimensions"] == {"row": 5, "col": 3}
    assert d["variables"]["x"]["dims"] == ["row", "col"]


def test_netcdf4_phony_dims(tmp_path):
    # a plain HDF5 file (no dim scales) seen through the netCDF-4 door:
    # axes get GDAL's phony_dim_N names
    from gdal_ray.sources.hdf5 import netcdf4_meta, write_hdf5

    p = str(tmp_path / "p.nc")
    write_hdf5(p, {"z": np.zeros((2, 9), dtype=np.uint8)})
    m = netcdf4_meta(p)
    assert m["vars"]["z"]["dims"] == ["phony_dim_0", "phony_dim_1"]


def test_many_datasets_multi_snod(tmp_path):
    """>8 datasets: multiple SNOD leaves under one level-0 group B-tree
    (the libhdf5 layout; the former loud gate is lifted)."""
    from gdal_ray.sources.hdf5 import (read_hdf5_meta, read_hdf5_var,
                                       write_hdf5)

    rng = np.random.default_rng(1)
    ds = {f"var_{i:02d}": rng.normal(size=(6, 5)).astype(np.float32)
          for i in range(30)}
    p = str(tmp_path / "many.h5")
    write_hdf5(p, ds)
    m = read_hdf5_meta(p)
    assert sorted(m["datasets"]) == sorted(ds)
    for k, v in ds.items():
        np.testing.assert_array_equal(read_hdf5_var(p, k), v)


def test_wide_netcdf4(tmp_path):
    from gdal_ray.sources.hdf5 import netcdf4_meta, write_netcdf4

    p = str(tmp_path / "wide.nc")
    write_netcdf4(p, {f"v{i:02d}": (("row", "col"),
                                    np.full((4, 3), i, np.int32))
                      for i in range(20)})
    m4 = netcdf4_meta(p)
    assert len(m4["vars"]) == 20
    assert m4["dims"] == {"row": 4, "col": 3}
