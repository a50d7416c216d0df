"""NetCDF-3 classic driver conformance (sources/netcdf3.py vs the public
CDF-1/CDF-2 spec).  Reference: frmts/netcdf reads the same layout via
libnetcdf."""

import numpy as np
import pytest

from gdal_ray.sources.netcdf3 import (
    read_netcdf,
    read_netcdf_meta,
    read_netcdf_var,
    write_netcdf,
)


def _write_sample(path, version=1):
    temp = (np.arange(60, dtype=np.float32).reshape(5, 12) * 0.5)
    elev = np.arange(60, dtype=np.int16).reshape(5, 12) * 3
    lon = np.linspace(-180, 180, 12).astype(np.float64)
    write_netcdf(
        path,
        dims={"y": 5, "x": 12},
        variables={
            "temp": (("y", "x"), temp, {"units": "degC", "scale": 0.5}),
            "elev": (("y", "x"), elev, {"_FillValue": np.int16(-1)}),
            "lon": (("x",), lon, {}),
        },
        gatts={"title": "gdal_ray test", "n": 42},
        version=version,
    )
    return temp, elev, lon


@pytest.mark.parametrize("version", [1, 2])
def test_roundtrip_fixed_vars(tmp_path, version):
    p = str(tmp_path / "t.nc")
    temp, elev, lon = _write_sample(p, version)
    m = read_netcdf_meta(p)
    assert m["version"] == version
    assert m["dims"] == [("y", 5), ("x", 12)]
    assert m["gatts"]["title"] == "gdal_ray test"
    assert list(m["gatts"]["n"]) == [42]
    assert m["vars"]["temp"]["atts"]["units"] == "degC"
    assert np.array_equal(read_netcdf_var(p, "temp"), temp.astype(">f4"))
    assert np.array_equal(read_netcdf_var(p, "elev"), elev.astype(">i2"))
    assert np.allclose(read_netcdf_var(p, "lon"), lon)


def test_magic_rejected(tmp_path):
    p = str(tmp_path / "bad.nc")
    open(p, "wb").write(b"HDF\x01 not netcdf")
    with pytest.raises(ValueError):
        read_netcdf_meta(p)


def test_record_variables_interleaved(tmp_path):
    p = str(tmp_path / "rec.nc")
    a = np.arange(24, dtype=np.float64).reshape(4, 6)
    b = (np.arange(12, dtype=np.int32).reshape(4, 3) * 7)
    write_netcdf(
        p,
        dims={"time": None, "x": 6, "k": 3},
        variables={
            "a": (("time", "x"), a, {}),
            "b": (("time", "k"), b, {}),
        },
    )
    m = read_netcdf_meta(p)
    assert m["numrecs"] == 4
    assert m["vars"]["a"]["is_rec"] and m["vars"]["b"]["is_rec"]
    assert m["recsize"] == 6 * 8 + 3 * 4
    assert np.array_equal(read_netcdf_var(p, "a"), a)
    assert np.array_equal(read_netcdf_var(p, "b"), b)


def test_single_record_var_packs_unpadded(tmp_path):
    # sole record variable of NC_SHORT with odd slab: stride is UNPADDED
    p = str(tmp_path / "one.nc")
    v = np.arange(15, dtype=np.int16).reshape(5, 3)  # slab = 6 bytes
    write_netcdf(p, dims={"t": None, "x": 3},
                 variables={"v": (("t", "x"), v, {})})
    m = read_netcdf_meta(p)
    assert m["recsize"] == 6  # not padded to 8
    assert np.array_equal(read_netcdf_var(p, "v"), v)


def test_odd_length_attr_padding(tmp_path):
    p = str(tmp_path / "pad.nc")
    write_netcdf(p, dims={"x": 2},
                 variables={"v": (("x",), np.array([1, 2], np.int32),
                                  {"abc": "xyzzy"})},
                 gatts={"t": "abc"})  # 3- and 5-byte strings pad to 4/8
    m = read_netcdf_meta(p)
    assert m["gatts"]["t"] == "abc"
    assert m["vars"]["v"]["atts"]["abc"] == "xyzzy"
    assert np.array_equal(read_netcdf_var(p, "v"), [1, 2])


def test_parallel_slab_read(ray_session, tmp_path):
    p = str(tmp_path / "big.nc")
    arr = np.arange(50 * 7, dtype=np.float32).reshape(50, 7)
    write_netcdf(p, dims={"y": 50, "x": 7},
                 variables={"v": (("y", "x"), arr, {})})
    rows = read_netcdf(p, "v", rows_per_block=16).to_pandas()
    assert len(rows) == 4
    out = np.zeros_like(arr)
    for _, r in rows.iterrows():
        blk = np.frombuffer(r["data"], dtype=">f4").reshape(r["n_rows"], 7)
        out[r["row0"]:r["row0"] + r["n_rows"]] = blk
    assert np.array_equal(out, arr)


def test_parallel_slab_read_record_var(ray_session, tmp_path):
    p = str(tmp_path / "recbig.nc")
    a = np.arange(30 * 4, dtype=np.float64).reshape(30, 4)
    b = np.arange(30, dtype=np.int32).reshape(30, 1)
    write_netcdf(p, dims={"t": None, "x": 4, "k": 1},
                 variables={"a": (("t", "x"), a, {}),
                            "b": (("t", "k"), b, {})})
    rows = read_netcdf(p, "a", rows_per_block=8).to_pandas()
    out = np.zeros_like(a)
    for _, r in rows.iterrows():
        out[r["row0"]:r["row0"] + r["n_rows"]] = \
            np.frombuffer(r["data"], dtype=">f8").reshape(r["n_rows"], 4)
    assert np.array_equal(out, a)
