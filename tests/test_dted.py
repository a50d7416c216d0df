"""DTED driver (sources/dted.py vs MIL-PRF-89020B / frmts/dted):
signed-magnitude elevations, per-column records with sentinel+checksum,
UHL georeferencing, Ray column-slab fan-out."""
import struct

import numpy as np
import pytest

from gdal_ray.sources.dted import (
    _DATA_START, dted_meta, read_dted, read_dted_array, write_dted,
)

RNG = np.random.default_rng(4)


def test_roundtrip_with_negatives(tmp_path):
    p = str(tmp_path / "n51e003.dt1")
    dem = RNG.integers(-430, 8850, (121, 121)).astype(np.int16)
    write_dted(p, dem, lon0=3.0, lat0=51.0)
    assert np.array_equal(read_dted_array(p), dem)
    m = dted_meta(p)
    assert (m["width"], m["height"]) == (121, 121)
    step = 1.0 / 120.0
    gt = m["geotransform"]
    assert gt[0] == pytest.approx(3.0 - step / 2)
    assert gt[3] == pytest.approx(52.0 + step / 2)
    assert gt[5] == pytest.approx(-step)


def test_wire_anchors(tmp_path):
    p = str(tmp_path / "s04w071.dt0")
    dem = np.zeros((61, 61), np.int16)
    dem[0, 0] = -100   # south-west corner, negative → signed magnitude
    write_dted(p, dem, lon0=-71.0, lat0=-4.0)
    raw = open(p, "rb").read()
    assert raw[:4] == b"UHL1"
    assert raw[4:12] == b"071000 W".replace(b" ", b"0")  # 0710000W
    assert raw[12:20] == b"0040000S"
    # first record: sentinel, then the SW sample is the first elevation
    rec = raw[_DATA_START:_DATA_START + 12 + 2 * 61]
    assert rec[0] == 0xAA
    first = struct.unpack_from(">H", rec, 8)[0]
    assert first == (100 | 0x8000)  # signed magnitude
    # checksum validates (decoder raises otherwise)
    assert read_dted_array(p)[0, 0] == -100


def test_checksum_detects_corruption(tmp_path):
    p = str(tmp_path / "n00e000.dt0")
    write_dted(p, RNG.integers(0, 100, (61, 61)).astype(np.int16),
               lon0=0.0, lat0=0.0)
    raw = bytearray(open(p, "rb").read())
    raw[_DATA_START + 20] ^= 0x01
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        read_dted_array(p)


def test_ray_column_fanout(tmp_path, ray_session):
    from gdal_ray.sources import open_raster

    p = str(tmp_path / "n10e020.dt1")
    dem = RNG.integers(-50, 4000, (121, 121)).astype(np.int16)
    write_dted(p, dem, lon0=20.0, lat0=10.0)
    rows = sorted(open_raster(p, cols_per_block=50).take_all(),
                  key=lambda r: r["col0"])
    got = np.concatenate(
        [np.frombuffer(r["data"], "<i2").reshape(121, -1) for r in rows],
        axis=1)
    assert np.array_equal(got, dem)
    assert [r["n_cols"] for r in rows] == [50, 50, 21]


def test_info_door(tmp_path):
    from gdal_ray.info import describe

    p = str(tmp_path / "n51e003.dt2")
    write_dted(p, np.zeros((61, 61), np.int16), lon0=3.0, lat0=51.0)
    d = describe(p)
    assert d["format"] == "DTED" and d["nodata"] == -32767
