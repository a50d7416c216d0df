"""NTv2 datum-shift grid driver (sources/ntv2.py) — write/read
round-trip, node-exact shifts, bilinear interpolation, subgrid
refinement, fixed-point inverse.  Reference: frmts/ntv2/ntv2dataset.cpp
(4-band raster view) + PROJ hgridshift semantics."""

import numpy as np
import pytest

from gdal_ray.sources.ntv2 import (
    Subgrid,
    ntv2_transform,
    read_gsb,
    read_ntv2,
    write_gsb,
)


def _coarse_grid():
    # 5x5 over lat 40..44N, lon 100..104W (E_LONG=100*3600, W_LONG=104*3600)
    lat0, lat1 = 40 * 3600.0, 44 * 3600.0
    e, w = 100 * 3600.0, 104 * 3600.0
    inc = 3600.0
    nrows, ncols = 5, 5
    rr, cc = np.meshgrid(np.arange(nrows), np.arange(ncols), indexing="ij")
    lat_shift = (0.5 + 0.1 * rr + 0.02 * cc).astype(np.float32)
    lon_shift = (1.0 - 0.05 * rr + 0.03 * cc).astype(np.float32)
    return Subgrid("COARSE", "NONE", lat0, lat1, e, w, inc, inc,
                   lat_shift, lon_shift,
                   np.zeros((nrows, ncols), np.float32),
                   np.zeros((nrows, ncols), np.float32))


def _fine_grid():
    # denser 5x5 inside lat 41..42, lon 101..102W, constant shift
    lat0, lat1 = 41 * 3600.0, 42 * 3600.0
    e, w = 101 * 3600.0, 102 * 3600.0
    inc = 900.0
    lat_shift = np.full((5, 5), 2.0, np.float32)
    lon_shift = np.full((5, 5), -3.0, np.float32)
    return Subgrid("FINE", "COARSE", lat0, lat1, e, w, inc, inc,
                   lat_shift, lon_shift,
                   np.zeros((5, 5), np.float32), np.zeros((5, 5), np.float32))


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.gsb")
    write_gsb(path, [_coarse_grid(), _fine_grid()])
    grids = read_gsb(path)
    assert [g.name for g in grids] == ["COARSE", "FINE"]
    g = grids[0]
    assert g.shape == (5, 5)
    assert g.s_lat == 40 * 3600.0 and g.w_long == 104 * 3600.0
    np.testing.assert_array_equal(g.lat_shift, _coarse_grid().lat_shift)
    np.testing.assert_array_equal(g.lon_shift, _coarse_grid().lon_shift)


def test_shift_at_nodes_and_bilinear(tmp_path):
    path = str(tmp_path / "t.gsb")
    write_gsb(path, [_coarse_grid()])
    fwd, _ = ntv2_transform(path)
    # node (row 1 = 41N, col 2 = 102W): lat shift .5+.1+.04=.64,
    # lon shift 1-.05+.06=1.01 (NTv2 lon positive west => east -=)
    lon, lat = fwd(np.array([-102.0]), np.array([41.0]))
    # expectations pass through float32 (the on-disk node dtype)
    assert abs(lat[0] - (41.0 + float(np.float32(0.64)) / 3600.0)) < 1e-15
    assert abs(lon[0] - (-102.0 - float(np.float32(1.01)) / 3600.0)) < 1e-15
    # midpoint between 4 nodes: bilinear average
    g = _coarse_grid()
    lon, lat = fwd(np.array([-102.5]), np.array([41.5]))
    want_lat = np.mean(g.lat_shift[1:3, 2:4].astype(np.float64))
    want_lon = np.mean(g.lon_shift[1:3, 2:4].astype(np.float64))
    assert abs(lat[0] - (41.5 + want_lat / 3600.0)) < 1e-12
    assert abs(lon[0] - (-102.5 - want_lon / 3600.0)) < 1e-12
    # outside the grid: identity
    lon, lat = fwd(np.array([0.0]), np.array([0.0]))
    assert lon[0] == 0.0 and lat[0] == 0.0


def test_subgrid_refinement_and_inverse(tmp_path):
    path = str(tmp_path / "t.gsb")
    write_gsb(path, [_coarse_grid(), _fine_grid()])
    fwd, inv = ntv2_transform(path)
    # inside the fine grid the constant fine shift wins
    lon, lat = fwd(np.array([-101.5]), np.array([41.5]))
    assert abs(lat[0] - (41.5 + 2.0 / 3600.0)) < 1e-14
    assert abs(lon[0] - (-101.5 + 3.0 / 3600.0)) < 1e-14
    # inverse round-trips to 1e-10 deg everywhere
    rng = np.random.RandomState(0)
    lons = -100.0 - 4.0 * rng.rand(200)
    lats = 40.0 + 4.0 * rng.rand(200)
    flon, flat = fwd(lons, lats)
    blon, blat = inv(flon, flat)
    assert np.abs(blon - lons).max() < 1e-10
    assert np.abs(blat - lats).max() < 1e-10


def test_big_endian_read(tmp_path):
    # byte-swap a written file: reader must detect the order from NUM_OREC
    path = str(tmp_path / "t.gsb")
    write_gsb(path, [_coarse_grid()])
    buf = bytearray(open(path, "rb").read())
    import struct as st
    out = bytearray()
    n_grids = 1
    # rebuild big-endian: walk records, swapping known int/double/float spans
    le = read_gsb(bytes(buf))
    g = le[0]
    # simplest: hand-encode the BE variant
    def rec(k, v):
        return k.encode().ljust(8)[:8] + v
    be = bytearray()
    be += rec("NUM_OREC", st.pack(">i", 11) + b"\0\0\0\0")
    be += rec("NUM_SREC", st.pack(">i", 11) + b"\0\0\0\0")
    be += rec("NUM_FILE", st.pack(">i", 1) + b"\0\0\0\0")
    be += rec("GS_TYPE", b"SECONDS ")
    be += rec("VERSION", b"NTv2.0  ")
    be += rec("SYSTEM_F", b"NAD27   ")
    be += rec("SYSTEM_T", b"NAD83   ")
    for k, v in (("MAJOR_F", 6378206.4), ("MINOR_F", 6356583.8),
                 ("MAJOR_T", 6378137.0), ("MINOR_T", 6356752.314)):
        be += rec(k, st.pack(">d", v))
    be += rec("SUB_NAME", b"COARSE  ")
    be += rec("PARENT", b"NONE    ")
    be += rec("CREATED", b"2026    ")
    be += rec("UPDATED", b"2026    ")
    for k, v in (("S_LAT", g.s_lat), ("N_LAT", g.n_lat),
                 ("E_LONG", g.e_long), ("W_LONG", g.w_long),
                 ("LAT_INC", g.lat_inc), ("LONG_INC", g.lon_inc)):
        be += rec(k, st.pack(">d", v))
    be += rec("GS_COUNT", st.pack(">i", 25) + b"\0\0\0\0")
    node = np.stack([g.lat_shift, g.lon_shift, g.lat_acc, g.lon_acc],
                    axis=-1)
    be += node.astype(">f4").tobytes()
    grids = read_gsb(bytes(be))
    np.testing.assert_array_equal(grids[0].lat_shift, g.lat_shift)


def test_nadgrids_proj_string(tmp_path):
    # +nadgrids=path.gsb composes the NTv2 shift with any projection
    # kernel at the PROJ hgridshift position (before the projection)
    from gdal_ray.crs import proj_pair

    path = str(tmp_path / "t.gsb")
    write_gsb(path, [_coarse_grid()])
    lon = np.array([-102.0, -101.2])
    lat = np.array([41.0, 42.7])
    fwd, inv = proj_pair(f"+proj=tmerc +lon_0=-102 +k=0.9996 "
                         f"+x_0=500000 +nadgrids={path}")
    e, n = fwd(lon, lat)
    blon, blat = inv(e, n)
    assert np.abs(blon - lon).max() < 1e-10
    assert np.abs(blat - lat).max() < 1e-10
    # the grid actually participates: result differs from the no-grid CRS
    fwd0, _ = proj_pair("+proj=tmerc +lon_0=-102 +k=0.9996 +x_0=500000")
    e0, n0 = fwd0(lon, lat)
    assert np.abs(e - e0).max() > 1.0  # ~1" shift ≈ tens of meters


def test_raster_door(ray_session, tmp_path):
    path = str(tmp_path / "t.gsb")
    write_gsb(path, [_coarse_grid(), _fine_grid()])
    from gdal_ray.sources import open_raster

    rows = open_raster(path).to_pandas().sort_values("chunk_id")
    assert list(rows["name"]) == ["COARSE", "FINE"]
    r = rows.iloc[0]
    assert (r.width, r.height, r.bands) == (5, 5, 4)
    assert (r.west, r.east, r.south, r.north) == (-104.0, -100.0, 40.0, 44.0)
    data = np.frombuffer(r.data, dtype=np.float32).reshape(4, 5, 5)
    np.testing.assert_array_equal(data[0], _coarse_grid().lat_shift)
