"""AAIGrid (.asc) + XYZ ASCII drivers (sources/aaigrid.py,
sources/xyzgrid.py) — frmts/aaigrid, frmts/xyz, apps/gdal2xyz.py."""

import numpy as np
import pytest

from gdal_ray.sources.aaigrid import aaigrid_header, read_aaigrid, write_aaigrid
from gdal_ray.sources.xyzgrid import raster_to_xyz, read_xyz, write_xyz


def _assemble(df, H, W):
    out = np.zeros((H, W), np.float64)
    for r in df.itertuples():
        out[r.row0:r.row0 + r.h] = np.frombuffer(
            r.data, np.float64).reshape(r.h, r.w)
    return out


def test_aaigrid_roundtrip_int(ray_session, tmp_path):
    arr = np.arange(37 * 23).reshape(37, 23) % 97
    p = str(tmp_path / "g.asc")
    write_aaigrid(arr, p, xll=10.0, yll=20.0, cellsize=2.5)
    hdr = aaigrid_header(p)
    assert (hdr["ncols"], hdr["nrows"]) == (23, 37)
    assert (hdr["xll"], hdr["yll"], hdr["cellsize"]) == (10.0, 20.0, 2.5)
    got = _assemble(read_aaigrid(p, rows_per_band=10).to_pandas(), 37, 23)
    assert np.array_equal(got, arr.astype(np.float64))


def test_aaigrid_nodata_to_nan(ray_session, tmp_path):
    arr = np.full((8, 8), 3.5)
    arr[2, 3] = -9999.0
    p = str(tmp_path / "n.asc")
    write_aaigrid(arr, p, nodata=-9999.0)
    got = _assemble(read_aaigrid(p).to_pandas(), 8, 8)
    assert np.isnan(got[2, 3]) and got[0, 0] == 3.5


def test_aaigrid_rejects_non_grid(tmp_path):
    p = str(tmp_path / "x.asc")
    open(p, "w").write("hello world\n1 2 3\n")
    with pytest.raises(ValueError):
        aaigrid_header(p)


def test_xyz_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    pts = np.array([[1.0, 2.0, 3.0], [4.5, -1.25, 0.0], [7.0, 8.0, 9.5]])
    ds = rd.from_items([{"x": r[0], "y": r[1], "z": r[2]} for r in pts])
    p = str(tmp_path / "p.xyz")
    assert write_xyz(ds, p) == 3
    got = read_xyz(p).to_pandas().sort_values("x").reset_index(drop=True)
    assert np.allclose(got[["x", "y", "z"]].to_numpy(),
                       pts[pts[:, 0].argsort()])


def test_xyz_skips_comments(ray_session, tmp_path):
    p = str(tmp_path / "c.xyz")
    open(p, "w").write("# header\n1 2 3\n\n4 5 6\n")
    got = read_xyz(p).to_pandas()
    assert len(got) == 2 and set(got["z"]) == {3.0, 6.0}


def test_gdal2xyz_direction(ray_session, tmp_path):
    import ray.data as rd

    blk = np.arange(12, dtype=np.float64).reshape(3, 4)
    ds = rd.from_items([{"row0": 0, "col0": 0, "h": 3, "w": 4,
                         "data": blk.tobytes()}])
    out = raster_to_xyz(ds, (100.0, 2.0, 0.0, 50.0, 0.0, -2.0),
                        skip_nodata=5.0).to_pandas()
    assert len(out) == 11  # one nodata pixel dropped
    r = out[out["z"] == 7.0].iloc[0]  # pixel (r=1, c=3)
    assert (r["x"], r["y"]) == (100.0 + 3.5 * 2, 50.0 - 1.5 * 2)


def test_open_raster_dispatch_ascii(ray_session, tmp_path):
    from gdal_ray.sources import open_raster

    write_aaigrid(np.ones((4, 4)), str(tmp_path / "a.asc"))
    assert len(open_raster(str(tmp_path / "a.asc")).to_pandas()) == 1
    open(tmp_path / "b.xyz", "w").write("1 2 3\n")
    assert len(open_raster(str(tmp_path / "b.xyz")).to_pandas()) == 1
