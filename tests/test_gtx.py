"""GTX vertical-datum grid driver (sources/gtx.py): round-trip,
bilinear geoid interpolation, nodata, height conversion, raster door.
Reference: frmts/gtx/gtxdataset.cpp + PROJ vgridshift semantics."""

import numpy as np

from gdal_ray.sources.gtx import (
    GTX_NODATA,
    apply_geoid,
    gtx_interp,
    read_gtx,
    write_gtx,
)


def _grid():
    # 4x6 geoid over lat 30..33, lon -120..-115 (1 deg spacing)
    rr, cc = np.meshgrid(np.arange(4), np.arange(6), indexing="ij")
    return (-30.0 + 0.5 * rr + 0.25 * cc).astype(np.float64)


def test_roundtrip_and_nodata(tmp_path):
    path = str(tmp_path / "g.gtx")
    g = _grid()
    g[0, 0] = np.nan
    write_gtx(path, 30.0, -120.0, 1.0, 1.0, g)
    ll_lat, ll_lon, dlat, dlon, back = read_gtx(path)
    assert (ll_lat, ll_lon, dlat, dlon) == (30.0, -120.0, 1.0, 1.0)
    assert np.isnan(back[0, 0])
    np.testing.assert_allclose(back[1:], g[1:], atol=1e-4)


def test_bilinear_interp(tmp_path):
    path = str(tmp_path / "g.gtx")
    write_gtx(path, 30.0, -120.0, 1.0, 1.0, _grid())
    geoid = gtx_interp(path)
    # node values exact (float32 storage)
    v = geoid(np.array([-119.0]), np.array([31.0]))
    assert abs(v[0] - float(np.float32(-30.0 + 0.5 + 0.25))) < 1e-6
    # midpoint = average of 4 corners (bilinear of a bilinear field exact)
    v = geoid(np.array([-118.5]), np.array([31.5]))
    want = np.mean(_grid()[1:3, 1:3])
    assert abs(v[0] - want) < 1e-5
    # outside -> NaN
    assert np.isnan(geoid(np.array([0.0]), np.array([0.0]))[0])


def test_apply_geoid(tmp_path):
    path = str(tmp_path / "g.gtx")
    write_gtx(path, 30.0, -120.0, 1.0, 1.0, _grid())
    lon = np.array([-119.0, 0.0])
    lat = np.array([31.0, 0.0])
    h = np.array([100.0, 100.0])
    ho = apply_geoid(path, lon, lat, h)
    n = float(np.float32(-29.25))
    assert abs(ho[0] - (100.0 - n)) < 1e-5
    assert ho[1] == 100.0  # outside the grid: unchanged
    he = apply_geoid(path, lon, lat, ho, direction="ortho_to_ellips")
    np.testing.assert_allclose(he, h, atol=1e-9)


def test_raster_door(ray_session, tmp_path):
    path = str(tmp_path / "g.gtx")
    write_gtx(path, 30.0, -120.0, 1.0, 1.0, _grid())
    from gdal_ray.sources import open_raster

    rows = open_raster(path, rows_per_chunk=3).to_pandas() \
        .sort_values("chunk_id")
    assert len(rows) == 2
    assert list(rows["height"]) == [3, 1]
    first = np.frombuffer(rows.iloc[0]["data"], dtype=np.float32) \
        .reshape(3, 6)
    np.testing.assert_allclose(first, _grid()[:3], atol=1e-4)
    assert rows.iloc[1]["south"] == 33.0
