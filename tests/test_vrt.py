"""VRT virtual mosaic driver (sources/vrt.py) — gdalbuildvrt /
frmts/vrt analogue: union-grid XML build from header regions only,
parallel per-tile compose with last-on-top + source-nodata skip."""

import numpy as np
import pytest

from gdal_ray.codecs.tiff import encode_geotiff
from gdal_ray.sources.vrt import build_vrt, parse_vrt, read_vrt, save_vrt


def _tif(path, arr, x0, y0, *, px=1.0, nodata=None, **kw):
    gt = (x0, px, 0.0, y0, 0.0, -px)
    open(path, "wb").write(
        encode_geotiff(arr, geotransform=gt, nodata=nodata, **kw))
    return str(path)


def _assemble(df, H, W, spp, dt):
    out = np.zeros((H, W, spp), dtype=dt)
    for r in df.itertuples():
        out[r.row0:r.row0 + r.h, r.col0:r.col0 + r.w] = np.frombuffer(
            r.data, dtype=dt).reshape(r.h, r.w, spp)
    return out


def test_build_vrt_xml_shape(tmp_path):
    a = np.full((40, 60, 2), 7, np.uint8)
    b = np.full((40, 60, 2), 9, np.uint8)
    p1 = _tif(tmp_path / "a.tif", a, 100.0, 500.0)
    p2 = _tif(tmp_path / "b.tif", b, 130.0, 480.0)
    xml = build_vrt([p1, p2])
    doc = parse_vrt(xml)
    # union: x [100,190], y [440,500] -> 90 x 60
    assert (doc["width"], doc["height"]) == (90, 60)
    assert doc["geotransform"][:2] == (100.0, 1.0)
    assert doc["spp"] == 2 and doc["dtype"] == "u1"
    assert doc["sources"][0]["dst_xoff"] == 0
    assert doc["sources"][1] == {
        "path": p2, "dst_xoff": 30, "dst_yoff": 20, "w": 60, "h": 40}


def test_build_vrt_rejects_mixed_grids(tmp_path):
    p1 = _tif(tmp_path / "a.tif", np.zeros((8, 8), np.uint8), 0.0, 8.0)
    p2 = _tif(tmp_path / "b.tif", np.zeros((8, 8), np.uint8), 0.0, 8.0,
              px=2.0)
    with pytest.raises(ValueError):
        build_vrt([p1, p2])
    p3 = _tif(tmp_path / "c.tif", np.zeros((8, 8), np.uint16), 0.0, 8.0)
    with pytest.raises(ValueError):
        build_vrt([p1, p3])


def test_read_vrt_composes_last_on_top(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    a = rng.integers(1, 255, (50, 70, 3)).astype(np.uint8)
    b = rng.integers(1, 255, (40, 60, 3)).astype(np.uint8)
    p1 = _tif(tmp_path / "a.tif", a, 0.0, 100.0, tile_size=32)
    p2 = _tif(tmp_path / "b.tif", b, 40.0, 80.0, rows_per_strip=16)
    vp = str(tmp_path / "m.vrt")
    save_vrt([p1, p2], vp)

    df = read_vrt(vp, tile=32).to_pandas()
    got = _assemble(df, 60, 100, 3, np.uint8)

    exp = np.zeros((60, 100, 3), np.uint8)
    exp[0:50, 0:70] = a          # y 100..50 -> rows 0..50
    exp[20:60, 40:100] = b       # y 80..40 -> rows 20..60, last on top
    assert np.array_equal(got, exp)


def test_read_vrt_nodata_transparency(ray_session, tmp_path):
    a = np.full((30, 30), 5, np.uint8)
    b = np.full((30, 30), 0, np.uint8)
    b[10:20, 10:20] = 200
    p1 = _tif(tmp_path / "a.tif", a, 0.0, 30.0, nodata=0)
    p2 = _tif(tmp_path / "b.tif", b, 0.0, 30.0, nodata=0)
    vp = str(tmp_path / "m.vrt")
    save_vrt([p1, p2], vp)
    got = _assemble(read_vrt(vp, tile=16).to_pandas(), 30, 30, 1, np.uint8)

    exp = np.full((30, 30, 1), 5, np.uint8)
    exp[10:20, 10:20, 0] = 200   # only b's non-nodata pixels paint
    assert np.array_equal(got, exp)


def test_open_raster_dispatches_vrt(ray_session, tmp_path):
    from gdal_ray.sources import open_raster

    p1 = _tif(tmp_path / "a.tif", np.full((20, 20), 3, np.uint8), 0.0, 20.0)
    vp = str(tmp_path / "m.vrt")
    save_vrt([p1], vp)
    df = open_raster(vp).to_pandas()
    assert df["h"].sum() == 20 and df["w"].iloc[0] == 20
