"""Small utility doors: gdalmove (refit georeferencing, no warp),
gdalattachpct (color-table attach), dumpoverviews (extract stored
overview levels)."""

import json

import numpy as np

from gdal_ray.codecs.tiff import encode_geotiff, read_geotiff


def test_move_refits_geotransform_without_warping(tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.crs import transform_fn

    img = np.arange(40 * 50, dtype=np.uint8).reshape(40, 50) % 251
    gt = (10.0, 0.01, 0.0, 45.0, 0.0, -0.01)  # small lon/lat window
    src = tmp_path / "m.tif"
    src.write_bytes(encode_geotiff(img, geotransform=gt, epsg=4326, nodata=7.0))

    rc = main(["move", str(src), "--t_srs", "EPSG:3857"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["epsg"] == 3857
    arr, info = read_geotiff(src.read_bytes())
    # pixels untouched, nodata preserved
    assert np.array_equal(arr[..., 0] if arr.ndim == 3 else arr, img)
    assert info["nodata"] == 7.0
    # the refit origin matches the exact transform of the old origin
    fn = transform_fn("EPSG:4326", "EPSG:3857")
    ex, ey = fn(np.array([10.0]), np.array([45.0]))
    ngt = info["geotransform"]
    assert abs(ngt[0] - ex[0]) < 1.0 and abs(ngt[3] - ey[0]) < 30.0
    # tiny window: affine fit error well under a pixel of the new grid
    assert rep["max_fit_error"] < abs(ngt[1])


def test_attachpct_from_text_and_raster(tmp_path, capsys):
    from gdal_ray.cli import main

    band = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    src = tmp_path / "b.tif"
    src.write_bytes(encode_geotiff(band, geotransform=(0, 1, 0, 2, 0, -1)))

    ctext = tmp_path / "colors.txt"
    ctext.write_text("0 10 20 30\n1 40 50 60\n2 70 80 90\n3 100 110 120\n")
    out1 = tmp_path / "pal1.tif"
    assert main(["attachpct", str(ctext), str(src), str(out1)]) == 0
    _, info1 = read_geotiff(out1.read_bytes())
    pal = info1["palette"]
    assert pal is not None
    assert list(pal[1]) == [40 * 257, 50 * 257, 60 * 257]

    # raster-sourced palette: attach out1's ColorMap to src again
    out2 = tmp_path / "pal2.tif"
    assert main(["attachpct", str(out1), str(src), str(out2)]) == 0
    _, info2 = read_geotiff(out2.read_bytes())
    assert np.array_equal(info2["palette"][:4], pal[:4])
    capsys.readouterr()


def test_dumpoverviews_internal_and_external(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.RandomState(9)
    img = rng.randint(0, 255, (128, 192), dtype=np.uint8).astype(np.uint8)
    src = tmp_path / "d.tif"
    src.write_bytes(encode_geotiff(img, tile_size=64,
                                   geotransform=(0, 1, 0, 128, 0, -1),
                                   epsg=3857))
    # build external .ovr levels first (addo door), then dump them
    assert main(["addo", str(src), "--tile-size", "64"]) == 0
    capsys.readouterr()
    assert main(["dumpoverviews", str(src)]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["overviews"], "expected at least one overview level"
    lv1 = rep["overviews"][0]
    assert lv1["external"] and (lv1["width"], lv1["height"]) == (96, 64)
    arr, info = read_geotiff(open(lv1["path"], "rb").read())
    a2 = arr[..., 0] if arr.ndim == 3 else arr
    from gdal_ray.stages.resample import downsample_2x2_average

    assert np.array_equal(a2, downsample_2x2_average(img))
    # overview geotransform doubles the pixel size
    assert info["geotransform"][1] == 2.0
