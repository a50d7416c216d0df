"""gdalcompare analogue (gdal_ray/compare.py) — reference:
swig/python/gdal-utils/osgeo_utils/gdalcompare.py check list."""

import numpy as np

from gdal_ray.codecs import encode_png, encode_geotiff
from gdal_ray.compare import compare_rasters


def _img():
    return (np.arange(48 * 64 * 3) % 256).reshape(48, 64, 3).astype(np.uint8)


def test_identical(tmp_path):
    p = str(tmp_path / "a.png")
    open(p, "wb").write(encode_png(_img()))
    r = compare_rasters(p, p)
    assert r["differences"] == 0
    assert all(b["checksum_a"] == b["checksum_b"] for b in r["bands"])
    assert all(b["n_pixels_differ"] == 0 for b in r["bands"])


def test_pixel_diff_detected(tmp_path):
    a = str(tmp_path / "a.png")
    b = str(tmp_path / "b.png")
    img = _img()
    open(a, "wb").write(encode_png(img))
    img2 = img.copy()
    img2[3, 4, 1] ^= 8
    open(b, "wb").write(encode_png(img2))
    r = compare_rasters(a, b)
    assert r["differences"] == 1  # exactly one band checksum finding
    bd = r["bands"][1]
    assert bd["n_pixels_differ"] == 1 and bd["max_diff"] == 8.0
    assert bd["checksum_a"] != bd["checksum_b"]
    assert r["bands"][0]["n_pixels_differ"] == 0


def test_cross_format_and_size_mismatch(tmp_path):
    # same pixels through PNG and GeoTIFF compare identical
    a = str(tmp_path / "a.png")
    t = str(tmp_path / "a.tif")
    img = _img()
    open(a, "wb").write(encode_png(img))
    open(t, "wb").write(encode_geotiff(img))
    assert compare_rasters(a, t)["differences"] == 0
    # size mismatch is a finding, not a crash
    s = str(tmp_path / "s.png")
    open(s, "wb").write(encode_png(img[:32]))
    r = compare_rasters(a, s)
    assert r["differences"] == 1 and "size differs" in r["findings"][0]


def test_create_and_edit_doors(tmp_path, capsys):
    """gdal_create / gdal_edit analogues (cli.py create/edit)."""
    from gdal_ray.cli import main
    from gdal_ray.codecs.tiff import read_geotiff

    p = str(tmp_path / "b.tif")
    assert main(["create", p, "--xsize", "64", "--ysize", "48",
                 "--burn", "7", "--a-srs", "4326",
                 "--a-ullr", "10", "50", "11", "49"]) == 0
    arr, info = read_geotiff(open(p, "rb").read())
    assert arr.shape[:2] == (48, 64) and (arr == 7).all()
    assert info["epsg"] == 4326
    assert info["geotransform"][0] == 10.0
    assert main(["edit", p, "--a-nodata", "7",
                 "--a-ullr", "20", "60", "21", "59"]) == 0
    arr2, info2 = read_geotiff(open(p, "rb").read())
    assert (arr2 == arr).all()
    assert info2["nodata"] == 7.0
    assert info2["geotransform"][0] == 20.0
    assert info2["epsg"] == 4326  # preserved
