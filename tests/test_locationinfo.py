"""gdallocationinfo analogue (gdal_ray/locationinfo.py) — reference:
apps/gdallocationinfo.cpp (pixel / geo / -wgs84 query modes)."""

import numpy as np

from gdal_ray.codecs import encode_png
from gdal_ray.codecs.tiff import encode_geotiff
from gdal_ray.locationinfo import location_info


def _img():
    rr, cc = np.meshgrid(np.arange(20), np.arange(30), indexing="ij")
    return (rr * 7 + cc * 3).astype(np.uint8)


def test_pixel_query(tmp_path):
    p = str(tmp_path / "a.png")
    open(p, "wb").write(encode_png(_img()))
    r = location_info(p, 4, 3)[0]
    assert r["in_raster"] and r["values"] == [float(3 * 7 + 4 * 3)]
    assert location_info(p, 99, 0)[0]["in_raster"] is False


def test_geo_and_wgs84_query(tmp_path):
    p = str(tmp_path / "a.tif")
    gt = (100.0, 0.5, 0.0, 40.0, 0.0, -0.25)  # geographic-ish grid
    open(p, "wb").write(encode_geotiff(_img(), geotransform=gt, epsg=4326))
    # geo point at pixel center (col 4, row 3): x = 100 + 4.5*0.5, y = 40 - 3.5*0.25
    r = location_info(p, 100 + 4.5 * 0.5, 40 - 3.5 * 0.25, coords="geo")[0]
    assert r["in_raster"] and r["values"] == [float(3 * 7 + 4 * 3)]
    # wgs84 mode with epsg=4326 is the same path
    r2 = location_info(p, 100 + 4.5 * 0.5, 40 - 3.5 * 0.25, coords="wgs84")[0]
    assert r2["values"] == r["values"]


def test_bilinear(tmp_path):
    p = str(tmp_path / "a.png")
    open(p, "wb").write(encode_png(_img()))
    # midpoint between 4 pixel centers: average
    r = location_info(p, 5.0, 4.0, interpolate="bilinear")[0]
    want = np.mean([_img()[rr, cc] for rr in (3, 4) for cc in (4, 5)])
    assert abs(r["values"][0] - want) < 1e-12
