"""gdal_footprint CLI door: valid-data polygons via the shared
tile-parallel polygonize core."""

import json

import numpy as np

from gdal_ray.codecs.tiff import encode_geotiff


def test_cli_footprint_door(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    img = np.zeros((80, 60), dtype=np.uint8)   # 0 == nodata
    img[10:40, 5:30] = 200                     # valid block A
    img[50:70, 35:55] = 120                    # valid block B
    src = tmp_path / "d.tif"
    src.write_bytes(
        encode_geotiff(img, geotransform=(0.0, 1.0, 0.0, 80.0, 0.0, -1.0)))
    out = tmp_path / "fp.geojson"
    rc = main(["footprint", str(src), str(out), "--nodata", "0",
               "--tile", "32"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_polygons"] == 2
    assert rep["n_pixels"] == 30 * 25 + 20 * 20

    fc = json.loads(out.read_text())
    assert len(fc["features"]) == 2
    areas = []
    for f in fc["features"]:
        ring = f["geometry"]["coordinates"][0]
        # shoelace over the georeferenced ring
        x = np.array([p[0] for p in ring])
        y = np.array([p[1] for p in ring])
        areas.append(abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])) / 2)
    assert sorted(areas) == [400.0, 750.0]


def test_cli_footprint_multiband_any(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    img = np.zeros((40, 40, 3), dtype=np.uint8)
    img[5:15, 5:15, 1] = 7      # valid only in band 2
    src = tmp_path / "rgb.tif"
    src.write_bytes(encode_geotiff(img))
    out = tmp_path / "fp.geojson"
    rc = main(["footprint", str(src), str(out), "--tile", "16"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_polygons"] == 1 and rep["n_pixels"] == 100
