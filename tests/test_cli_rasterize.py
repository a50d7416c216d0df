"""gdal_rasterize CLI door: GeoJSON polygons → GeoTIFF, both burn rules."""

import json

import numpy as np

from gdal_ray.geometry.wkb import encode_polygon


def _write_geojson(path, feats):
    gj = {"type": "FeatureCollection", "features": feats}
    path.write_text(json.dumps(gj))


def test_cli_rasterize_geojson_to_tif(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.sources.gtiff_reader import tiff_levels

    feats = [
        {"type": "Feature", "properties": {"v": 7},
         "geometry": {"type": "Polygon", "coordinates": [
             [[2.25, 3.75], [9.75, 3.75], [9.75, 11.25],
              [2.25, 11.25], [2.25, 3.75]]]}},
        {"type": "Feature", "properties": {"v": 3},
         "geometry": {"type": "Polygon", "coordinates": [
             [[20.25, 20.25], [28.75, 20.25], [28.75, 28.75],
              [20.25, 28.75], [20.25, 20.25]]]}},
    ]
    src = tmp_path / "polys.geojson"
    _write_geojson(src, feats)
    out = tmp_path / "burn.tif"
    rc = main(["rasterize", str(src), str(out), "--ts", "32", "32",
               "--te", "0", "0", "32", "32", "-a", "v", "--epsg", "4326"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_features"] == 2
    lv = tiff_levels(str(out))[0]
    assert (lv["width"], lv["height"]) == (32, 32)

    # decode and check burned values + counts exactly
    from gdal_ray.codecs.tiff import decode_tiff
    arr = decode_tiff(open(out, "rb").read())
    arr = arr[:, :, 0] if arr.ndim == 3 else arr
    assert set(np.unique(arr)) == {0.0, 3.0, 7.0}
    # rect1 x in (2.25, 9.75): centers 2.5..9.5 → 8 cols;
    # y in (3.75, 11.25): centers 4.5..10.5 → 7 rows
    assert (arr == 7.0).sum() == 8 * 7
    assert (arr == 3.0).sum() == 9 * 9

    # ALL_TOUCHED adds the boundary-touched ring
    out2 = tmp_path / "burn_at.tif"
    rc = main(["rasterize", str(src), str(out2), "--ts", "32", "32",
               "--te", "0", "0", "32", "32", "-a", "v", "--at"])
    assert rc == 0
    arr2 = decode_tiff(open(out2, "rb").read())
    arr2 = arr2[:, :, 0] if arr2.ndim == 3 else arr2
    assert (arr2 == 7.0).sum() == (9 - 2 + 1) * (11 - 3 + 1)
    assert ((arr == 7.0) <= (arr2 == 7.0)).all()
