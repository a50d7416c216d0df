"""gdal_polygonize CLI door: integer GeoTIFF → GeoJSON polygons."""

import json

import numpy as np

from gdal_ray.codecs.tiff import encode_geotiff


def test_cli_polygonize_regions(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    arr = np.zeros((40, 40), dtype=np.int32)
    arr[5:15, 5:15] = 7
    arr[20:35, 22:38] = 3
    src = tmp_path / "src.tif"
    src.write_bytes(
        encode_geotiff(arr, geotransform=(100.0, 2.0, 0.0, 500.0, 0.0, -2.0))
    )
    out = tmp_path / "out.geojson"
    rc = main(["polygonize", str(src), str(out), "--tile", "16"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_polygons"] == 3
    gj = json.loads(out.read_text())
    by_dn = {f["properties"]["DN"]: f for f in gj["features"]}
    assert set(by_dn) == {0, 3, 7}
    assert by_dn[7]["properties"]["n_pixels"] == 100
    assert by_dn[3]["properties"]["n_pixels"] == 240
    assert by_dn[0]["properties"]["n_pixels"] == 40 * 40 - 340
    # background carries 2 holes (one per foreground region)
    assert len(by_dn[0]["geometry"]["coordinates"]) == 3
    # geotransform applied: region-7 outer ring spans x 110..130, y 470..490
    ring7 = np.asarray(by_dn[7]["geometry"]["coordinates"][0])
    assert ring7[:, 0].min() == 110.0 and ring7[:, 0].max() == 130.0
    assert ring7[:, 1].min() == 470.0 and ring7[:, 1].max() == 490.0


def test_cli_polygonize_matches_single_pass(ray_session, tmp_path, capsys):
    """Tile-parallel door output ≡ single-pass polygonize on the same grid."""
    from gdal_ray.cli import main
    from gdal_ray.stages.polygonize import polygonize, rings_to_wkt

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 3, size=(50, 50)).astype(np.int32)
    # smooth into larger blobs so rings are non-trivial
    arr = arr.repeat(2, axis=0).repeat(2, axis=1)[:64, :64]
    src = tmp_path / "r.tif"
    src.write_bytes(encode_geotiff(np.ascontiguousarray(arr)))
    out = tmp_path / "r.geojson"
    rc = main(["polygonize", str(src), str(out), "--tile", "16"])
    assert rc == 0
    capsys.readouterr()
    gj = json.loads(out.read_text())

    single = polygonize(arr)
    want = sorted(
        (p["value"], p["pixel_count"], rings_to_wkt(p["rings"])) for p in single
    )
    got = sorted(
        (
            f["properties"]["DN"],
            f["properties"]["n_pixels"],
            rings_to_wkt(
                [
                    [(int(x), int(y)) for x, y in ring]
                    for ring in f["geometry"]["coordinates"]
                ]
            ),
        )
        for f in gj["features"]
    )
    assert got == want
