"""gdal_contour CLI door: strip-parallel segments ≡ whole-image run."""

import json

import numpy as np

from gdal_ray.codecs.tiff import encode_geotiff
from gdal_ray.stages.contour import assemble_chains, contour_segments


def test_cli_contour_equals_whole_image(tmp_path, ray_session):
    from gdal_ray.cli import main

    y, x = np.mgrid[0:90, 0:110]
    dem = (100 + 40 * np.sin(x / 15) + 30 * np.cos(y / 10)).astype(np.float32)
    src = str(tmp_path / "dem.tif")
    with open(src, "wb") as f:
        f.write(encode_geotiff(dem, geotransform=(0, 10, 0, 900, 0, -10),
                               epsg=32631, tile_size=64))
    out = str(tmp_path / "c.geojson")
    assert main(["contour", src, out, "--fl", "100", "--fl", "130",
                 "--strip", "17"]) == 0
    fc = json.load(open(out))

    for lv in (100.0, 130.0):
        segs = contour_segments(dem.astype(np.float64), lv)
        n_closed, n_open, n_pts, chains = assemble_chains(segs)
        feats = [f for f in fc["features"]
                 if f["properties"]["ELEV"] == lv]
        assert len(feats) == len(chains)
        assert sum(f["properties"]["closed"] for f in feats) == n_closed
        # vertex multiset equality in geo coords (chain order may differ)
        def geo(pt):
            return (0 + (pt[0] + 0.5) * 10.0, 900 + (pt[1] + 0.5) * -10.0)

        ref_pts = sorted(geo(p) for ch in chains for p in ch)
        got_pts = sorted((c[0], c[1]) for f in feats
                         for c in f["geometry"]["coordinates"])
        assert len(ref_pts) == len(got_pts)
        np.testing.assert_allclose(got_pts, ref_pts, rtol=0, atol=1e-9)


def test_cli_contour_interval_autolevels(tmp_path, ray_session):
    from gdal_ray.cli import main

    dem = np.linspace(0, 50, 40 * 50, dtype=np.float32).reshape(40, 50)
    src = str(tmp_path / "dem.tif")
    with open(src, "wb") as f:
        f.write(encode_geotiff(dem, rows_per_strip=16))
    out = str(tmp_path / "c.geojson")
    assert main(["contour", src, out, "-i", "10"]) == 0
    fc = json.load(open(out))
    levels = sorted({f["properties"]["ELEV"] for f in fc["features"]})
    # the exact max (50.0) crosses under >= marching-squares semantics
    assert levels == [10.0, 20.0, 30.0, 40.0, 50.0]
