"""gdal_grid CLI door: vector points -> interpolated raster via the
replicate-to-cells scatter + one cell groupby."""

import json

import numpy as np

from gdal_ray.codecs.tiff import decode_tiff


def _geojson_points(path, pts):
    feats = [{"type": "Feature",
              "properties": {"z": float(z)},
              "geometry": {"type": "Point", "coordinates": [x, y]}}
             for x, y, z in pts]
    path.write_text(json.dumps(
        {"type": "FeatureCollection", "features": feats}))


def _band(tif_bytes: bytes) -> np.ndarray:
    a = decode_tiff(tif_bytes)
    return a[:, :, 0] if a.ndim == 3 else a


def test_cli_grid_average(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.default_rng(6)
    pts = [(float(x), float(y), float(z)) for x, y, z in
           zip(rng.uniform(0, 8, 50), rng.uniform(0, 8, 50),
               rng.integers(1, 100, 50))]
    src = tmp_path / "p.geojson"
    _geojson_points(src, pts)
    out = tmp_path / "g.tif"
    rc = main(["grid", str(src), str(out), "--alg",
               "average:radius=2:nodata=-1", "--outsize", "8x8",
               "--extent", "0,0,8,8", "--zfield", "z"])
    assert rc == 0
    got = _band(out.read_bytes())
    assert got.shape == (8, 8)

    # brute-force oracle: pixel centers, radius-2 average
    want = np.full((8, 8), -1.0, dtype=np.float64)
    P = np.array(pts)
    for j in range(8):
        for i in range(8):
            cx, cy = i + 0.5, 8 - (j + 0.5)
            d2 = (P[:, 0] - cx) ** 2 + (P[:, 1] - cy) ** 2
            sel = d2 <= 4.0
            if sel.any():
                want[j, i] = P[sel, 2].sum() / sel.sum()
    assert np.allclose(got, want.astype(np.float32))


def test_cli_grid_nearest_and_count(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    pts = [(1.0, 1.0, 7.0), (3.2, 3.2, 9.0), (1.2, 1.0, 4.0)]
    src = tmp_path / "p.geojson"
    _geojson_points(src, pts)

    out = tmp_path / "n.tif"
    rc = main(["grid", str(src), str(out), "--alg",
               "nearest:radius=1.5:nodata=-1", "--outsize", "4x4",
               "--extent", "0,0,4,4", "--zfield", "z"])
    assert rc == 0
    got = _band(out.read_bytes())
    # pixel (row 2, col 0) center = (0.5, 1.5): nearest point is (1,1) z=7
    assert got[2, 0] == 7.0
    # pixel center (3.5, 3.5): nearest is (3.2,3.2) z=9
    assert got[0, 3] == 9.0
    # far corner pixel (0.5, 3.5) has no point within 1.5
    assert got[0, 0] == -1.0

    out2 = tmp_path / "c.tif"
    rc = main(["grid", str(src), str(out2), "--alg",
               "count:radius=1.0", "--outsize", "4x4",
               "--extent", "0,0,4,4", "--zfield", "z"])
    assert rc == 0
    got2 = _band(out2.read_bytes())
    # pixel center (1.5, 1.5): points (1,1) d2=0.5 and (1.2,1) d2=0.34 -> 2
    assert got2[2, 1] == 2.0
