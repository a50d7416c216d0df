"""gdal_proximity CLI door: strip-parallel exact EDT over a GeoTIFF."""

import json

import numpy as np

from gdal_ray.codecs.tiff import decode_tiff, encode_geotiff
from gdal_ray.stages import rasterops as ro


def test_strip_proximity_equals_single_pass():
    rng = np.random.default_rng(3)
    t = rng.random((80, 37)) < 0.03
    t[:, 5] = False
    full = ro.proximity_sq(t)
    got = np.empty_like(full)
    for r0 in range(0, 80, 16):
        r1 = min(r0 + 16, 80)
        ta, tb = t[:r0], t[r1:]
        above = np.full(37, -1, np.int64)
        below = np.full(37, -1, np.int64)
        if ta.size:
            anyc = ta.any(axis=0)
            above = np.where(
                anyc, ta.shape[0] - 1 - ta[::-1].argmax(axis=0), -1
            ).astype(np.int64)
        if tb.size:
            anyc = tb.any(axis=0)
            below = np.where(anyc, r1 + tb.argmax(axis=0), -1).astype(np.int64)
        got[r0:r1] = ro.strip_proximity_sq(t[r0:r1], r0, above, below)
    assert (got == full).all()


def test_cli_proximity_door(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.default_rng(11)
    arr = np.zeros((120, 90), dtype=np.uint8)
    pts = rng.integers(0, [120, 90], size=(14, 2))
    arr[pts[:, 0], pts[:, 1]] = 255
    src = tmp_path / "t.tif"
    src.write_bytes(
        encode_geotiff(arr, geotransform=(10.0, 3.0, 0.0, 50.0, 0.0, -3.0))
    )
    out = tmp_path / "d.tif"
    rc = main(["proximity", str(src), str(out), "--values", "255",
               "--strip", "32"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_strips"] == 4

    d = decode_tiff(out.read_bytes())
    d = d[:, :, 0] if d.ndim == 3 else d
    want = np.sqrt(ro.proximity_sq(arr == 255).astype(np.float64))
    assert d.shape == (120, 90)
    assert np.allclose(d, want.astype(np.float32))
    assert (d[pts[:, 0], pts[:, 1]] == 0).all()

    # GEO distance units scale by pixel size
    out2 = tmp_path / "g.tif"
    rc = main(["proximity", str(src), str(out2), "--values", "255",
               "--strip", "32", "--distunits", "GEO"])
    assert rc == 0
    capsys.readouterr()
    g = decode_tiff(out2.read_bytes())
    g = g[:, :, 0] if g.ndim == 3 else g
    assert np.allclose(g, (want * 3.0).astype(np.float32))

    # maxdist clips to nodata
    out3 = tmp_path / "m.tif"
    rc = main(["proximity", str(src), str(out3), "--values", "255",
               "--strip", "32", "--maxdist", "5", "--nodata", "-1"])
    assert rc == 0
    capsys.readouterr()
    m = decode_tiff(out3.read_bytes())
    m = m[:, :, 0] if m.ndim == 3 else m
    assert np.allclose(m[want <= 5], want.astype(np.float32)[want <= 5])
    assert (m[want > 5] == -1).all()
