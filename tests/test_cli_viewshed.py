"""gdal_viewshed CLI door: broadcast-DEM, strip-parallel targets."""

import json

import numpy as np

from gdal_ray.codecs.tiff import decode_tiff, encode_geotiff
from gdal_ray.stages import dem as demk


def test_row_range_strips_equal_full_viewshed():
    rng = np.random.default_rng(7)
    e = rng.integers(0, 300, size=(61, 47)).astype(np.int64)
    full = demk.viewshed(e, 30, 23, obs_height=2)
    got = np.empty_like(full)
    for lo in range(0, 61, 13):
        hi = min(lo + 13, 61)
        got[lo:hi] = demk.viewshed(e, 30, 23, obs_height=2,
                                   row_range=(lo, hi))
    assert (got == full).all()


def test_cli_viewshed_door(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.default_rng(5)
    e = rng.integers(0, 200, size=(96, 80)).astype(np.uint16)
    # a ridge that should block everything behind it from the observer
    e[60, :] = 5000
    src = tmp_path / "dem.tif"
    gt = (100.0, 2.0, 0.0, 400.0, 0.0, -2.0)
    src.write_bytes(encode_geotiff(e, geotransform=gt))
    out = tmp_path / "vis.tif"
    # observer at pixel (row 20, col 40): x = 100 + 2*40.5 -> use cell 40
    ox = 100.0 + 2.0 * 40.0
    oy = 400.0 - 2.0 * 20.0
    rc = main(["viewshed", str(src), str(out),
               "-ox", str(ox), "-oy", str(oy), "--strip", "24"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["observer_rc"] == [20, 40]

    got = decode_tiff(out.read_bytes())
    got = got[:, :, 0] if got.ndim == 3 else got
    want = demk.viewshed(e.astype(np.int64), 20, 40, obs_height=2)
    assert got.shape == (96, 80)
    assert (got == np.where(want, 255, 0)).all()
    assert got[20, 40] == 255            # observer sees itself
    assert (got[62:, :] == 0).all()      # ridge occludes everything past it
    assert rep["n_visible"] == int(want.sum())


def test_cli_viewshed_cumulative(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.default_rng(9)
    e = rng.integers(0, 50, size=(40, 40)).astype(np.uint16)
    src = tmp_path / "dem.tif"
    src.write_bytes(encode_geotiff(e))
    out = tmp_path / "acc.tif"
    rc = main(["viewshed", str(src), str(out), "--cumulative",
               "--os", "20"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_observers"] == 4

    got = decode_tiff(out.read_bytes())
    got = got[:, :, 0] if got.ndim == 3 else got
    want = np.zeros((40, 40), np.int64)
    for r in (10, 30):
        for c in (10, 30):
            want += demk.viewshed(e.astype(np.int64), r, c, obs_height=2)
    assert (got.astype(np.int64) == want).all()
    # every observer sees its own cell
    assert got[10, 10] >= 1 and got[30, 30] >= 1
