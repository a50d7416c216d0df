"""gdal_sieve / gdal_fillnodata / nearblack CLI doors: strip-parallel
CCL + driver component-graph merge (sieve, nearblack) and halo strips
(fillnodata) — each pinned identical to its single-pass kernel."""

import json

import numpy as np

from gdal_ray.codecs.tiff import decode_tiff, encode_geotiff
from gdal_ray.stages import rasterops as ro


def _band(tif_bytes: bytes) -> np.ndarray:
    a = decode_tiff(tif_bytes)
    return a[:, :, 0] if a.ndim == 3 else a


def test_distributed_sieve_equals_single_pass():
    rng = np.random.default_rng(17)
    for trial in range(8):
        H, W = int(rng.integers(24, 70)), int(rng.integers(12, 44))
        g = rng.integers(0, 4, size=(H, W)).astype(np.int32)
        thr = int(rng.integers(2, 9))
        c8 = bool(trial % 2)
        want = ro.sieve(g.copy(), threshold=thr, connect8=c8)
        sh = int(rng.integers(6, 22))
        strips = [(y0, g[y0:min(y0 + sh, H)]) for y0 in range(0, H, sh)]
        got = np.concatenate(
            ro.distributed_sieve(strips, threshold=thr, connect8=c8))
        assert (got == want).all(), (trial, thr, c8)


def test_cli_sieve_door(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.default_rng(23)
    g = rng.integers(0, 3, size=(100, 64)).astype(np.uint8)
    src = tmp_path / "c.tif"
    src.write_bytes(encode_geotiff(g))
    out = tmp_path / "s.tif"
    rc = main(["sieve", str(src), str(out), "-st", "5", "--strip", "32"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = _band(out.read_bytes())
    want = ro.sieve(g.copy(), threshold=5)
    assert (got == want).all()
    assert rep["n_changed"] == int((want != g).sum()) and rep["n_changed"] > 0


def test_cli_fillnodata_door(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.default_rng(31)
    g = rng.integers(10, 200, size=(90, 50)).astype(np.uint16)
    # punch nodata holes (value 0)
    holes = rng.random((90, 50)) < 0.08
    g[20:24, 10:18] = 0          # a block hole
    g[holes] = 0
    src = tmp_path / "h.tif"
    src.write_bytes(encode_geotiff(g))
    out = tmp_path / "f.tif"
    rc = main(["fillnodata", str(src), str(out), "--nodata", "0",
               "--max-iter", "16", "--strip", "24"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = _band(out.read_bytes())
    want = ro.fill_nodata(g, g == 0, max_iter=16)
    assert (got == np.rint(want).astype(np.uint16)).all()
    assert rep["n_unfilled"] == 0


def test_cli_nearblack_door(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.default_rng(41)
    img = rng.integers(30, 255, size=(120, 80)).astype(np.uint8)
    # dark collar wedge from the border + an interior dark blob that must
    # NOT be cleaned (not border-connected)
    img[:10, :] = rng.integers(0, 10)
    img[:, :6] = rng.integers(0, 10)
    img[60:70, 40:50] = 3
    src = tmp_path / "n.tif"
    src.write_bytes(encode_geotiff(img))
    out = tmp_path / "nb.tif"
    rc = main(["nearblack", str(src), str(out), "--near", "15",
               "--strip", "32"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = _band(out.read_bytes())
    want, collar = ro.nearblack(img, threshold=15, value=0)
    assert (got == want).all()
    assert rep["n_collar"] == int(collar.sum())
    assert (got[60:70, 40:50] == 3).all()   # interior blob untouched
    assert (got[:10, :] == 0).all()         # collar cleaned
