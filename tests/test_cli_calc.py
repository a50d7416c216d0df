"""gdal_calc CLI door: distributed per-tile band math over two GeoTIFFs."""

import json

import numpy as np

from gdal_ray.codecs.tiff import decode_tiff, encode_geotiff


def test_cli_calc_two_rasters(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.RandomState(3)
    A = rng.randint(0, 200, (70, 90), dtype=np.uint8).astype(np.uint8)
    B = rng.randint(0, 50, (70, 90), dtype=np.uint8).astype(np.uint8)
    pa_ = tmp_path / "a.tif"
    pb_ = tmp_path / "b.tif"
    pa_.write_bytes(encode_geotiff(A, tile_size=32))
    pb_.write_bytes(encode_geotiff(B, tile_size=32))
    out = tmp_path / "c.tif"
    rc = main(["calc", "--calc", "A*2 + where(B > 25, B, 0)",
               "-i", "A", str(pa_), "-i", "B", str(pb_), str(out)])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = (A.astype(np.float64) * 2
            + np.where(B > 25, B.astype(np.float64), 0)).astype(np.float32)
    got = decode_tiff(out.read_bytes())
    got = got[:, :, 0] if got.ndim == 3 else got
    assert got.shape == (70, 90)
    assert np.array_equal(got, want)
    assert rep["checksum"] == float(want.sum(dtype=np.float64))


def test_cli_calc_dim_mismatch_rejected(ray_session, tmp_path):
    import pytest

    from gdal_ray.cli import main

    a = tmp_path / "a.tif"
    b = tmp_path / "b.tif"
    a.write_bytes(encode_geotiff(np.zeros((8, 8), np.uint8)))
    b.write_bytes(encode_geotiff(np.zeros((9, 8), np.uint8)))
    with pytest.raises(SystemExit):
        main(["calc", "--calc", "A+B", "-i", "A", str(a),
              "-i", "B", str(b), str(tmp_path / "c.tif")])
