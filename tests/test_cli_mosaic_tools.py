"""buildvrt / merge / tindex / xyz / pansharpen CLI doors."""

import json

import numpy as np

from gdal_ray.codecs.tiff import decode_tiff, encode_geotiff


def _band(tif_bytes: bytes) -> np.ndarray:
    a = decode_tiff(tif_bytes)
    return a[:, :, 0] if a.ndim == 3 else a


def _two_tiles(tmp_path):
    """Two 40x30 uint8 tiles side by side on a 1x1-pixel grid."""
    rng = np.random.default_rng(3)
    a = rng.integers(1, 200, size=(30, 40)).astype(np.uint8)
    b = rng.integers(1, 200, size=(30, 40)).astype(np.uint8)
    pa_ = tmp_path / "a.tif"
    pb_ = tmp_path / "b.tif"
    pa_.write_bytes(encode_geotiff(a, geotransform=(0.0, 1.0, 0.0, 30.0,
                                                    0.0, -1.0)))
    pb_.write_bytes(encode_geotiff(b, geotransform=(40.0, 1.0, 0.0, 30.0,
                                                    0.0, -1.0)))
    return a, b, pa_, pb_


def test_cli_buildvrt_and_merge(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    a, b, pa_, pb_ = _two_tiles(tmp_path)
    vrt = tmp_path / "m.vrt"
    rc = main(["buildvrt", str(vrt), str(pa_), str(pb_)])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (rep["width"], rep["height"]) == (80, 30)

    out = tmp_path / "m.tif"
    rc = main(["merge", str(out), str(pa_), str(pb_), "--tile", "16"])
    assert rc == 0
    got = _band(out.read_bytes())
    want = np.concatenate([a, b], axis=1)
    assert (got == want).all()


def test_cli_tindex(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    _, _, pa_, pb_ = _two_tiles(tmp_path)
    out = tmp_path / "idx.geojson"
    rc = main(["tindex", str(out), str(pa_), str(pb_)])
    assert rc == 0
    fc = json.loads(out.read_text())
    assert len(fc["features"]) == 2
    ring0 = fc["features"][0]["geometry"]["coordinates"][0]
    assert ring0[0] == [0.0, 30.0] and ring0[2] == [40.0, 0.0]
    ring1 = fc["features"][1]["geometry"]["coordinates"][0]
    assert ring1[0] == [40.0, 30.0] and ring1[2] == [80.0, 0.0]
    assert fc["features"][0]["properties"]["location"].endswith("a.tif")


def test_cli_xyz(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    src = tmp_path / "g.tif"
    src.write_bytes(encode_geotiff(g, geotransform=(10.0, 2.0, 0.0, 20.0,
                                                    0.0, -2.0)))
    out = tmp_path / "g.xyz"
    rc = main(["xyz", str(src), str(out), "--strip", "2"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_rows"] == 12
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 12
    x, y, z = lines[0].split()
    assert (float(x), float(y), float(z)) == (11.0, 19.0, 0.0)
    x, y, z = lines[-1].split()
    assert (float(x), float(y), float(z)) == (17.0, 15.0, 11.0)


def test_cli_pansharpen(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.stages.color import pansharpen_brovey

    rng = np.random.default_rng(8)
    ms = rng.integers(20, 230, size=(32, 24, 3)).astype(np.uint8)
    pan = rng.integers(20, 230, size=(128, 96)).astype(np.uint8)
    pms = tmp_path / "ms.tif"
    ppan = tmp_path / "pan.tif"
    pms.write_bytes(encode_geotiff(ms))
    ppan.write_bytes(encode_geotiff(pan))
    out = tmp_path / "sharp.tif"
    rc = main(["pansharpen", str(ppan), str(pms), str(out),
               "--strip", "32"])
    assert rc == 0
    got = decode_tiff(out.read_bytes())
    want = pansharpen_brovey(ms, pan)
    assert got.shape == (128, 96, 3)
    assert (got == want).all()
