"""rgb2pct / pct2rgb CLI doors: sampled median-cut palette, strip-exact
nearest mapping, ColorMap round trip."""

import json

import numpy as np

from gdal_ray.codecs.tiff import decode_tiff, encode_geotiff
from gdal_ray.stages.color import median_cut_palette, nearest_palette_index


def test_cli_rgb2pct_pct2rgb_roundtrip(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    # an image with exactly 8 distinct colors: a palette of 8 must be
    # lossless end to end
    rng = np.random.default_rng(12)
    colors = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, size=(96, 64))
    img = colors[idx]
    src = tmp_path / "rgb.tif"
    src.write_bytes(
        encode_geotiff(img, geotransform=(0.0, 1.0, 0.0, 96.0, 0.0, -1.0)))

    out = tmp_path / "pct.tif"
    rc = main(["rgb2pct", str(src), str(out), "-n", "8", "--sample", "1",
               "--strip", "32"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_colors"] == 8 and rep["n_sampled"] == 96 * 64

    # distributed result == single-pass kernel on the same pool
    pal = median_cut_palette(img.reshape(-1, 3), n_colors=8)
    want_idx = nearest_palette_index(img, pal)
    got_idx = decode_tiff(out.read_bytes())
    got_idx = got_idx[:, :, 0] if got_idx.ndim == 3 else got_idx
    assert (got_idx == want_idx).all()

    # expand back: pct2rgb must reproduce palette[idx] exactly (median
    # cut splits at the pixel-count median, so mixed boxes are possible
    # and the quantization itself need not be lossless)
    back = tmp_path / "back.tif"
    rc = main(["pct2rgb", str(out), str(back), "--strip", "32"])
    assert rc == 0
    got_rgb = decode_tiff(back.read_bytes())
    assert (got_rgb == pal[want_idx]).all()
    # and the quantized image is close to the source (8 colors, 8 boxes)
    err = np.abs(got_rgb.astype(int) - img.astype(int)).mean()
    assert err < 40


def test_cli_rgb2pct_dither_runs(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 30, 3)).astype(np.uint8)
    src = tmp_path / "rgb.tif"
    src.write_bytes(encode_geotiff(img))
    out = tmp_path / "d.tif"
    rc = main(["rgb2pct", str(src), str(out), "-n", "16", "--dither",
               "--strip", "40"])   # one strip -> dither == single-pass
    assert rc == 0
    from gdal_ray.stages.color import dither_fs
    pal = median_cut_palette(img[::4, ::4].reshape(-1, 3), n_colors=16)
    want = dither_fs(img, pal)
    got = decode_tiff(out.read_bytes())
    got = got[:, :, 0] if got.ndim == 3 else got
    assert (got == want).all()
