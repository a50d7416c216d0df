"""read_image_dir: file-per-image ingest door (sources/__init__.py) +
histogram equalization (stages/stats.equalize, gdalenhance analogue)."""

import numpy as np

from gdal_ray.codecs import encode_png
from gdal_ray.sources import read_image_dir
from gdal_ray.stages.stats import equalization_lut, equalize


def test_read_image_dir(ray_session, tmp_path):
    rng = np.random.default_rng(2)
    shapes = {"a": (20, 30), "b": (15, 10), "c": (8, 8)}
    for name, (h, w) in shapes.items():
        arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        open(tmp_path / f"{name}.png", "wb").write(encode_png(arr))
    df = read_image_dir(str(tmp_path)).to_pandas().set_index("image_id")
    assert len(df) == 3
    for name, (h, w) in shapes.items():
        assert (df.loc[name, "h"], df.loc[name, "w"]) == (h, w)
        assert df.loc[name, "fmt"] == "png"


def test_read_image_dir_decode_pixels(ray_session, tmp_path):
    arr = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    open(tmp_path / "x.png", "wb").write(encode_png(arr))
    df = read_image_dir(str(tmp_path), decode=True).to_pandas()
    got = np.frombuffer(df["pixels"].iloc[0], np.uint8).reshape(4, 5, 3)
    assert np.array_equal(got, arr)


def test_equalize_vs_naive():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (3, 16, 16)).astype(np.int64)
    out = equalize(g)
    for i in range(3):
        counts = np.bincount(g[i].ravel(), minlength=256)
        cdf = counts.cumsum()
        cdfmin = cdf[np.nonzero(counts)[0][0]]
        lut = (cdf - cdfmin) * 255 // (256 - cdfmin)
        assert np.array_equal(out[i], lut[g[i]])


def test_equalize_constant_image_is_zero():
    g = np.full((1, 8, 8), 42, np.int64)
    assert equalize(g).max() == 0  # degenerate: den clamped, no div-by-zero


def test_equalize_uniform_is_identity_ramp():
    g = np.tile(np.arange(16), (1, 16, 1)).reshape(1, 16, 16)
    lut = equalization_lut(g, levels=16)
    assert np.array_equal(lut[0], np.arange(16))
