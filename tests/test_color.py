"""Median-cut palette, dither, palette expansion, Brovey pansharpen."""

import numpy as np

from gdal_ray.stages import color


def test_median_cut_exact_colors():
    # exactly 4 distinct colors → palette contains all of them
    cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]], np.uint8)
    px = np.repeat(cols, 50, axis=0)
    pal = color.median_cut_palette(px, n_colors=4)
    got = {tuple(c) for c in pal}
    assert {tuple(c) for c in cols} <= got


def test_nearest_palette_roundtrip():
    pal = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0]], np.uint8)
    img = np.array([[[10, 10, 10], [250, 250, 250]], [[240, 5, 5], [0, 0, 0]]], np.uint8)
    idx = color.nearest_palette_index(img, pal)
    assert idx.tolist() == [[0, 1], [2, 0]]
    rgb = color.expand_palette(idx, pal)
    assert rgb[0, 1].tolist() == [255, 255, 255]


def test_dither_constant_mid_gray():
    # 50% gray dithered to {black, white} → approx half white, error bounded
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    img = np.full((16, 16, 3), 128, np.uint8)
    idx = color.dither_fs(img, pal)
    frac_white = idx.mean()
    assert 0.4 < frac_white < 0.6
    # plain nearest would be all-one-color: dither must differ
    assert len(np.unique(idx)) == 2


def test_dither_deterministic():
    rng = np.random.Generator(np.random.PCG64(5))
    img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    pal = color.median_cut_palette(img.reshape(-1, 3), 8)
    a = color.dither_fs(img, pal)
    b = color.dither_fs(img, pal)
    assert (a == b).all()


def test_pansharpen_identity():
    # pan == pseudo-pan of the upsampled rgb → output equals upsampled rgb
    rgb = np.full((4, 4, 3), 90, np.uint8)
    pan = np.full((8, 8), 90, np.float64)
    out = color.pansharpen_brovey(rgb, pan)
    assert (out == 90).all()


def test_pansharpen_scales_with_pan():
    rgb = np.full((4, 4, 3), 60, np.uint8)
    pan = np.full((8, 8), 120, np.float64)  # 2× brighter pan
    out = color.pansharpen_brovey(rgb, pan)
    assert (out == 120).all()


def test_parse_color_file_gdaldem_rules():
    import numpy as np

    from gdal_ray.stages.color import color_relief, parse_color_file

    txt = """
    # comment
    nv 1 2 3
    0 blue
    50% 255,255,0   // midpoint via percentage
    1000 white
    """
    ramp, nv = parse_color_file(txt, min_val=0, max_val=1000)
    assert nv == (1, 2, 3)
    assert ramp == [(0, (0, 0, 255)), (500, (255, 255, 0)),
                    (1000, (255, 255, 255))]
    out = color_relief(np.array([0, 500, 1000]), ramp)
    assert out.tolist() == [[0, 0, 255], [255, 255, 0], [255, 255, 255]]


def test_parse_color_file_percentage_requires_bounds():
    import pytest

    from gdal_ray.stages.color import parse_color_file

    with pytest.raises(ValueError):
        parse_color_file("50% 1 2 3")
