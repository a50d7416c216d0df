"""gdaldem CLI door: strip-parallel halo reads ≡ whole-image kernels."""

import numpy as np
import pytest

from gdal_ray.codecs.tiff import encode_geotiff
from gdal_ray.sources.gtiff_reader import assemble, read_geotiff_tiles, tiff_levels
from gdal_ray.stages import dem as demk


@pytest.fixture()
def dem_file(tmp_path):
    y, x = np.mgrid[0:120, 0:150]
    dem = (100 + 40 * np.sin(x / 30) + 30 * np.cos(y / 20)).astype(np.float32)
    p = str(tmp_path / "dem.tif")
    with open(p, "wb") as f:
        f.write(encode_geotiff(dem, geotransform=(0, 10, 0, 2000, 0, -10),
                               epsg=32631, tile_size=64))
    return p, dem


def _run(args_list):
    from gdal_ray.cli import main

    assert main(args_list) == 0


def _read(path):
    meta = tiff_levels(path)[0]
    return assemble(read_geotiff_tiles(path).to_pandas(), meta)


@pytest.mark.parametrize("mode,variant", [
    ("hillshade", "horn"), ("hillshade", "igor"),
    ("hillshade", "multidirectional"), ("slope", None), ("aspect", None),
    ("roughness", None), ("tri", None), ("tpi", None)])
def test_strips_equal_whole_image(dem_file, ray_session, tmp_path,
                                  mode, variant):
    p, dem = dem_file
    out = str(tmp_path / "out.tif")
    args = ["dem", mode, p, out, "--strip", "33"]
    if variant:
        args += ["--variant", variant]
    _run(args)
    got = _read(out)[:, :, 0]

    e = dem[None].astype(np.float64)
    if mode == "hillshade":
        fn = {"horn": demk.hillshade, "igor": demk.hillshade_igor,
              "multidirectional": demk.hillshade_multidirectional}[variant]
        interior = (fn(e, azimuth=315.0, z=1.0, scale=1.0)[0]
                    if variant == "igor" else
                    fn(e, altitude=45.0, z=1.0, scale=1.0)[0]
                    if variant == "multidirectional" else
                    fn(e, azimuth=315.0, altitude=45.0, z=1.0, scale=1.0)[0])
        ref = np.zeros(dem.shape, np.float64)
    elif mode == "slope":
        interior = demk.slope_degrees(e)[0]
        ref = np.full(dem.shape, -9999.0)
    elif mode == "aspect":
        interior = demk.aspect_degrees(e)[0]
        ref = np.full(dem.shape, -9999.0)
    else:
        rough, tri8, tpi9 = demk.window_metrics(e)
        interior = {"roughness": rough[0], "tri": tri8[0] / 8.0,
                    "tpi": tpi9[0] / 8.0}[mode]
        ref = np.full(dem.shape, -9999.0)
    ref[1:-1, 1:-1] = interior
    dt = np.uint8 if mode == "hillshade" else np.float32
    np.testing.assert_array_equal(got, ref.astype(dt))


def test_color_relief_matches_kernel(dem_file, ray_session, tmp_path):
    from gdal_ray.stages.color import color_relief, parse_color_file

    p, dem = dem_file
    ramp_path = str(tmp_path / "ramp.txt")
    with open(ramp_path, "w") as f:
        f.write("# test ramp\n0 0 0 255\n100 0 255 0\n170 255 0 0\n")
    out = str(tmp_path / "cr.tif")
    _run(["dem", "color-relief", p, out, "--color-text", ramp_path,
          "--strip", "50"])
    got = _read(out)
    ramp, _nv = parse_color_file("0 0 0 255\n100 0 255 0\n170 255 0 0\n")
    ref = color_relief(dem, ramp).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)
