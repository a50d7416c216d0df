"""gdalwarp CLI door: strip-parallel warp ≡ single-shot warp_image, and
the windowed source reader it relies on."""

import numpy as np
import pytest

from gdal_ray.codecs.tiff import encode_geotiff
from gdal_ray.sources.gtiff_reader import read_window, tiff_levels


def _src(tmp_path, *, tile_size=64, rows_per_strip=None):
    y, x = np.mgrid[0:300, 0:400]
    img = ((x * 3 + y * 2) % 256).astype(np.uint8)
    gt = (500000.0, 10.0, 0.0, 4650000.0, 0.0, -10.0)
    p = str(tmp_path / "src.tif")
    with open(p, "wb") as f:
        f.write(encode_geotiff(img, geotransform=gt, epsg=32631,
                               tile_size=tile_size,
                               rows_per_strip=rows_per_strip))
    return p, img, gt


@pytest.mark.parametrize("layout", ["tiled", "striped"])
def test_read_window(tmp_path, layout):
    p, img, _ = _src(tmp_path,
                     tile_size=64 if layout == "tiled" else None,
                     rows_per_strip=37 if layout == "striped" else None)
    meta = tiff_levels(p)[0]
    for (r0, r1, c0, c1) in [(0, 300, 0, 400), (10, 70, 5, 130),
                             (250, 300, 350, 400), (63, 65, 63, 129)]:
        with open(p, "rb") as f:
            win = read_window(f, meta, r0, r1, c0, c1)
        np.testing.assert_array_equal(win[:, :, 0], img[r0:r1, c0:c1])


def test_cli_warp_equals_single_shot(tmp_path, ray_session):
    from gdal_ray.cli import main
    from gdal_ray.sources.gtiff_reader import assemble, read_geotiff_tiles
    from gdal_ray.stages.warp import warp_image

    p, img, gt = _src(tmp_path)
    out = str(tmp_path / "out.tif")
    assert main(["warp", p, out, "--t_srs", "EPSG:4326", "-r", "bilinear",
                 "--strip", "40"]) == 0

    # single-shot reference on the same suggested output grid
    ref, ref_gt = warp_image(img, gt, "EPSG:32631", "EPSG:4326",
                             method="bilinear")
    meta = tiff_levels(out)[0]
    got = assemble(read_geotiff_tiles(out).to_pandas(), meta)[:, :, 0]
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_allclose(meta["geotransform"], ref_gt, rtol=1e-12)
    assert meta["epsg"] == 4326
