"""gdal_translate CLI door: strip-parallel windowed copy/resize equals
the whole-image reference for every resampling method."""

import numpy as np
import pytest

from gdal_ray.codecs.tiff import encode_geotiff
from gdal_ray.sources.gtiff_reader import assemble, read_geotiff_tiles, tiff_levels
from gdal_ray.stages.resample import resize, resize_rows, rows_needed


def _img():
    y, x = np.mgrid[0:300, 0:400]
    return ((x * 5 + y * 3 + (x * y) % 7) % 256).astype(np.uint8)


@pytest.mark.parametrize("method", ["nearest", "bilinear", "cubic",
                                    "cubicspline", "lanczos", "average"])
@pytest.mark.parametrize("oh,ow", [(125, 175), (600, 800), (300, 400)])
def test_resize_rows_equals_full(method, oh, ow):
    img = _img()
    full = resize(img, ow, oh, method)
    got = np.empty_like(full)
    th = 37                                  # deliberately ragged strips
    for y0 in range(0, oh, th):
        t = min(th, oh - y0)
        r0, r1 = rows_needed(img.shape[0], oh, y0, t, method)
        got[y0:y0 + t] = resize_rows(img[r0:r1], r0, img.shape[0],
                                     ow, oh, y0, t, method)
    np.testing.assert_array_equal(got, full)


def test_cli_translate_window_resize_scale(tmp_path, ray_session):
    from gdal_ray.cli import main

    img = _img()
    gt = (500000.0, 10.0, 0.0, 4650000.0, 0.0, -10.0)
    src = str(tmp_path / "src.tif")
    with open(src, "wb") as f:
        f.write(encode_geotiff(img, geotransform=gt, epsg=32631,
                               tile_size=64))
    out = str(tmp_path / "out.tif")
    assert main(["translate", src, out, "--srcwin", "20", "30", "350", "250",
                 "--outsize", "175", "125", "-r", "average",
                 "--strip", "40"]) == 0
    meta = tiff_levels(out)[0]
    got = assemble(read_geotiff_tiles(out).to_pandas(), meta)[:, :, 0]
    ref = resize(img[30:280, 20:370], 175, 125, "average")
    np.testing.assert_array_equal(got, ref)
    # affine: origin shifted by the window, pixel size doubled
    np.testing.assert_allclose(
        meta["geotransform"],
        (500000.0 + 20 * 10.0, 20.0, 0.0, 4650000.0 - 30 * 10.0, 0.0, -20.0))
    assert meta["epsg"] == 32631


def test_cli_translate_scale_ot(tmp_path, ray_session):
    from gdal_ray.cli import main

    img = _img()
    src = str(tmp_path / "src.tif")
    with open(src, "wb") as f:
        f.write(encode_geotiff(img, rows_per_strip=64))
    out = str(tmp_path / "out.tif")
    assert main(["translate", src, out, "--scale", "0", "255", "0", "1",
                 "--ot", "float32"]) == 0
    meta = tiff_levels(out)[0]
    got = assemble(read_geotiff_tiles(out).to_pandas(), meta)[:, :, 0]
    np.testing.assert_allclose(got, (img / 255.0).astype(np.float32))
    assert np.dtype(meta["dtype"]) == np.float32


def test_translate_jp2_io(ray_session, tmp_path):
    """gdal_translate door with JPEG 2000 source and destination: the
    .jp2 shim decodes (Ray-parallel tier-1) into the strip pipeline and
    re-encodes losslessly, georeferencing carried through."""
    import json
    import subprocess
    import sys

    src = "/root/reference/autotest/gdrivers/data/jpeg2000/byte.jp2"
    t1 = str(tmp_path / "o.tif")
    t2 = str(tmp_path / "o2.jp2")
    env = dict(__import__("os").environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run([sys.executable, "-m", "gdal_ray.cli", "translate",
                         src, t1], capture_output=True, text=True, env=env)
    assert r1.returncode == 0, r1.stderr[-500:]
    o1 = json.loads(r1.stdout.strip().splitlines()[-1])
    r2 = subprocess.run([sys.executable, "-m", "gdal_ray.cli", "translate",
                         t1, t2], capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stderr[-500:]
    o2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert o1["checksum"] == o2["checksum"]

    from gdal_ray.sources.jp2 import jp2_info

    i = jp2_info(t2)
    assert i["geotransform"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert i["epsg"] == 26711
