"""Conformance against the reference's OWN test inputs: decode GDAL
autotest fixture rasters with this engine's from-spec codecs and match
the checksums GDAL's test suite pins for them (gcore/tiff_read.py
init_list, gdrivers/png.py) — the north star's "matches the reference's
results on its own test inputs" check, via the bit-exact
GDALChecksumImage reimplementation (stages/stats.checksum_plane).

Not pinned here: palette-indexed fixtures (GDAL reports the index band;
this engine expands PLTE/color tables to RGB(A) by design) and JPEG
(GDAL's own expected values vary by libjpeg build — 34296/34298/17016
for the same file — so exactness is undefined even for the reference;
our JPEG path is PSNR-gated in test_jpeg.py instead)."""

import os

import numpy as np
import pytest

GCORE = "/root/reference/autotest/gcore/data"
GDRV = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GCORE), reason="reference autotest data not present")

# (path, 1-based band, expected GDALChecksumImage) — values from
# autotest/gcore/tiff_read.py init_list and gdrivers/png.py
TIFF_CASES = [
    ("byte.tif", 1, 4672),
    ("int16.tif", 1, 4672),
    ("uint16.tif", 1, 4672),
    ("int32.tif", 1, 4672),
    ("uint32.tif", 1, 4672),
    ("float32.tif", 1, 4672),
    ("float64.tif", 1, 4672),
    # partial final strip/tile stored short (GDAL #1179 tolerance)
    ("separate_tiled.tif", 2, 15234),
    ("seperate_strip.tif", 2, 15234),
    ("contig_tiled.tif", 2, 15234),
    ("contig_strip.tif", 2, 15234),
    ("gtiff/float32_lzw_predictor_3_big_endian.tif", 1, 4672),
]


def _plane(arr, band):
    return arr[:, :, band - 1] if arr.ndim == 3 else arr


@pytest.mark.parametrize("fn,band,want", TIFF_CASES,
                         ids=[c[0] for c in TIFF_CASES])
def test_tiff_fixture_checksum(fn, band, want):
    from gdal_ray.codecs.tiff import read_geotiff
    from gdal_ray.stages.stats import checksum_plane

    arr, _ = read_geotiff(open(os.path.join(GCORE, fn), "rb").read())
    assert checksum_plane(_plane(arr, band)) == want


PNG_CASES = [
    ("png/rgba16.png", 3, 1815),
    ("png/rgba16.png", 4, 4873),
]


@pytest.mark.parametrize("fn,band,want", PNG_CASES,
                         ids=[f"{c[0]}:{c[1]}" for c in PNG_CASES])
def test_png_fixture_checksum(fn, band, want):
    from gdal_ray.codecs.png import decode_png
    from gdal_ray.stages.stats import checksum_plane

    arr = decode_png(open(os.path.join(GDRV, fn), "rb").read())
    assert checksum_plane(_plane(arr, band)) == want


def test_byte_tif_georeferencing():
    """byte.tif's documented geotransform (the canonical utm fixture:
    60m pixels at (440720, 3751320), EPSG:26711)."""
    from gdal_ray.codecs.tiff import read_geotiff

    arr, info = read_geotiff(open(os.path.join(GCORE, "byte.tif"), "rb").read())
    a2 = _plane(arr, 1)
    assert a2.shape == (20, 20)
    gt = info["geotransform"]
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert info["epsg"] == 26711
