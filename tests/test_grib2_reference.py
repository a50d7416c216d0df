"""GRIB2 decode pinned against the reference's own autotest fixtures
(gdrivers/grib.py published checksums) — exercises templates 5.41 (PNG
packing), 5.4 (IEEE floats), and 5.3 with order-2 spatial differencing
PLUS primary missing-value management on a Mercator (3.10) grid with
boustrophedon (+j, alternating-row) scan order."""

import os

import numpy as np
import pytest

BASE = "/root/reference/autotest/gdrivers/data/grib"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference grib fixtures absent")


def test_png_packed_template_5_41():
    from gdal_ray.sources.grib2 import read_grib2_field, read_grib2_meta
    from gdal_ray.stages.stats import checksum_plane

    p = os.path.join(BASE, "MRMS_EchoTop_18_00.50_20161015-133230.grib2")
    m = read_grib2_meta(p)
    assert m["messages"][0]["template"] == 41
    arr = read_grib2_field(p, 0)
    assert arr.shape == (1500, 3000)
    assert checksum_plane(arr) == 41854  # autotest test_grib_grib2_read_png


def test_ieee_template_5_4():
    from gdal_ray.sources.grib2 import read_grib2_field, read_grib2_meta

    p = os.path.join(BASE, "gfs.t06z.pgrb2.10p0.f010.grib2")
    m = read_grib2_meta(p)
    assert m["n_messages"] == 6
    assert all(x["template"] == 4 for x in m["messages"])
    arr = read_grib2_field(p, 0)
    assert arr.shape == (18, 36) and arr.dtype == np.float64
    # values are plausible geophysical floats, not garbage
    assert -200 < np.nanmin(arr) and np.nanmax(arr) < 400


def test_complex_sd_missing_mercator_boustrophedon():
    """ds.mint.bin: template 5.3 order-2 + primary missing values on a
    3.10 Mercator grid with scan mode 0x50 (+j, alternating rows).
    GDAL reports the band in Celsius (GRIB_UNIT [C], degrib unit
    normalization) with nodata 9999 — band 2 checksum pinned 46927."""
    from gdal_ray.sources.grib2 import read_grib2_field, read_grib2_meta
    from gdal_ray.stages.stats import checksum_plane

    p = os.path.join(BASE, "ds.mint.bin")
    m = read_grib2_meta(p)  # WMO bulletin headers before each message
    assert m["n_messages"] == 2
    assert m["messages"][0]["grid_template"] == 10
    assert m["messages"][0]["scan"] == 0x50
    arr = read_grib2_field(p, 1)
    assert (arr == 9999.0).sum() > 0  # missing substitute applied
    celsius = np.where(arr == 9999.0, 9999.0, arr - 273.15)
    assert checksum_plane(celsius) == 46927  # autotest init_list band 2
    # band 1 minimum ~13 C (autotest test_grib_read_units)
    b1 = read_grib2_field(p, 0)
    good = b1[b1 != 9999.0] - 273.15
    assert good.min() == pytest.approx(13, abs=1)
