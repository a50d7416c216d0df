"""FITS raster driver: round trips, BZERO uint16 convention, the
reference's byte_merc.fits fixture (checksum + exact WCS geotransform
after unit conversion), extension-HDU walk, distributed slab read."""

import math
import os

import numpy as np
import pytest

REF = "/root/reference/autotest/gdrivers/data/fits"


def test_roundtrip_dtypes(tmp_path):
    from gdal_ray.sources.fits import read_fits_array, write_fits

    rng = np.random.RandomState(3)
    for arr in [
        rng.randint(0, 255, (13, 17)).astype(np.uint8),
        rng.randint(-30000, 30000, (8, 9)).astype(np.int16),
        rng.randint(0, 65535, (8, 9)).astype(np.uint16),  # BZERO path
        rng.normal(size=(6, 7)).astype(np.float32),
        rng.normal(size=(5, 5)).astype(np.float64),
        rng.randint(0, 255, (6, 7, 3)).astype(np.uint8),  # NAXIS3 cube
    ]:
        p = tmp_path / "t.fits"
        write_fits(str(p), arr)
        back = read_fits_array(str(p))
        assert back.dtype == arr.dtype and back.shape == arr.shape
        assert np.array_equal(back, arr)
        assert os.path.getsize(p) % 2880 == 0


def test_bzero_cards_written(tmp_path):
    from gdal_ray.sources.fits import fits_meta, write_fits

    p = tmp_path / "u16.fits"
    write_fits(str(p), np.array([[0, 65535]], dtype=np.uint16))
    m = fits_meta(str(p))
    assert m["bitpix"] == 16 and m["uint16_convention"]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
def test_byte_merc_fixture():
    from gdal_ray.sources.fits import fits_meta, read_fits_array
    from gdal_ray.stages.stats import checksum_plane

    path = os.path.join(REF, "byte_merc.fits")
    arr = read_fits_array(path)
    assert checksum_plane(arr) == 4672  # the canonical byte fixture value
    m = fits_meta(path)
    assert m["nodata"] == -9999.0
    assert m["ctype"] == ("EALN-MER", "EALT-MER")
    # GDAL reports this file in projected meters: WCS units x (pi/180 x
    # A_RADIUS).  autotest/gdrivers/fits.py pins the meter values.
    k = math.radians(1.0) * m["cards"]["A_RADIUS"]
    gt = m["geotransform"]
    assert gt[0] * k == pytest.approx(-13095897.481058259, abs=1e-3)
    assert gt[1] * k == pytest.approx(72.23522015778646, abs=1e-9)
    assert gt[3] * k == pytest.approx(3991653.2130816197, abs=1e-3)
    assert gt[5] * k == pytest.approx(-72.23522015778646, abs=1e-9)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
def test_extension_walk():
    from gdal_ray.sources.fits import fits_meta

    m = fits_meta(os.path.join(REF, "image_in_second_hdu.fits"))
    assert m["width"] == 0 or m["bands"] >= 1  # empty primary tolerated
    assert len(m["extensions"]) == 1
    assert m["extensions"][0]["xtension"] == "IMAGE"


def test_distributed_slab_read(ray_session, tmp_path):
    from gdal_ray.sources import open_raster
    from gdal_ray.sources.fits import read_fits_array, write_fits

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 9999, (100, 40)).astype(np.int32)
    p = tmp_path / "big.fits"
    write_fits(str(p), arr)
    rows = open_raster(str(p), rows_per_block=32).to_pandas()
    assert sorted(rows["row0"]) == [0, 32, 64, 96]
    got = np.zeros_like(arr)
    for r in rows.itertuples():
        got[r.row0:r.row0 + r.n_rows] = np.frombuffer(
            r.data, dtype=np.int32).reshape(r.n_rows, 40)
    assert np.array_equal(got, read_fits_array(str(p)))


def test_info_door(tmp_path):
    from gdal_ray.info import describe
    from gdal_ray.sources.fits import write_fits

    p = tmp_path / "i.fits"
    write_fits(str(p), np.zeros((4, 6), dtype=np.float32),
               extra_cards={"CRPIX1": 1.0, "CRVAL1": 10.0, "CDELT1": 0.5,
                            "CRPIX2": 1.0, "CRVAL2": 20.0, "CDELT2": -0.5})
    out = describe(str(p))
    assert out["driver"] == "FITS" and out["size"] == [6, 4]
    assert out["geotransform"][0] == 10.0 - 0.25  # center -> edge shift
