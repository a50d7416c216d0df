import numpy as np

from gdal_ray import tilemath as tm
from gdal_ray.stages.warp import suggested_output, warp_image


def test_suggested_output_identity_crs_preserves_grid():
    gt = (10.0, 0.01, 0.0, 50.0, 0.0, -0.01)
    dw, dh, dgt = suggested_output(100, 80, gt, "EPSG:4326", "EPSG:4326")
    assert (dw, dh) == (100, 80)
    assert np.isclose(dgt[1], 0.01)


def test_warp_identity_nearest_is_exact():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (40, 60), dtype=np.uint8)
    gt = (0.0, 0.1, 0.0, 4.0, 0.0, -0.1)
    out, dgt = warp_image(img, gt, "EPSG:4326", "EPSG:4326", dst_size=(60, 40), dst_gt=gt, method="nearest")
    assert np.array_equal(out, img)


def test_warp_roundtrip_4326_3857_constant():
    img = np.full((32, 32), 99, np.uint8)
    gt = (10.0, 0.01, 0.0, 45.0, 0.0, -0.01)
    out, dgt = warp_image(img, gt, "EPSG:4326", "EPSG:3857", method="bilinear")
    assert out.shape[0] > 0 and np.all(out == 99)


def test_warp_gradient_maxdiff_1dn():
    """autotest/alg/warp.py idiom: warp there and back, max |diff| <= 1 DN
    on the interior (away from edge clamping)."""
    yy, xx = np.mgrid[0:64, 0:64]
    img = ((xx * 2 + yy) % 256).astype(np.uint8)
    gt = (5.0, 0.005, 0.0, 40.0, 0.0, -0.005)
    m, dgt = warp_image(img, gt, "EPSG:4326", "EPSG:3857", method="bilinear")
    back, _ = warp_image(
        m, dgt, "EPSG:3857", "EPSG:4326", dst_size=(64, 64), dst_gt=gt, method="bilinear"
    )
    interior = np.s_[4:-4, 4:-4]
    diff = np.abs(back[interior].astype(int) - img[interior].astype(int))
    # bilinear smoothing on a linear ramp should reconstruct within 2 DN
    assert diff.max() <= 2, diff.max()


def test_warp_nodata_outside_source():
    img = np.full((16, 16), 50, np.uint8)
    gt = (0.0, 0.1, 0.0, 1.6, 0.0, -0.1)
    # dst window twice as large -> outside area gets nodata
    dst_gt = (-0.8, 0.1, 0.0, 2.4, 0.0, -0.1)
    out, _ = warp_image(
        img, gt, "EPSG:4326", "EPSG:4326", dst_size=(32, 32), dst_gt=dst_gt, method="nearest", nodata=7
    )
    assert out[0, 0] == 7 and out[16, 16] == 50
