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


def test_cubicspline_constant_preserved_and_matches_naive():
    """GRA_CubicSpline (B-spline B3, alg/gdalresamplingkernels.h): kernel
    is a partition of unity (constant preserved); vectorized separable
    path must match a naive direct evaluation."""
    import numpy as np

    from gdal_ray.stages.resample import _bspline_weight, resize

    const = np.full((10, 14), 99, np.uint8)
    out = resize(const, 7, 5, method="cubicspline")
    assert (out == 99).all()

    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, size=(9, 11)).astype(np.float64)
    out = resize(img, 22, 18, method="cubicspline")  # upsample (ksc=1)
    oh, ow = out.shape
    for oy in (0, 5, 17):
        for ox in (0, 7, 21):
            cy = (oy + 0.5) * (9 / 18) - 0.5
            cx = (ox + 0.5) * (11 / 22) - 0.5
            acc = wsum = 0.0
            for iy in range(int(np.floor(cy)) - 2, int(np.floor(cy)) + 4):
                for ix in range(int(np.floor(cx)) - 2, int(np.floor(cx)) + 4):
                    w = (_bspline_weight(np.array([iy - cy]))
                         * _bspline_weight(np.array([ix - cx])))[0]
                    acc += w * img[np.clip(iy, 0, 8), np.clip(ix, 0, 10)]
                    wsum += w
            assert abs(out[oy, ox] - acc / wsum) < 1e-9
