"""Homography + geolocation-array transformers (transformer.py).

Reference semantics: GDALCreateHomographyTransformerFromGCPs
(alg/gdal_homography.cpp) and GDALCreateGeoLocTransformer
(alg/gdalgeoloc.cpp, inverse via gdalgeolocquadtree.cpp) — both
reimplemented from the published math (normalized DLT; bilinear
geolocation surface with Newton inverse)."""

import numpy as np
import pytest

from gdal_ray.stages.warp import warp_image
from gdal_ray.transformer import geoloc_transformer, homography_transformer


# ------------------------------------------------------------- homography


def _quad_gcps():
    # unit square -> convex quadrilateral (a genuinely projective map)
    return np.array([
        [0.0, 0.0, 10.0, 20.0],
        [1.0, 0.0, 30.0, 22.0],
        [1.0, 1.0, 33.0, 48.0],
        [0.0, 1.0, 8.0, 45.0],
    ])


def test_homography_exact_on_4_gcps():
    g = _quad_gcps()
    fwd, inv = homography_transformer(g)
    X, Y = fwd(g[:, 0], g[:, 1])
    assert np.allclose(X, g[:, 2], atol=1e-9)
    assert np.allclose(Y, g[:, 3], atol=1e-9)
    x, y = inv(g[:, 2], g[:, 3])
    assert np.allclose(x, g[:, 0], atol=1e-9)
    assert np.allclose(y, g[:, 1], atol=1e-9)


def test_homography_roundtrip_interior_and_midpoint_consistency():
    fwd, inv = homography_transformer(_quad_gcps())
    rng = np.random.Generator(np.random.PCG64(3))
    x = rng.uniform(0, 1, 50)
    y = rng.uniform(0, 1, 50)
    X, Y = fwd(x, y)
    xb, yb = inv(X, Y)
    assert np.allclose(xb, x, atol=1e-9)
    assert np.allclose(yb, y, atol=1e-9)
    # projective, not affine: the center does NOT map to the dst centroid
    cx, cy = fwd(0.5, 0.5)
    g = _quad_gcps()
    assert not (abs(cx - g[:, 2].mean()) < 1e-12
                and abs(cy - g[:, 3].mean()) < 1e-12)


def test_homography_least_squares_recovers_true_h():
    H = np.array([[2.0, 0.3, 5.0], [-0.2, 1.5, 7.0], [1e-3, -2e-3, 1.0]])

    def apply(x, y):
        w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
        return ((H[0, 0] * x + H[0, 1] * y + H[0, 2]) / w,
                (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / w)

    rng = np.random.Generator(np.random.PCG64(7))
    x = rng.uniform(0, 100, 24)
    y = rng.uniform(0, 100, 24)
    X, Y = apply(x, y)
    fwd, _ = homography_transformer(np.stack([x, y, X, Y], -1))
    tx, ty = apply(33.3, 66.6)
    gx, gy = fwd(33.3, 66.6)
    assert abs(gx - tx) < 1e-6 and abs(gy - ty) < 1e-6


def test_homography_guards():
    with pytest.raises(ValueError):
        homography_transformer(np.zeros((3, 4)))
    with pytest.raises(ValueError):
        homography_transformer(np.zeros((4, 3)))


# ------------------------------------------------------------- geoloc


def _bent_field(nr=20, nc=30):
    rr, cc = np.meshgrid(np.arange(nr, dtype=float),
                         np.arange(nc, dtype=float), indexing="ij")
    gx = 100.0 + 2.0 * cc + 0.4 * np.sin(rr / 4.0)
    gy = 500.0 - 3.0 * rr + 0.3 * np.cos(cc / 5.0)
    return gx, gy


def test_geoloc_fwd_hits_array_nodes_exactly():
    gx, gy = _bent_field()
    fwd, _ = geoloc_transformer(gx, gy)
    rr, cc = np.meshgrid(np.arange(gx.shape[0]), np.arange(gx.shape[1]),
                         indexing="ij")
    X, Y = fwd(cc.astype(float), rr.astype(float))
    assert np.allclose(X, gx, atol=1e-12)
    assert np.allclose(Y, gy, atol=1e-12)


def test_geoloc_roundtrip_fractional_points():
    gx, gy = _bent_field()
    fwd, inv = geoloc_transformer(gx, gy)
    rng = np.random.Generator(np.random.PCG64(11))
    px = rng.uniform(0, gx.shape[1] - 1, 100)
    ln = rng.uniform(0, gx.shape[0] - 1, 100)
    X, Y = fwd(px, ln)
    pb, lb = inv(X, Y)
    assert np.abs(pb - px).max() < 1e-7
    assert np.abs(lb - ln).max() < 1e-7


def test_geoloc_offsets_and_steps():
    gx, gy = _bent_field()
    # geoloc sampled every 4 pixels / 2 lines starting at (1.5, 0.5)
    fwd, inv = geoloc_transformer(gx, gy, pixel_offset=1.5, line_offset=0.5,
                                  pixel_step=4.0, line_step=2.0)
    # array node (r=3, c=5) corresponds to pixel 1.5+5*4, line 0.5+3*2
    X, Y = fwd(21.5, 6.5)
    assert abs(X - gx[3, 5]) < 1e-12 and abs(Y - gy[3, 5]) < 1e-12
    pb, lb = inv(X, Y)
    assert abs(pb - 21.5) < 1e-7 and abs(lb - 6.5) < 1e-7


def test_geoloc_edge_extrapolation_is_linear():
    # a purely affine field extrapolates exactly beyond the array
    rr, cc = np.meshgrid(np.arange(8, dtype=float), np.arange(9, dtype=float),
                         indexing="ij")
    gx = 10.0 + 3.0 * cc
    gy = 50.0 - 2.0 * rr
    fwd, inv = geoloc_transformer(gx, gy)
    X, Y = fwd(np.array([-1.0, 10.0]), np.array([-2.0, 9.0]))
    assert np.allclose(X, [10.0 - 3.0, 10.0 + 30.0])
    assert np.allclose(Y, [50.0 + 4.0, 50.0 - 18.0])
    pb, lb = inv(X, Y)
    assert np.allclose(pb, [-1.0, 10.0], atol=1e-9)
    assert np.allclose(lb, [-2.0, 9.0], atol=1e-9)


def test_geoloc_guards():
    with pytest.raises(ValueError):
        geoloc_transformer(np.zeros((1, 5)), np.zeros((1, 5)))
    with pytest.raises(ValueError):
        geoloc_transformer(np.zeros((4, 5)), np.zeros((5, 4)))


# ------------------------------------------------- warp integration


def test_warp_with_homography_identity_recovers_image():
    rng = np.random.Generator(np.random.PCG64(5))
    img = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
    h, w = img.shape
    # identity homography via 4 corner GCPs mapping pixel->same coords
    g = np.array([[0, 0, 0, 0], [w, 0, w, 0], [w, h, w, h], [0, h, 0, h]],
                 dtype=float)
    t = homography_transformer(g)
    out, _gt = warp_image(img, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), "", "",
                          dst_size=(w, h),
                          dst_gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
                          method="nearest", transformer=t)
    assert np.array_equal(out, img)


def test_warp_with_geoloc_matches_affine_warp():
    """A geoloc field that encodes an axis-aligned affine must reproduce
    the plain GeoTransform warp bit-for-bit."""
    rng = np.random.Generator(np.random.PCG64(9))
    img = rng.integers(0, 255, size=(12, 18), dtype=np.uint8)
    h, w = img.shape
    # geoloc arrays at every pixel CENTER: X = 100 + 2*(c+0.5), Y = 80 - (r+0.5)
    rr, cc = np.meshgrid(np.arange(h, dtype=float), np.arange(w, dtype=float),
                         indexing="ij")
    gx = 100.0 + 2.0 * (cc + 0.5)
    gy = 80.0 - (rr + 0.5)
    t = geoloc_transformer(gx, gy, pixel_offset=0.5, line_offset=0.5)
    dst_gt = (100.0, 2.0, 0.0, 80.0, 0.0, -1.0)
    out, _ = warp_image(img, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), "", "",
                        dst_size=(w, h), dst_gt=dst_gt,
                        method="nearest", transformer=t)
    assert np.array_equal(out, img)
