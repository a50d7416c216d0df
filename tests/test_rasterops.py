"""Proximity EDT vs brute force, sieve, fill-nodata, nearblack."""

import numpy as np
import pytest

from gdal_ray.stages import rasterops as ro


def _brute_edt(targets):
    t = np.asarray(targets, dtype=bool)
    h, w = t.shape
    rr, cc = np.nonzero(t)
    out = np.full((h, w), ro._INF, dtype=np.int64)
    if len(rr) == 0:
        return out
    for r in range(h):
        for c in range(w):
            out[r, c] = ((rr - r) ** 2 + (cc - c) ** 2).min()
    return out


def test_edt_exact_vs_bruteforce():
    rng = np.random.Generator(np.random.PCG64(3))
    for density in (0.02, 0.2, 0.7):
        t = rng.random((17, 23)) < density
        got = ro.proximity_sq(t)
        want = _brute_edt(t)
        assert (got == want).all()


def test_edt_no_targets_and_all_targets():
    assert (ro.proximity_sq(np.zeros((4, 5), bool)) == ro._INF).all()
    assert (ro.proximity_sq(np.ones((4, 5), bool)) == 0).all()


def test_edt_single_target_corner():
    t = np.zeros((5, 5), bool)
    t[0, 0] = True
    d = ro.proximity_sq(t)
    assert d[4, 4] == 32 and d[0, 4] == 16 and d[2, 2] == 8


def test_sieve_removes_small_component():
    g = np.zeros((6, 6), dtype=np.int64)
    g[2, 2] = 1  # single-pixel island
    out = ro.sieve(g, threshold=2)
    assert (out == 0).all()


def test_sieve_keeps_large_components():
    g = np.zeros((6, 6), dtype=np.int64)
    g[:, 3:] = 1
    out = ro.sieve(g, threshold=4)
    assert (out == g).all()


def test_sieve_merges_into_largest_neighbor():
    g = np.zeros((5, 7), dtype=np.int64)
    g[:, 4:] = 2          # 15 px of class 2
    g[2, 3] = 1           # 1 px of class 1 sandwiched: left 0-region is larger
    out = ro.sieve(g, threshold=2)
    # neighboring components: class-0 region (19 px) vs class-2 (15 px) → 0 wins
    assert out[2, 3] == 0


def test_fill_nodata_constant_field():
    img = np.full((8, 8), 7.0)
    mask = np.zeros((8, 8), bool)
    mask[3:5, 3:5] = True
    img2 = img.copy()
    img2[mask] = -999
    out = ro.fill_nodata(img2, mask)
    assert np.allclose(out, 7.0)


def test_fill_nodata_gradient_interior():
    yy, xx = np.mgrid[0:10, 0:10]
    img = xx.astype(np.float64)
    mask = np.zeros((10, 10), bool)
    mask[4:6, 4:6] = True
    img2 = img.copy()
    img2[mask] = 0
    out = ro.fill_nodata(img2, mask)
    assert abs(out[4, 4] - 4.0) < 1.5  # smooth interpolation, near the trend


def test_nearblack():
    img = np.full((8, 8, 3), 200, np.uint8)
    img[0:2, :, :] = 3      # dark top collar
    img[4, 4, :] = 3        # interior dark pixel — NOT border-connected
    out, collar = ro.nearblack(img, threshold=15, value=0)
    assert collar[0, 0] and collar[1, 5]
    assert not collar[4, 4]
    assert (out[0, 0] == 0).all()
    assert (out[4, 4] == 3).all()  # interior untouched
