"""DEM kernels: integer window stats vs brute force, float hillshade /
slope / aspect vs a naive per-pixel reference implementation of the Horn
formulas (gdaldem_lib.cpp:1003)."""

import math

import numpy as np
import pytest

from gdal_ray.stages import dem


@pytest.fixture(scope="module")
def grids():
    return dem.elevation_grids(np.array([0, 1, 7, 41]), n=12)


def test_elevation_deterministic():
    a = dem.elevation_grids(np.array([3]), n=8)
    b = dem.elevation_grids(np.array([3]), n=8)
    assert (a == b).all()
    assert a[0, 2, 5] == (3 * 7919 + 2 * 131 + 5 * 17) % 256


def test_window_metrics_vs_bruteforce(grids):
    rough, tri, tpi9 = dem.window_metrics(grids)
    e = grids
    B, n, _ = e.shape
    for b in range(B):
        for r in range(1, n - 1):
            for c in range(1, n - 1):
                w = e[b, r - 1 : r + 2, c - 1 : c + 2]
                assert rough[b, r - 1, c - 1] == w.max() - w.min()
                assert tri[b, r - 1, c - 1] == np.abs(w - e[b, r, c]).sum()
                assert tpi9[b, r - 1, c - 1] == 9 * e[b, r, c] - w.sum()


def test_hillshade_vs_naive(grids):
    hs = dem.hillshade(grids)
    e = grids.astype(np.float64)
    B, n, _ = e.shape
    az = math.radians(360.0 - 315.0 + 90.0)
    alt = math.radians(45.0)
    for b in range(B):
        for r in range(1, n - 1):
            for c in range(1, n - 1):
                w = e[b, r - 1 : r + 2, c - 1 : c + 2]
                gx = ((w[0, 0] + 2 * w[1, 0] + w[2, 0]) - (w[0, 2] + 2 * w[1, 2] + w[2, 2])) / 8.0
                gy = ((w[2, 0] + 2 * w[2, 1] + w[2, 2]) - (w[0, 0] + 2 * w[0, 1] + w[0, 2])) / 8.0
                slope = math.atan(math.hypot(gx, gy))
                aspect = math.atan2(gy, -gx)
                shade = math.sin(alt) * math.cos(slope) + math.cos(alt) * math.sin(slope) * math.cos(az - aspect)
                want = max(1, min(255, round(1.0 + 254.0 * max(0.0, min(1.0, shade)))))
                assert hs[b, r - 1, c - 1] == want, (b, r, c)


def test_slope_aspect_ranges(grids):
    s = dem.slope_degrees(grids)
    assert (s >= 0).all() and (s < 90).all()
    a = dem.aspect_degrees(grids)
    ok = (a == -9999.0) | ((a >= 0) & (a < 360))
    assert ok.all()


def test_flat_grid():
    flat = np.full((1, 8, 8), 42, dtype=np.int64)
    assert (dem.hillshade(flat) == round(1 + 254 * math.sin(math.radians(45)))).all()
    assert (dem.aspect_degrees(flat) == -9999.0).all()
    rough, tri, tpi9 = dem.window_metrics(flat)
    assert rough.sum() == 0 and tri.sum() == 0 and tpi9.sum() == 0


def test_contour_cases_bruteforce(grids):
    level = 128
    cases = dem.marching_square_cases(grids, level)
    e = grids
    B, n, _ = e.shape
    for b in range(B):
        for r in range(n - 1):
            for c in range(n - 1):
                want = (
                    8 * (e[b, r, c] >= level)
                    + 4 * (e[b, r, c + 1] >= level)
                    + 2 * (e[b, r + 1, c + 1] >= level)
                    + 1 * (e[b, r + 1, c] >= level)
                )
                assert cases[b, r, c] == want
    crossed, segs = dem.contour_segment_counts(e, level)
    assert (crossed <= (n - 1) ** 2).all()
    assert (segs >= crossed).all()  # saddles add 2


def test_reclassify_bins():
    e = np.array([[[0, 49, 50, 119, 120, 199, 200, 255]]], dtype=np.int64)
    assert dem.reclassify(e).tolist() == [[[0, 0, 1, 1, 2, 2, 3, 3]]]


def test_viewshed_flat_terrain_all_visible():
    e = np.full((16, 16), 50, np.int64)
    vis = dem.viewshed(e, 8, 8, obs_height=2)
    assert vis.all()


def test_viewshed_wall_blocks_shadow():
    e = np.zeros((16, 16), np.int64)
    e[8, 10] = 100  # wall east of the observer
    vis = dem.viewshed(e, 8, 8, obs_height=2)
    assert vis[8, 10]            # the wall itself is visible
    assert not vis[8, 12:].any()  # cells straight behind it are shadowed
    assert vis[8, :10].all()     # west side unaffected


def test_viewshed_grazing_ties_visible():
    # terrain exactly on the sight line is visible (<= rule)
    e = np.zeros((16, 16), np.int64)
    e[8, 10] = 2   # equals observer height (0 + 2): line to (8,12) at h=2
    vis = dem.viewshed(e, 8, 8, obs_height=2)
    assert vis[8, 10]


def test_hillshade_combined_vs_naive(grids):
    hs = dem.hillshade_combined(grids)
    e = grids.astype(np.float64)
    B, n, _ = e.shape
    az = math.radians(360.0 - 315.0 + 90.0)
    alt = math.radians(45.0)
    for b in range(B):
        for r in range(1, n - 1):
            for c in range(1, n - 1):
                w = e[b, r - 1 : r + 2, c - 1 : c + 2]
                gx = ((w[0, 0] + 2 * w[1, 0] + w[2, 0]) - (w[0, 2] + 2 * w[1, 2] + w[2, 2])) / 8.0
                gy = ((w[2, 0] + 2 * w[2, 1] + w[2, 2]) - (w[0, 0] + 2 * w[0, 1] + w[0, 2])) / 8.0
                slope = math.atan(math.hypot(gx, gy))
                aspect = math.atan2(gy, -gx)
                shade = math.sin(alt) * math.cos(slope) + math.cos(alt) * math.sin(slope) * math.cos(az - aspect)
                shade = max(-1.0, min(1.0, shade))
                cang = 1.0 - math.acos(shade) * slope * (4.0 / math.pi**2)
                want = 1 if cang <= 0 else max(1, min(255, round(1.0 + 254.0 * cang)))
                assert hs[b, r - 1, c - 1] == want, (b, r, c)


def test_hillshade_igor_vs_naive(grids):
    hs = dem.hillshade_igor(grids)
    e = grids.astype(np.float64)
    B, n, _ = e.shape
    az = math.radians(315.0)
    for b in range(B):
        for r in range(1, n - 1):
            for c in range(1, n - 1):
                w = e[b, r - 1 : r + 2, c - 1 : c + 2]
                gx = ((w[0, 0] + 2 * w[1, 0] + w[2, 0]) - (w[0, 2] + 2 * w[1, 2] + w[2, 2])) / 8.0
                gy = ((w[2, 0] + 2 * w[2, 1] + w[2, 2]) - (w[0, 0] + 2 * w[0, 1] + w[0, 2])) / 8.0
                slope_deg = math.degrees(math.atan(math.hypot(gx, gy)))
                aspect = math.atan2(gy, -gx)
                target = 1.5 * math.pi - az
                diff = abs((aspect % (2 * math.pi)) - (target % (2 * math.pi)))
                if diff > math.pi:
                    diff = 2 * math.pi - diff
                shadow = 1.0 - (slope_deg / 90.0) * (1.0 - diff / math.pi)
                want = max(0, min(255, round(255.0 * shadow)))
                assert hs[b, r - 1, c - 1] == want, (b, r, c)


def test_hillshade_multidirectional_vs_naive(grids):
    hs = dem.hillshade_multidirectional(grids)
    e = grids.astype(np.float64)
    B, n, _ = e.shape
    alt = math.radians(45.0)
    c225 = math.cos(math.radians(225.0))
    for b in range(B):
        for r in range(1, n - 1):
            for c in range(1, n - 1):
                w = e[b, r - 1 : r + 2, c - 1 : c + 2]
                x = ((w[0, 0] + 2 * w[1, 0] + w[2, 0]) - (w[0, 2] + 2 * w[1, 2] + w[2, 2])) / 8.0
                y = ((w[2, 0] + 2 * w[2, 1] + w[2, 2]) - (w[0, 0] + 2 * w[0, 1] + w[0, 2])) / 8.0
                xxyy = x * x + y * y
                if xxyy == 0.0:
                    want = round(1.0 + 254.0 * math.sin(alt))
                else:
                    v225 = max(0.0, math.sin(alt) + (x - y) * c225 * math.cos(alt))
                    v270 = max(0.0, math.sin(alt) - x * math.cos(alt))
                    v315 = max(0.0, math.sin(alt) + (x + y) * c225 * math.cos(alt))
                    v360 = max(0.0, math.sin(alt) - y * math.cos(alt))
                    w225 = 0.5 * xxyy - x * y
                    w315 = xxyy - w225
                    num = w225 * v225 + x * x * v270 + w315 * v315 + y * y * v360
                    want = round(1.0 + 127.0 * (num / xxyy) / math.sqrt(1.0 + xxyy))
                    want = max(1, min(255, want))
                assert hs[b, r - 1, c - 1] == want, (b, r, c)


def test_hillshade_variants_flat_and_orientation():
    flat = np.full((1, 8, 8), 10, dtype=np.int64)
    assert (dem.hillshade_combined(flat) == 255).all()
    assert (dem.hillshade_igor(flat) == 255).all()
    assert (dem.hillshade_multidirectional(flat)
            == round(1 + 254 * math.sin(math.radians(45)))).all()
    # ramps of equal slope but opposite facing shade differently
    n = 10
    idx = np.arange(n, dtype=np.int64)
    east = np.broadcast_to(idx[None, None, :] * 3, (1, n, n)).astype(np.int64).copy()
    west = east[:, :, ::-1].copy()
    for fn in (dem.hillshade_combined,
               lambda e: dem.hillshade_igor(e),
               lambda e: dem.hillshade_multidirectional(e)):
        assert fn(east)[0, 4, 4] != fn(west)[0, 4, 4]  # orientation-sensitive
