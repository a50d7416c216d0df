"""Property-based tests (hypothesis) for the pure kernels: tile math
invariants, hull/clip geometry, EDT, window metrics."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gdal_ray import tilemath as tm
from gdal_ray.geometry import ops
from gdal_ray.stages import dem
from gdal_ray.stages import rasterops as ro

LON = st.floats(min_value=-179.99, max_value=179.99, allow_nan=False)
LAT = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)
ZOOM = st.integers(min_value=0, max_value=18)


@settings(max_examples=200, deadline=None)
@given(LON, LAT, ZOOM)
def test_tile_in_matrix_and_parent_consistent(lon, lat, z):
    x, y = tm.lonlat_to_tile_xyz(np.float64(lon), np.float64(lat), np.int64(z))
    n = 2**z
    assert 0 <= x < n and 0 <= y < n
    if z > 0:
        # the same point at z-1 must be the parent tile (XYZ y-parent = y>>1)
        px, py = tm.lonlat_to_tile_xyz(np.float64(lon), np.float64(lat), np.int64(z - 1))
        assert px == x >> 1 and py == y >> 1


@settings(max_examples=100, deadline=None)
@given(LON, LAT, ZOOM)
def test_point_tile_inside_its_bbox_cover(lon, lat, z):
    x, y = tm.lonlat_to_tile_xyz(np.float64(lon), np.float64(lat), np.int64(z))
    x0, x1, y0, y1 = tm.bbox_to_tile_range_xyz(
        np.float64(lon), np.float64(lat), np.float64(lon), np.float64(lat), np.int64(z)
    )
    assert x0 <= x <= x1 and y0 <= y <= y1


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**20 - 1),
       st.integers(min_value=0, max_value=2**20 - 1))
def test_quadkey_unique_and_prefix(x, y):
    z = np.int64(20)
    k = tm.quadkey_int(np.int64(x), np.int64(y), z)
    k2 = tm.quadkey_int(np.int64(x) >> 1, np.int64(y) >> 1, np.int64(19))
    # parent quadkey is the child's interleave with last 2 bits dropped
    assert (int(k) & ((1 << 58) - 1)) >> 2 == int(k2) & ((1 << 58) - 1)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(-500, 500), st.integers(-500, 500)),
                min_size=3, max_size=30, unique=True))
def test_hull_contains_all_and_idempotent(pts):
    arr = np.array(pts, dtype=np.float64) / 4.0
    h = ops.convex_hull(arr)
    if len(h) < 3:
        return
    hu = ops.to_units(h)
    pu = ops.to_units(arr)
    n = len(hu)
    for p in pu:
        for i in range(n):
            o, a = hu[i], hu[(i + 1) % n]
            assert (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) >= 0
    h2 = ops.convex_hull(h)
    assert len(h2) == len(h)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.floats(-50, 50, allow_nan=False),
                          st.floats(-50, 50, allow_nan=False)),
                min_size=3, max_size=12),
       st.floats(-40, 0, allow_nan=False), st.floats(-40, 0, allow_nan=False),
       st.floats(0.5, 40, allow_nan=False), st.floats(0.5, 40, allow_nan=False))
def test_clip_area_bounded(ring_pts, bx0, by0, w, h):
    # star-shaped ordering around the centroid → SIMPLE polygon
    # (Sutherland–Hodgman, like GEOS, requires valid input geometry)
    raw = np.array(ring_pts)
    c = raw.mean(axis=0)
    ring = raw[np.argsort(np.arctan2(raw[:, 1] - c[1], raw[:, 0] - c[0]), kind="mergesort")]
    bx1, by1 = bx0 + w, by0 + h
    clipped = ops.clip_ring_box(ring, bx0, by0, bx1, by1)
    if len(clipped) >= 3:
        x, y = clipped[:, 0], clipped[:, 1]
        area = 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))
        assert area <= (bx1 - bx0) * (by1 - by0) + 1e-9
        assert (clipped[:, 0] >= bx0 - 1e-9).all() and (clipped[:, 0] <= bx1 + 1e-9).all()
        assert (clipped[:, 1] >= by0 - 1e-9).all() and (clipped[:, 1] <= by1 + 1e-9).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**6), st.integers(6, 14))
def test_edt_zero_at_targets_and_monotone(seed, size):
    rng = np.random.Generator(np.random.PCG64(seed))
    t = rng.random((size, size)) < 0.15
    d2 = ro.proximity_sq(t)
    if t.any():
        assert (d2[t] == 0).all()
        # triangle-ish sanity: neighbors differ by bounded amount
        assert (d2 < ro._INF).all()
    else:
        assert (d2 == ro._INF).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**6))
def test_window_metrics_invariants(seed):
    ids = np.array([seed % 100000], dtype=np.int64)
    e = dem.elevation_grids(ids, 12)
    rough, tri, tpi9 = dem.window_metrics(e)
    assert (rough >= 0).all() and (tri >= 0).all()
    assert (np.abs(tpi9) <= 8 * rough).all()  # |9c − Σw| = |Σ(c−nbr)| ≤ 8·range
    assert (tri >= np.abs(tpi9)).all()        # Σ|d| ≥ |Σd|
