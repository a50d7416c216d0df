"""Geometry constructions: convex hull invariants, Douglas-Peucker,
segmentize, buffer, integer-unit area."""

import numpy as np
import pytest

from gdal_ray.geometry import ops
from gdal_ray.geometry.wkb import polygon_parts, polygon_rings
from gdal_ray.synth import make_polygon_table


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def test_hull_square_with_interior():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3], [2, 0]])
    h = ops.convex_hull(pts)
    assert len(h) == 4
    assert abs(ops.ring_area2_units(h)) == 2 * (400 * 400)  # 4°→400u, area2 = 2*16e4u²


def test_hull_invariants_random():
    rng = np.random.Generator(np.random.PCG64(7))
    for _ in range(20):
        pts = np.round(rng.uniform(-50, 50, size=(40, 2)), 2)
        h = ops.convex_hull(pts)
        hu = ops.to_units(h)
        n = len(h)
        assert n >= 3
        # strict convexity (collinear dropped) in exact integer arithmetic
        for i in range(n):
            assert _cross(hu[i], hu[(i + 1) % n], hu[(i + 2) % n]) > 0
        # every input point inside or on the hull
        pu = ops.to_units(pts)
        for p in pu:
            assert all(_cross(hu[i], hu[(i + 1) % n], p) >= 0 for i in range(n))


def test_hull_collinear_and_tiny():
    line = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    h = ops.convex_hull(line)
    assert len(h) == 2  # degenerate: endpoints only
    assert len(ops.convex_hull(np.array([[1.0, 2.0]]))) == 1


def test_douglas_peucker():
    line = np.array([[0, 0], [1, 0.01], [2, -0.01], [3, 0], [4, 5], [5, 0]], dtype=float)
    out = ops.douglas_peucker(line, eps=0.1)
    assert [tuple(p) for p in out] == [(0, 0), (3, 0), (4, 5), (5, 0)]
    # eps=0 keeps everything non-collinear
    assert len(ops.douglas_peucker(line, eps=0.0)) == len(line)


def test_segmentize():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = ops.segmentize(line, max_len=3.0)
    assert len(out) == 5  # 0, 2.5, 5, 7.5, 10
    d = np.hypot(np.diff(out[:, 0]), np.diff(out[:, 1]))
    assert (d <= 3.0 + 1e-12).all()
    assert out[0].tolist() == [0, 0] and out[-1].tolist() == [10, 0]


def test_buffer_point():
    ring = ops.buffer_point(2.0, 3.0, 1.0, quadrant_segments=16)
    assert len(ring) == 64
    r = np.hypot(ring[:, 0] - 2.0, ring[:, 1] - 3.0)
    assert np.allclose(r, 1.0)
    # area converges to pi r^2 from below
    area = 0.5 * abs(np.dot(ring[:, 0], np.roll(ring[:, 1], -1)) - np.dot(ring[:, 1], np.roll(ring[:, 0], -1)))
    assert 0.995 * np.pi < area < np.pi


def test_area_units_vs_float():
    polys = make_polygon_table(50)
    for wkb, a_float in zip(polys.column("wkb").to_pylist(), polys.column("area_deg2").to_pylist()):
        parts = polygon_parts(wkb)
        a_u = ops.polygon_area2_units(parts)
        assert a_u >= 0
        assert a_u / (2 * 100.0 * 100.0) == pytest.approx(a_float, abs=1e-9)


def test_swap_xy():
    xy = np.array([[1.0, 2.0], [3.0, 4.0]])
    assert ops.swap_xy(xy).tolist() == [[2.0, 1.0], [4.0, 3.0]]


def test_clip_box_fully_inside():
    ring = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])
    out = ops.clip_ring_box(ring, 0, 0, 10, 10)
    assert ops.clipped_area([[ring]], 0, 0, 10, 10) == pytest.approx(4.0)
    assert len(out) == 4


def test_clip_box_partial_overlap():
    # unit-aligned box [0,4]x[0,4] clipped to [2,6]x[1,3] → 2x2 area
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    assert ops.clipped_area([[ring]], 2, 1, 6, 3) == pytest.approx(4.0)


def test_clip_box_disjoint():
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    assert ops.clipped_area([[ring]], 5, 5, 6, 6) == 0.0
    assert len(ops.clip_ring_box(ring, 5, 5, 6, 6)) == 0


def test_clip_triangle_corner():
    # right triangle clipped by half-plane-ish box: hand-computed area
    tri = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    # clip to x<=2: remaining region area = full (8) − cut triangle (x>2 part: area 2)
    assert ops.clipped_area([[tri]], -10, -10, 2.0, 10) == pytest.approx(6.0)


def test_clip_polygon_with_hole():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    hole = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])
    # clip to left half x<=2: outer→8, hole→2 → 6
    assert ops.clipped_area([[outer, hole]], -1, -1, 2.0, 5) == pytest.approx(6.0)


def test_clip_preserves_winding_independence():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    assert ops.clipped_area([[ring[::-1]]], 1, 1, 3, 3) == pytest.approx(4.0)
