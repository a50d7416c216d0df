"""OGR pairwise predicates (geometry/relate.py) — hand-built truth
fixtures + algebraic consistency invariants over the seeded polygon
table."""

import numpy as np
import pytest

from gdal_ray.geometry.relate import (polygon_distance, relate_polygons,
                                      segments_contact)
from gdal_ray.geometry.wkb import encode_polygon


def _box(x0, y0, x1, y1):
    return encode_polygon([np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)])


def test_truth_table():
    a = _box(0, 0, 4, 4)
    inside = _box(1, 1, 2, 2)
    partial = _box(3, 3, 6, 6)
    edge = _box(4, 0, 8, 4)       # shares the x=4 edge
    corner = _box(4, 4, 6, 6)     # shares only the (4,4) corner
    far = _box(10, 10, 12, 12)
    same = _box(0, 0, 4, 4)

    r = relate_polygons(a, inside)
    assert r["intersects"] and r["contains"] and not r["within"]
    assert not r["touches"] and not r["overlaps"] and not r["equals"]
    r2 = relate_polygons(inside, a)
    assert r2["within"] and not r2["contains"]

    r = relate_polygons(a, partial)
    assert r["intersects"] and r["overlaps"]
    assert not r["within"] and not r["contains"] and not r["touches"]

    r = relate_polygons(a, edge)
    assert r["intersects"] and r["touches"]
    assert not r["overlaps"] and not r["within"]

    r = relate_polygons(a, corner)
    assert r["intersects"] and r["touches"] and not r["overlaps"]

    r = relate_polygons(a, far)
    assert r["disjoint"] and not r["intersects"]

    r = relate_polygons(a, same)
    assert r["equals"] and r["within"] and r["contains"]
    assert not r["overlaps"] and not r["touches"]


def test_hole_semantics():
    # polygon with a hole: a box inside the hole touches nothing
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=np.float64)
    hole = np.array([[3, 3], [7, 3], [7, 7], [3, 7]], dtype=np.float64)
    donut = encode_polygon([outer, hole])
    in_hole = _box(4, 4, 6, 6)
    r = relate_polygons(donut, in_hole)
    assert not r["intersects"] and r["disjoint"]
    # box spanning hole boundary overlaps the donut
    spanning = _box(5, 5, 9, 9)
    r2 = relate_polygons(donut, spanning)
    assert r2["overlaps"]
    # box exactly filling the hole touches the donut (boundary contact,
    # zero shared interior)
    filling = _box(3, 3, 7, 7)
    r3 = relate_polygons(donut, filling)
    assert r3["touches"] and not r3["overlaps"]


def test_distance():
    a = _box(0, 0, 2, 2)
    assert polygon_distance(a, _box(1, 1, 3, 3)) == 0.0  # overlap
    assert polygon_distance(a, _box(2, 0, 4, 2)) == 0.0  # touch
    assert polygon_distance(a, _box(5, 0, 7, 2)) == pytest.approx(3.0)
    # diagonal separation: corner-to-corner
    assert polygon_distance(a, _box(5, 6, 7, 8)) == pytest.approx(5.0)
    # vertex-to-segment case (triangle point near box side)
    tri = encode_polygon([np.array([[3, 1], [5, 0.5], [5, 1.5]],
                                   dtype=np.float64)])
    assert polygon_distance(a, tri) == pytest.approx(1.0)


def test_segments_contact_collinear_overlap():
    s1 = np.array([[0, 0, 10, 0]], dtype=np.int64)
    s2 = np.array([[5, 0, 15, 0]], dtype=np.int64)   # collinear overlap
    s3 = np.array([[11, 0, 15, 0]], dtype=np.int64)  # collinear disjoint
    s4 = np.array([[10, 0, 15, 0]], dtype=np.int64)  # endpoint touch
    assert segments_contact(s1, s2)
    assert not segments_contact(s1, s3)
    assert segments_contact(s1, s4)


def test_consistency_over_seeded_polygons():
    from gdal_ray.synth import make_polygon_table

    tbl = make_polygon_table(24)
    wkbs = tbl.column("wkb").to_pylist()
    rng = np.random.default_rng(2)
    pairs = [(int(i), int(j)) for i, j in
             rng.integers(0, len(wkbs), (120, 2))]
    for i, j in pairs:
        r = relate_polygons(wkbs[i], wkbs[j])
        rj = relate_polygons(wkbs[j], wkbs[i])
        # symmetry
        assert r["intersects"] == rj["intersects"]
        assert r["touches"] == rj["touches"]
        assert r["overlaps"] == rj["overlaps"]
        assert r["equals"] == rj["equals"]
        assert r["within"] == rj["contains"]
        assert r["contains"] == rj["within"]
        # exclusivity / implication
        assert not (r["disjoint"] and r["intersects"])
        if r["overlaps"]:
            assert r["intersects"] and not r["within"] and not r["contains"]
        if r["touches"]:
            assert r["intersects"] and r["inter_area2_units"] == 0
        # distance coherence
        d = polygon_distance(wkbs[i], wkbs[j])
        assert (d == 0.0) == r["intersects"]
        assert polygon_distance(wkbs[j], wkbs[i]) == pytest.approx(d)
