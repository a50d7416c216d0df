"""General convex clip, exact centroid rationals, MakeValid pinch-split."""

import numpy as np

from gdal_ray.geometry import ops


def test_clip_convex_matches_box_clip():
    rng = np.random.Generator(np.random.PCG64(7))
    box = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
    for _ in range(30):
        ring = np.round(rng.uniform(-2, 6, size=(6, 2)), 2)
        a = ops.clip_ring_box(ring, 0.0, 0.0, 4.0, 3.0)
        b = ops.clip_ring_convex(ring, box)
        assert abs(ops.ring_area2_float(a) - ops.ring_area2_float(b)) < 1e-9


def test_clip_convex_triangle_known_areas():
    tri = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])  # CCW, hyp x+y=2
    # box fully inside lower-left corner
    sq = np.array([[0.0, 0.0], [0.5, 0.0], [0.5, 0.5], [0.0, 0.5]])
    assert abs(ops.ring_area2_float(ops.clip_ring_convex(sq, tri)) - 0.5) < 1e-12
    # unit box at origin: corner (1,1) exactly on the hypotenuse → full box
    u = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    assert abs(ops.ring_area2_float(ops.clip_ring_convex(u, tri)) - 2.0) < 1e-12
    # box straddling the hypotenuse: [0.5,1.5]^2 ∩ tri is the triangle
    # (0.5,0.5),(1.5,0.5),(0.5,1.5) → area 1/2, 2A = 1
    s = np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]])
    assert abs(ops.ring_area2_float(ops.clip_ring_convex(s, tri)) - 1.0) < 1e-12
    # disjoint box
    d = np.array([[3.0, 3.0], [4.0, 3.0], [4.0, 4.0], [3.0, 4.0]])
    assert ops.ring_area2_float(ops.clip_ring_convex(d, tri)) == 0.0


def test_centroid6_units_simple_shapes():
    # unit box [0,1]^2 → centroid (0.5, 0.5); a2 = 2*100*100 = 20000 units²
    box = [[np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]]
    sx6, sy6, a2 = ops.centroid6_units(box)
    assert a2 == 20000
    assert sx6 / (3 * a2) == 50.0 and sy6 / (3 * a2) == 50.0  # units = 0.5°
    # orientation-insensitive: reversed ring gives identical result
    rev = [[box[0][0][::-1]]]
    assert ops.centroid6_units(rev) == (sx6, sy6, a2)
    # box with centered hole keeps the centroid, reduces area
    hole = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]])
    withhole = [[box[0][0], hole]]
    hx6, hy6, ha2 = ops.centroid6_units(withhole)
    assert ha2 == 20000 - 2 * 50 * 50
    assert hx6 / (3 * ha2) == 50.0 and hy6 / (3 * ha2) == 50.0


def test_make_valid_pinch_figure_eight():
    ring = np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
         [0.0, 0.0], [-1.0, 0.0], [-1.0, -1.0], [0.0, -1.0]]
    )
    loops = ops.make_valid_pinch(ring)
    assert len(loops) == 2
    areas = sorted(abs(ops.ring_area2_units(lp)) for lp in loops)
    assert areas == [20000, 20000]


def test_make_valid_simple_ring_unchanged():
    ring = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    loops = ops.make_valid_pinch(ring)
    assert len(loops) == 1
    assert abs(ops.ring_area2_units(loops[0])) == 80000


def test_make_valid_three_lobes():
    c = (0.0, 0.0)
    ring = []
    for (dx, dy, s) in [(1, 1, 1.0), (-1, 1, 2.0), (-1, -1, 3.0)]:
        ring += [c, (dx * s, 0.0), (dx * s, dy * s), (0.0, dy * s)]
    loops = ops.make_valid_pinch(np.array(ring))
    assert len(loops) == 3
    areas = sorted(abs(ops.ring_area2_units(lp)) for lp in loops)
    assert areas == [2 * 100 * 100, 2 * 200 * 200, 2 * 300 * 300]


def test_buffer_convex_square():
    sq = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    r = 0.5
    buf = ops.buffer_convex(sq, r, quadrant_segments=16)
    a = ops.ring_area2_float(buf) / 2.0
    # A + P·r + πr² with the k-gon circle shortfall
    expect = 4.0 + 8.0 * r + np.pi * r * r
    assert abs(a - expect) < 0.01
    # buffered ring contains the original (every original vertex strictly inside)
    from gdal_ray.geometry.predicates import points_in_rings
    assert points_in_rings(sq[:, 0], sq[:, 1], [buf]).all()
    # CW input gives the same result
    buf2 = ops.buffer_convex(sq[::-1], r, quadrant_segments=16)
    assert abs(ops.ring_area2_float(buf2) - ops.ring_area2_float(buf)) < 1e-12


def test_buffer_convex_rejects_concave():
    import pytest as _pt

    c = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [2.0, 1.0], [0.0, 4.0]])
    with _pt.raises(ValueError):
        ops.buffer_convex(c, 0.3)


def _cell_count_area2(parts_a, parts_b, lo=-20, hi=20):
    """Independent oracle for integer-coordinate AXIS-ALIGNED shapes:
    2x area of the intersection = 2x number of unit cells whose center
    (half-integer) lies inside both — exact because boundaries sit on
    integer lines."""
    from gdal_ray.geometry.predicates import points_in_rings

    xs = np.arange(lo, hi) + 0.5
    gx, gy = np.meshgrid(xs, xs)
    fx, fy = gx.ravel(), gy.ravel()

    def inside(parts):
        acc = np.zeros(len(fx), dtype=bool)
        for rings in parts:
            m = points_in_rings(fx, fy, [rings[0]])
            for h in rings[1:]:
                m &= ~points_in_rings(fx, fy, [h])
            acc |= m
        return acc

    # each unit cell is 1°×1° = 100×100 unit²
    return 2 * 100 * 100 * int((inside(parts_a) & inside(parts_b)).sum())


def test_intersection_area_squares():
    a = [[np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])]]
    b = [[np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]])]]
    got = ops.polygon_intersection_area2_units(a, b)
    assert got == 2 * 2 * 100 * 2 * 100  # 2x (2°x2°) in unit²


def test_intersection_area_concave_concave():
    def cshape(ox, oy):  # 6x6 "C" with a 2-wide mouth on the right
        return np.array([
            [ox, oy], [ox + 6, oy], [ox + 6, oy + 2], [ox + 2, oy + 2],
            [ox + 2, oy + 4], [ox + 6, oy + 4], [ox + 6, oy + 6], [ox, oy + 6],
        ])
    a = [[cshape(0.0, 0.0)]]
    b = [[cshape(3.0, 1.0)]]
    got = ops.polygon_intersection_area2_units(a, b)
    want = _cell_count_area2(a, b)
    assert got == want and want > 0


def test_intersection_area_with_holes():
    outer = np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 8.0]])
    hole = np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]])
    a = [[outer, hole]]
    b = [[np.array([[1.0, 1.0], [7.0, 1.0], [7.0, 7.0], [1.0, 7.0]])]]
    got = ops.polygon_intersection_area2_units(a, b)
    want = _cell_count_area2(a, b)
    assert got == want == 2 * (36 - 16) * 100 * 100


def test_intersection_area_cross_checks_sh_clip():
    """Concave ∩ convex: triangulated area must match the per-ring
    Sutherland–Hodgman convex-clip area on the fixture polygons."""
    from gdal_ray.geometry.wkb import polygon_parts
    from gdal_ray.synth import make_polygon_table

    polys = make_polygon_table(30)
    checked = 0
    for wkb in polys.column("wkb").to_pylist():
        parts = polygon_parts(wkb)
        bx0 = min(r[:, 0].min() for rings in parts for r in rings[:1])
        by0 = min(r[:, 1].min() for rings in parts for r in rings[:1])
        clip = np.array([[bx0 + 0.5, by0 + 0.5], [bx0 + 3.5, by0 + 0.7],
                         [bx0 + 3.1, by0 + 3.9], [bx0 + 0.4, by0 + 3.2]])
        tri_area = ops.polygon_intersection_area2_units(parts, [[clip]])
        sh = 0.0
        for rings in parts:
            sh += ops.ring_area2_float(ops.clip_ring_convex(rings[0], clip))
            for h in rings[1:]:
                sh -= ops.ring_area2_float(ops.clip_ring_convex(h, clip))
        sh_units = int(round(sh * ops.UNIT * ops.UNIT))
        assert abs(tri_area - sh_units) <= 1, (tri_area, sh_units)
        checked += 1
    assert checked == 30
