import numpy as np

from gdal_ray.geometry import (
    bbox_intersects,
    decode_wkb,
    encode_multipolygon,
    encode_point,
    encode_polygon,
    points_in_rings,
    polygon_area,
    polygon_rings,
    ring_bbox,
)
from gdal_ray.geometry.wkb import GeomType
from gdal_ray.synth import make_polygon_table


def test_wkb_roundtrip_polygon_with_hole():
    outer = np.array([[0.0, 0], [4, 0], [4, 4], [0, 4]])
    inner = np.array([[1.0, 1], [3, 1], [3, 3], [1, 3]])
    wkb = encode_polygon([outer, inner])
    gtype, rings = decode_wkb(wkb)
    assert gtype == GeomType.POLYGON
    assert len(rings) == 2
    assert np.allclose(rings[0][:4], outer)


def test_wkb_point():
    gtype, xy = decode_wkb(encode_point(1.5, -2.5))
    assert gtype == GeomType.POINT and xy.tolist() == [1.5, -2.5]


def test_multipolygon_rings_flatten():
    b1 = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    b2 = b1 + 5
    wkb = encode_multipolygon([[b1], [b2]])
    assert len(polygon_rings(wkb)) == 2


def test_pip_square_and_hole():
    outer = np.array([[0.0, 0], [4, 0], [4, 4], [0, 4]])
    inner = np.array([[1.0, 1], [3, 1], [3, 3], [1, 3]])
    px = np.array([2.0, 0.5, 3.5, -1.0, 2.0])
    py = np.array([2.0, 0.5, 2.0, 2.0, 5.0])
    got = points_in_rings(px, py, [outer, inner])
    assert got.tolist() == [False, True, True, False, False]


def test_pip_concave():
    c = np.array([[0.0, 0], [3, 0], [3, 1], [1, 1], [1, 2], [3, 2], [3, 3], [0, 3]])
    px = np.array([2.0, 0.5, 2.0])
    py = np.array([1.5, 1.5, 0.5])
    assert points_in_rings(px, py, [c]).tolist() == [False, True, True]


def test_pip_matches_matplotlib_free_bruteforce():
    # cross-check against an independent winding implementation on random polys
    rng = np.random.default_rng(3)
    for poly_i in range(5):
        k = int(rng.integers(5, 10))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(0.5, 2.0, k)
        ring = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
        px = rng.uniform(-2.2, 2.2, 500)
        py = rng.uniform(-2.2, 2.2, 500)
        got = points_in_rings(px, py, [ring])

        def crossing_scalar(x, y):
            inside = False
            rr = np.vstack([ring, ring[:1]])
            for (x1, y1), (x2, y2) in zip(rr[:-1], rr[1:]):
                if y1 == y2:
                    continue
                if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                    inside = not inside
            return inside

        want = np.array([crossing_scalar(x, y) for x, y in zip(px, py)])
        assert np.array_equal(got, want)


def test_area_box_with_hole():
    outer = np.array([[0.0, 0], [4, 0], [4, 4], [0, 4]])
    inner = np.array([[1.0, 1], [3, 1], [3, 3], [1, 3]])
    assert polygon_area([outer, inner]) == 16.0 - 4.0


def test_bbox_helpers():
    rings = [np.array([[0.0, 1], [2, 1], [2, 5], [0, 5]])]
    assert ring_bbox(rings) == (0.0, 1.0, 2.0, 5.0)
    assert bool(bbox_intersects(0, 0, 1, 1, 1, 1, 2, 2))
    assert not bool(bbox_intersects(0, 0, 1, 1, 1.1, 0, 2, 1))


def test_polygon_table_deterministic():
    a = make_polygon_table(20)
    b = make_polygon_table(20)
    assert a.equals(b)
