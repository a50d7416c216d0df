"""Geodesic measures (geometry/geodesic.py) — OGR_G_GeodesicArea /
GeodesicLength parity surface, pinned on closed-form and published
values (Vincenty 1975; Karney 2013 worked example; Snyder 1987 authalic
sphere)."""

import numpy as np
import pytest

from gdal_ray.geometry.geodesic import (
    ELLIPSOID_AREA,
    inverse,
    line_length,
    polygon_area,
    wkb_geodesic_measures,
)

A = 6378137.0


def test_equator_arc_exact():
    # the equator is a geodesic: s = a·Δλ
    assert float(inverse(0, 0, 0, 90)) == pytest.approx(A * np.pi / 2,
                                                        abs=1e-4)
    assert float(inverse(0, 10, 0, 11)) == pytest.approx(A * np.pi / 180,
                                                         abs=1e-6)


def test_meridian_quarter():
    # WGS84 quarter-meridian arc (published: 10 001 965.7293 m)
    assert float(inverse(0, 0, 90, 0)) == pytest.approx(10001965.7293,
                                                        abs=1e-3)


def test_karney_near_antipodal_example():
    # the geodinverse(1) worked example (GeographicLib documentation):
    # (-41.32, 174.81) -> (40.96, -5.50), s12 = 19 959 679.267 m
    assert float(inverse(-41.32, 174.81, 40.96, -5.50)) == pytest.approx(
        19959679.267, abs=0.5)


def test_symmetry_and_coincident():
    d1 = float(inverse(12.3, 45.6, -7.8, 123.4))
    d2 = float(inverse(-7.8, 123.4, 12.3, 45.6))
    assert d1 == pytest.approx(d2, rel=1e-12)
    assert float(inverse(33.0, -110.0, 33.0, -110.0)) == 0.0


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    lat1, lat2 = rng.uniform(-80, 80, 20), rng.uniform(-80, 80, 20)
    lon1, lon2 = rng.uniform(-180, 180, 20), rng.uniform(-180, 180, 20)
    vec = inverse(lat1, lon1, lat2, lon2)
    for i in range(20):
        assert float(inverse(lat1[i], lon1[i], lat2[i], lon2[i])) == \
            pytest.approx(float(vec[i]), rel=1e-12)


def test_octant_area_exact():
    # meridians + equator map to great circles of the authalic sphere,
    # so the octant is exactly 1/8 of the (exact) total ellipsoid area
    ring = np.array([[0.0, 0.0], [90.0, 0.0], [0.0, 90.0], [0.0, 0.0]])
    assert polygon_area([ring]) == pytest.approx(ELLIPSOID_AREA / 8,
                                                 rel=1e-12)
    # total WGS84 surface area, closed form: 510 065 621 724 088 m²
    assert ELLIPSOID_AREA == pytest.approx(5.10065621724088e14, rel=1e-12)


def test_area_orientation_invariant_and_holes():
    sq = np.array([[10.0, 40.0], [11.0, 40.0], [11.0, 41.0], [10.0, 41.0],
                   [10.0, 40.0]])
    a_ccw = polygon_area([sq])
    a_cw = polygon_area([sq[::-1]])
    assert a_ccw == pytest.approx(a_cw, rel=1e-12)
    hole = np.array([[10.2, 40.2], [10.4, 40.2], [10.4, 40.4], [10.2, 40.4],
                     [10.2, 40.2]])
    assert polygon_area([sq, hole]) == pytest.approx(
        a_ccw - polygon_area([hole]), rel=1e-9)
    # ~1°×1° at 40°N is about 85.2e9 m² (cos40 · 111.3e3 · 111e3)
    assert 8.0e9 < a_ccw < 1.1e10


def test_line_length_polyline():
    lons = np.array([0.0, 1.0, 2.0])
    lats = np.array([0.0, 0.0, 0.0])
    assert line_length(lons, lats) == pytest.approx(
        2 * float(inverse(0, 0, 0, 1)), rel=1e-12)


def test_wkb_measures():
    from gdal_ray.geometry.wkb import encode_linestring, encode_polygon

    sq = np.array([[10.0, 40.0], [11.0, 40.0], [11.0, 41.0], [10.0, 41.0],
                   [10.0, 40.0]])
    area, perim = wkb_geodesic_measures(encode_polygon([sq]))
    assert area == pytest.approx(polygon_area([sq]), rel=1e-12)
    assert perim > 4 * 85000  # each side > 85 km
    area2, length = wkb_geodesic_measures(
        encode_linestring(np.array([[0.0, 0.0], [1.0, 0.0]])))
    assert area2 == 0.0
    assert length == pytest.approx(float(inverse(0, 0, 0, 1)), rel=1e-12)


def test_query_registry_entry(ray_session):
    from gdal_ray.pipelines.queries import q_geodesic_measures

    out = q_geodesic_measures("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {"poly_id", "geodesic_area_m2",
                                "geodesic_perim_m"}
    assert (out["geodesic_area_m2"] > 0).all()
    assert (out["geodesic_perim_m"] > 0).all()
