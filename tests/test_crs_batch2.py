"""Round-4b CRS additions: aeqd/gnomonic (spherical), equidistant conic,
American polyconic — geometric invariants, not just round-trips."""

import numpy as np
import pytest

from gdal_ray.crs import (A_WGS84, F_WGS84, _ecc, _merid_arc_fns,
                          aeqd_spherical, eqdc, gnomonic, polyconic,
                          proj_pair)

R = 6370997.0  # Snyder's standard sphere


def _gc_dist(lat1, lon1, lat2, lon2, r=R):
    """great-circle distance (haversine, independent of the projection)"""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = p2 - p1
    dlam = np.radians(lon2) - np.radians(lon1)
    h = np.sin(dphi / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam / 2) ** 2
    return 2 * r * np.arcsin(np.sqrt(h))


def test_aeqd_true_distance_and_azimuth():
    lat0, lon0 = 40.0, -74.0
    fwd, inv = aeqd_spherical(lat0, lon0, 0.0, 0.0, R=R)
    rng = np.random.default_rng(7)
    lon = rng.uniform(-170, 170, 200)
    lat = rng.uniform(-80, 80, 200)
    x, y = fwd(lon, lat)
    # THE defining property: planar distance from center == great-circle
    np.testing.assert_allclose(np.hypot(x, y),
                               _gc_dist(lat0, lon0, lat, lon), rtol=1e-12)
    # azimuth preserved: atan2(x, y) == initial great-circle bearing
    p1, p2 = np.radians(lat0), np.radians(lat)
    dlam = np.radians(lon - lon0)
    brg = np.arctan2(np.sin(dlam) * np.cos(p2),
                     np.cos(p1) * np.sin(p2)
                     - np.sin(p1) * np.cos(p2) * np.cos(dlam))
    np.testing.assert_allclose(np.arctan2(x, y), brg, atol=1e-12)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_gnomonic_great_circles_are_straight():
    fwd, inv = gnomonic(35.0, 20.0, 0.0, 0.0, R=R)
    rng = np.random.default_rng(3)
    for _ in range(50):
        # three points on one great circle: P, Q and the midpoint of the
        # chord normalized back to the sphere
        v1 = rng.normal(size=3)
        v1 /= np.linalg.norm(v1)
        v2 = rng.normal(size=3)
        v2 /= np.linalg.norm(v2)
        if np.dot(v1, v2) < 0:
            v2 = -v2
        vm = (v1 + v2) / np.linalg.norm(v1 + v2)
        pts = []
        ok = True
        for v in (v1, vm, v2):
            lat = np.degrees(np.arcsin(v[2]))
            lon = np.degrees(np.arctan2(v[1], v[0]))
            try:
                pts.append(fwd(lon, lat))
            except ValueError:
                ok = False  # beyond the horizon for this center
                break
        if not ok:
            continue
        (x1, y1), (x2, y2), (x3, y3) = pts
        cross = (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
        scale = max(np.hypot(x3 - x1, y3 - y1), 1.0)
        assert abs(cross) / (scale * scale) < 1e-9
    # round-trip
    lon = np.array([10.0, 25.0, 30.0])
    lat = np.array([30.0, 40.0, 50.0])
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_eqdc_meridians_and_parallels_true():
    lat1, lat2 = 29.5, 45.5  # the classic US parallels
    fwd, inv = eqdc(lat1, lat2, 23.0, -96.0, 0.0, 0.0)
    e2 = _ecc(F_WGS84) ** 2
    M, _ = _merid_arc_fns(A_WGS84, e2)

    # meridian true scale: projected radial distance between two
    # latitudes equals the meridian arc exactly (formula identity)
    phis = np.radians(np.array([10.0, 23.0, 29.5, 38.0, 45.5, 60.0]))
    x, y = fwd(np.full(phis.shape, -96.0), np.degrees(phis))
    rho = np.hypot(x, fwd(np.array([-96.0]), np.array([23.0]))[1]
                   + (M(np.radians(23.0)) - M(phis)) * 0 + 0)  # noqa: F841
    # distances along the central meridian:
    dy = np.diff(y)
    dM = np.diff(M(phis))
    np.testing.assert_allclose(dy, dM, rtol=1e-12)

    # standard parallels true: arc length along lat1 between lon a and b
    # equals a*m1*dlam
    def m_of(phi):
        return np.cos(phi) / np.sqrt(1 - e2 * np.sin(phi) ** 2)

    for latp in (lat1, lat2):
        xa, ya = fwd(-100.0, latp)
        xb, yb = fwd(-92.0, latp)
        # the parallel is a circle arc of radius rho; chord angle = n*dlam
        x0, y0 = fwd(-96.0, 90.0 if False else latp)  # point on parallel
        # radius from cone apex:
        fwd0 = fwd(-96.0, latp)
        # apex is at (0, y(lat) + rho) — recover rho from two points
        # simpler: angle subtended
        import math
        # measure arc length numerically with dense sampling
        lons = np.linspace(-100.0, -92.0, 2001)
        xs, ys = fwd(lons, np.full(lons.shape, latp))
        arc = np.sum(np.hypot(np.diff(xs), np.diff(ys)))
        true = A_WGS84 * m_of(np.radians(latp)) * math.radians(8.0)
        np.testing.assert_allclose(arc, true, rtol=1e-9)

    # round-trip
    rng = np.random.default_rng(11)
    lon = rng.uniform(-130, -60, 500)
    lat = rng.uniform(5, 70, 500)
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_polyconic_geometry():
    lat0, lon0 = 0.0, -60.0  # Brazilian polyconic aspect
    fwd, inv = polyconic(lat0, lon0, 0.0, 0.0)
    e2 = _ecc(F_WGS84) ** 2
    M, _ = _merid_arc_fns(A_WGS84, e2)
    M0 = M(np.radians(lat0))

    # central meridian true: x = 0, y = M - M0
    lats = np.array([-30.0, -10.0, 0.0, 15.0, 45.0])
    x, y = fwd(np.full(lats.shape, lon0), lats)
    np.testing.assert_allclose(x, 0.0, atol=1e-9)
    np.testing.assert_allclose(y, M(np.radians(lats)) - M0, rtol=1e-12)

    # equator maps to y = -M0 with true scale x = a*dlam
    lons = np.array([-70.0, -60.0, -45.0])
    x, y = fwd(lons, np.zeros(3))
    np.testing.assert_allclose(y, -M0, atol=1e-9)
    np.testing.assert_allclose(
        x, A_WGS84 * np.radians(lons + 60.0), rtol=1e-12)

    # each parallel is a circle of radius N*cot(phi) centered on the
    # central meridian at (0, M - M0 + N*cot(phi))  [Snyder ch. 18]
    for latp in (20.0, -35.0, 55.0):
        phi = np.radians(latp)
        N = A_WGS84 / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        r_circ = N / np.tan(phi)
        cy = M(phi) - M0 + r_circ
        lons = np.linspace(lon0 - 25, lon0 + 25, 11)
        xs, ys = fwd(lons, np.full(lons.shape, latp))
        np.testing.assert_allclose(np.hypot(xs - 0.0, ys - cy),
                                   abs(r_circ), rtol=1e-12)

    # Newton inverse round-trip
    rng = np.random.default_rng(13)
    lon = rng.uniform(-85, -35, 400)
    lat = rng.uniform(-40, 60, 400)
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)


def test_proj_string_front_end():
    f, i = proj_pair("+proj=aeqd +lat_0=40 +lon_0=-74 +R=6370997")
    x, y = f(-74.0, 41.0)
    assert abs(np.hypot(x, y) - _gc_dist(40.0, -74.0, 41.0, -74.0)) < 1e-6
    f, i = proj_pair("+proj=eqdc +lat_1=29.5 +lat_2=45.5 +lat_0=23 "
                     "+lon_0=-96 +ellps=WGS84")
    lon, lat = i(*f(-100.0, 35.0))
    assert abs(lon - -100.0) < 1e-9 and abs(lat - 35.0) < 1e-9
    f, i = proj_pair("+proj=poly +lat_0=0 +lon_0=-60 +ellps=WGS84")
    lon, lat = i(*f(-55.0, -20.0))
    assert abs(lon - -55.0) < 1e-8 and abs(lat - -20.0) < 1e-8
    with pytest.raises(NotImplementedError):
        proj_pair("+proj=aeqd +lat_0=40 +lon_0=-74 +ellps=WGS84")


def test_bonne_equal_area_and_true_scale():
    from gdal_ray.crs import bonne

    R_s = 6370997.0
    fwd, inv = bonne(45.0, 10.0, 0.0, 0.0, R=R_s)

    # equal-area: FD Jacobian |d(x,y)/d(lam,phi)| == R^2 * cos(phi)
    rng = np.random.default_rng(21)
    lon = rng.uniform(-60, 80, 300)
    lat = rng.uniform(-60, 80, 300)
    h = 1e-6
    xl1, yl1 = fwd(lon + h, lat)
    xl0, yl0 = fwd(lon - h, lat)
    xp1, yp1 = fwd(lon, lat + h)
    xp0, yp0 = fwd(lon, lat - h)
    dxdl = (np.asarray(xl1) - xl0) / np.radians(2 * h)
    dydl = (np.asarray(yl1) - yl0) / np.radians(2 * h)
    dxdp = (np.asarray(xp1) - xp0) / np.radians(2 * h)
    dydp = (np.asarray(yp1) - yp0) / np.radians(2 * h)
    J = np.abs(dxdl * dydp - dydl * dxdp)
    np.testing.assert_allclose(J, R_s**2 * np.cos(np.radians(lat)),
                               rtol=5e-5)

    # central meridian true: y difference = R * dphi, x = 0
    x, y = fwd(np.full(4, 10.0), np.array([0.0, 20.0, 45.0, 70.0]))
    np.testing.assert_allclose(x, 0.0, atol=1e-6)
    np.testing.assert_allclose(np.diff(y),
                               R_s * np.radians(np.diff([0.0, 20.0, 45.0, 70.0])),
                               rtol=1e-12)

    # every parallel true to scale (arc length == R cos(phi) dlam)
    for latp in (-30.0, 20.0, 60.0):
        lons = np.linspace(-20.0, 40.0, 2001)
        xs, ys = fwd(lons, np.full(lons.shape, latp))
        arc = np.sum(np.hypot(np.diff(xs), np.diff(ys)))
        true = R_s * np.cos(np.radians(latp)) * np.radians(60.0)
        np.testing.assert_allclose(arc, true, rtol=1e-8)

    # round-trip (including southern aspect)
    lon2, lat2 = inv(*fwd(lon, lat))
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    fs, is_ = bonne(-30.0, 0.0, 0.0, 0.0, R=R_s)
    lo, la = is_(*fs(25.0, -45.0))
    assert abs(lo - 25.0) < 1e-9 and abs(la - -45.0) < 1e-9

    # Werner (lat_1 = 90)
    fw, iw = bonne(90.0, 0.0, 0.0, 0.0, R=R_s)
    lo, la = iw(*fw(30.0, 50.0))
    assert abs(lo - 30.0) < 1e-9 and abs(la - 50.0) < 1e-9


def test_cassini_series_vs_exact_spherical_limit():
    from gdal_ray.crs import cassini, cassini_spherical_exact

    R_s = 6370997.0
    # e = 0: the ellipsoidal series must reproduce the closed spherical
    # form — an independent validation of the series structure
    fs, _ = cassini(10.0, -61.0, 0.0, 0.0, a=R_s, f=0.0)
    fe_, _ = cassini_spherical_exact(10.0, -61.0, R_s)
    rng = np.random.default_rng(31)
    lon = rng.uniform(-64.0, -58.0, 400)   # |dlam| <= 3 deg
    lat = rng.uniform(-70.0, 70.0, 400)
    xs, ys = fs(lon, lat)
    xe, ye = fe_(lon, lat)
    np.testing.assert_allclose(xs, xe, atol=0.02)  # metres
    np.testing.assert_allclose(ys, ye, atol=0.02)


def test_cassini_ellipsoidal_properties():
    from gdal_ray.crs import cassini, _merid_arc_fns, _ecc

    fwd, inv = cassini(10.44139, -61.33333, 430000.0, 325000.0)  # Trinidad-ish
    e2 = _ecc(F_WGS84) ** 2
    M, _ = _merid_arc_fns(A_WGS84, e2)
    # central meridian exactly true
    lats = np.array([8.0, 10.44139, 11.5, 13.0])
    x, y = fwd(np.full(lats.shape, -61.33333), lats)
    np.testing.assert_allclose(x, 430000.0, atol=1e-9)
    np.testing.assert_allclose(
        y - 325000.0, M(np.radians(lats)) - M(np.radians(10.44139)),
        rtol=1e-12)
    # round-trip within the grid's working extent
    rng = np.random.default_rng(33)
    lon = rng.uniform(-63.0, -60.0, 400)
    lat = rng.uniform(9.0, 12.0, 400)
    lon2, lat2 = inv(*fwd(lon, lat))
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # proj front end
    from gdal_ray.crs import proj_pair

    f2, i2 = proj_pair("+proj=cass +lat_0=10.44139 +lon_0=-61.33333 "
                       "+x_0=430000 +y_0=325000 +ellps=WGS84")
    lo, la = i2(*f2(-61.0, 10.6))
    assert abs(lo - -61.0) < 1e-9 and abs(la - 10.6) < 1e-9


def test_nztm_2193():
    from gdal_ray.crs import A_WGS84, _ecc, _merid_arc_fns, conic_pair

    f, i = conic_pair(2193)
    # false origin identity: (0N, 173E) -> (1600000, 10000000) exactly
    x, y = f(173.0, 0.0)
    assert abs(float(x) - 1600000.0) < 1e-6
    assert abs(float(y) - 10000000.0) < 1e-6
    # central meridian scale = k0: northing differences along lon0 equal
    # 0.9996 x the meridian arc
    e2 = _ecc(1 / 298.257222101) ** 2
    M, _ = _merid_arc_fns(A_WGS84, e2)
    lats = np.array([-48.0, -41.0, -34.0])
    xs, ys = f(np.full(3, 173.0), lats)
    np.testing.assert_allclose(xs, 1600000.0, atol=1e-6)
    np.testing.assert_allclose(
        np.diff(ys), 0.9996 * np.diff(M(np.radians(lats))), rtol=1e-9)
    # round-trip over the NZ extent
    rng = np.random.default_rng(17)
    lon = rng.uniform(166.0, 179.0, 300)
    lat = rng.uniform(-47.5, -34.0, 300)
    lon2, lat2 = i(*f(lon, lat))
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_eckert4_equal_area_and_shape():
    from gdal_ray.crs import eckert4

    R_s = 6371000.0
    fwd, inv = eckert4(0.0, 0.0, 0.0, R=R_s)
    # equal-area: FD Jacobian == R^2 cos(phi) — validates the constants
    rng = np.random.default_rng(23)
    lon = rng.uniform(-170, 170, 300)
    lat = rng.uniform(-85, 85, 300)
    h = 1e-6
    xl1, yl1 = fwd(lon + h, lat)
    xl0, yl0 = fwd(lon - h, lat)
    xp1, yp1 = fwd(lon, lat + h)
    xp0, yp0 = fwd(lon, lat - h)
    J = np.abs(((np.asarray(xl1) - xl0) * (np.asarray(yp1) - yp0)
                - (np.asarray(yl1) - yl0) * (np.asarray(xp1) - xp0))
               / np.radians(2 * h) ** 2)
    np.testing.assert_allclose(J, R_s**2 * np.cos(np.radians(lat)),
                               rtol=5e-5)
    # shape anchors: poles map to (0, ±CY·R·sin(π/2)); the pole line is a
    # point on the central meridian at half the equator's half-length
    xe, _ye = fwd(180.0, 0.0)
    xp, yp = fwd(0.0, 90.0)
    # the classic Eckert IV 2:1 aspect: pole height = half the equator
    # half-length (CY / (2π·CX) = 1/2 exactly)
    assert abs(yp / xe - 0.5) < 1e-12
    assert abs(xp) < 1e-6
    # equator is y = 0 and linear in longitude
    xs, ys = fwd(np.array([-90.0, 45.0]), np.zeros(2))
    np.testing.assert_allclose(ys, 0.0, atol=1e-9)
    assert abs(xs[1] / xs[0] + 0.5) < 1e-12
    # round-trip
    lon2, lat2 = inv(*fwd(lon, lat))
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)
