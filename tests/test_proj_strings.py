"""PROJ-string front end (crs.proj_pair) — arbitrary-parameter CRS resolved
onto the closed-form kernels, mirroring the subset of
OGRCreateCoordinateTransformation (ogr/ogrct.cpp:2323) these families cover."""

import numpy as np
import pytest

from gdal_ray import crs


LON = np.linspace(-5.0, 10.0, 23)
LAT = np.linspace(41.0, 51.0, 23)


def test_lcc_string_equals_epsg_table():
    """Lambert-93 by parameters must equal the EPSG:2154 table path
    bit-for-bit (same kernel, same constants)."""
    fwd_t, inv_t = crs.conic_pair(2154)
    fwd_p, inv_p = crs.proj_pair(
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
        "+x_0=700000 +y_0=6600000 +ellps=GRS80")
    np.testing.assert_array_equal(np.array(fwd_t(LON, LAT)),
                                  np.array(fwd_p(LON, LAT)))
    E, N = fwd_p(LON, LAT)
    np.testing.assert_array_equal(np.array(inv_t(E, N)), np.array(inv_p(E, N)))


def test_utm_string_equals_utm_kernel():
    fwd_p, inv_p = crs.proj_pair("+proj=utm +zone=31 +ellps=WGS84")
    np.testing.assert_allclose(np.array(fwd_p(LON, LAT)),
                               np.array(crs.utm_fwd(32631)(LON, LAT)),
                               rtol=0, atol=1e-6)
    fwd_s, _ = crs.proj_pair("+proj=utm +zone=31 +south +ellps=WGS84")
    _, n_n = fwd_p(LON, LAT)
    _, n_s = fwd_s(LON, LAT)
    np.testing.assert_allclose(n_s - n_n, 10000000.0, atol=1e-6)


def test_polar_stere_string_equals_epsg_table():
    fwd_t, _ = crs.conic_pair(3413)
    fwd_p, inv_p = crs.proj_pair(
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84")
    lon = np.linspace(-170, 170, 19)
    lat = np.linspace(60, 89, 19)
    np.testing.assert_array_equal(np.array(fwd_t(lon, lat)),
                                  np.array(fwd_p(lon, lat)))
    E, N = fwd_p(lon, lat)
    lo, la = inv_p(E, N)
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


def test_tmerc_arbitrary_origin_scale():
    """OSGB-style parameters: projected origin lands exactly on
    (x_0, y_0); round trip is exact to 1e-12 deg."""
    s = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 "
         "+x_0=400000 +y_0=-100000 +ellps=WGS84")
    fwd, inv = crs.proj_pair(s)
    x, y = fwd(np.array([-2.0]), np.array([49.0]))
    np.testing.assert_allclose([x[0], y[0]], [400000.0, -100000.0], atol=1e-6)
    X, Y = fwd(LON, LAT)
    lo, la = inv(X, Y)
    np.testing.assert_allclose(lo, LON, atol=1e-12)
    np.testing.assert_allclose(la, LAT, atol=1e-12)
    # k_0 scales distances from the central meridian origin linearly
    fwd1, _ = crs.proj_pair(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +x_0=400000 +y_0=-100000 +ellps=WGS84")
    X1, Y1 = fwd1(LON, LAT)
    np.testing.assert_allclose((X - 400000.0) / (X1 - 400000.0),
                               0.9996012717, rtol=1e-12)


def test_tmerc_sphere_closed_form():
    """On a sphere the Krüger series must collapse to the exact spherical
    transverse Mercator: x = R·atanh(sin λ cos φ)."""
    fwd, inv = crs.proj_pair("+proj=tmerc +R=6370997")
    lam = np.radians(LON)
    phi = np.radians(LAT)
    x_exact = 6370997.0 * np.arctanh(np.sin(lam) * np.cos(phi))
    X, Y = fwd(LON, LAT)
    np.testing.assert_allclose(X, x_exact, rtol=1e-9)
    lo, la = inv(X, Y)
    np.testing.assert_allclose(lo, LON, atol=1e-9)
    np.testing.assert_allclose(la, LAT, atol=1e-9)


def test_mercator_lat_ts_and_roundtrip():
    fwd, inv = crs.proj_pair("+proj=merc +ellps=WGS84")
    X, Y = fwd(LON, LAT)
    lo, la = inv(X, Y)
    np.testing.assert_allclose(lo, LON, atol=1e-12)
    np.testing.assert_allclose(la, LAT, atol=1e-12)
    np.testing.assert_allclose(fwd(np.array([0.0]), np.array([0.0])), 0.0,
                               atol=1e-9)
    # +lat_ts scales everything by m(lat_ts)
    fwd_ts, _ = crs.proj_pair("+proj=merc +lat_ts=45 +ellps=WGS84")
    k = crs._m(np.radians(45.0), crs._ecc(crs.F_WGS84))
    X2, Y2 = fwd_ts(LON, LAT)
    np.testing.assert_allclose(X2, X * k, rtol=1e-12)
    np.testing.assert_allclose(Y2, Y * k, rtol=1e-12)


def test_eqc_plate_carree():
    fwd, inv = crs.proj_pair("+proj=eqc +R=6371007")
    X, Y = fwd(np.array([90.0]), np.array([45.0]))
    np.testing.assert_allclose(X[0], 6371007.0 * np.pi / 2, rtol=1e-12)
    np.testing.assert_allclose(Y[0], 6371007.0 * np.pi / 4, rtol=1e-12)
    lo, la = inv(X, Y)
    np.testing.assert_allclose([lo[0], la[0]], [90.0, 45.0], atol=1e-12)


def test_transform_fn_accepts_proj_strings():
    f = crs.transform_fn("+proj=utm +zone=31 +ellps=WGS84", "EPSG:4326")
    E, N = crs.utm_fwd(32631)(LON, LAT)
    lo, la = f(E, N)
    np.testing.assert_allclose(lo, LON, atol=1e-9)
    np.testing.assert_allclose(la, LAT, atol=1e-9)
    g = crs.transform_fn("EPSG:4326",
                         "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 "
                         "+lon_0=-96 +ellps=GRS80")
    np.testing.assert_array_equal(np.array(g(LON, LAT)),
                                  np.array(crs.conic_pair(5070)[0](LON, LAT)))


def test_ellipsoid_resolution():
    assert crs._proj_ellipsoid({"a": 6378388.0, "rf": 297.0}) == (6378388.0, 1 / 297.0)
    assert crs._proj_ellipsoid({"R": 6371000.0}) == (6371000.0, 0.0)
    a, f = crs._proj_ellipsoid({"ellps": "bessel"})
    assert a == 6377397.155
    b = a * (1 - f)
    a2, f2 = crs._proj_ellipsoid({"a": a, "b": b})
    np.testing.assert_allclose(f2, f, rtol=1e-12)


def test_unsupported_projections_raise():
    with pytest.raises(NotImplementedError, match=r"\+proj=igh"):
        crs.proj_pair("+proj=igh +ellps=WGS84")
    with pytest.raises(NotImplementedError, match="oblique"):
        crs.proj_pair("+proj=stere +lat_0=52 +lon_0=5 +ellps=bessel")
    # airy/mod_airy/WGS72/krass/aust_SA joined the table in round 5
    # (EPSG registry); Everest 1830 remains honestly outside it
    with pytest.raises(NotImplementedError, match="ellipsoid"):
        crs.proj_pair("+proj=merc +ellps=evrst30")


def test_geocentric_anchors_and_roundtrip():
    a, f = crs.A_WGS84, crs.F_WGS84
    b = a * (1 - f)
    X, Y, Z = crs.geodetic_to_geocentric(np.array([0.0]), np.array([0.0]), a, f)
    np.testing.assert_allclose([X[0], Y[0], Z[0]], [a, 0.0, 0.0], atol=1e-9)
    X, Y, Z = crs.geodetic_to_geocentric(np.array([0.0]), np.array([90.0]), a, f)
    np.testing.assert_allclose(Z[0], b, atol=1e-6)
    lon = np.linspace(-179.0, 179.0, 37)
    lat = np.linspace(-89.0, 89.0, 37)
    lo, la = crs.geocentric_to_geodetic(*crs.geodetic_to_geocentric(lon, lat, a, f), a, f)
    np.testing.assert_allclose(lo, lon, atol=1e-10)
    np.testing.assert_allclose(la, lat, atol=1e-10)


def test_helmert_translation_and_inverse():
    fwd, inv = crs.helmert_fns([100.0, -200.0, 50.0])
    X, Y, Z = fwd(np.array([1e6]), np.array([2e6]), np.array([3e6]))
    np.testing.assert_allclose([X[0], Y[0], Z[0]], [1e6 + 100, 2e6 - 200, 3e6 + 50])
    fwd7, inv7 = crs.helmert_fns(
        [446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894])
    P = (np.array([3.9e6]), np.array([-1.0e5]), np.array([5.0e6]))
    Q = fwd7(*P)
    R = inv7(*Q)
    for p, r in zip(P, R):
        np.testing.assert_allclose(r, p, atol=1e-9)  # exact matrix inverse
    with pytest.raises(ValueError, match="3 or 7"):
        crs.helmert_fns([1.0, 2.0])


def test_towgs84_in_proj_string():
    """+towgs84 makes the lon/lat side WGS84: a pure translation moves the
    geocentric frame by exactly (dx,dy,dz), and the full chain round-trips."""
    base = "+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 " \
           "+x_0=400000 +y_0=-100000 +ellps=intl"
    fwd0, inv0 = crs.proj_pair(base)
    fwd1, inv1 = crs.proj_pair(base + " +towgs84=100,200,-300")
    lon = np.linspace(-6.0, 2.0, 11)
    lat = np.linspace(50.0, 58.0, 11)
    # datum shift changes the projected coords…
    X0, Y0 = fwd0(lon, lat)
    X1, Y1 = fwd1(lon, lat)
    assert np.abs(X1 - X0).max() > 10.0
    # …and round-trips through the full chain.  2D shifts drop ellipsoidal
    # height on DIFFERENT ellipsoids in the two directions (h=0 enforced on
    # the source each way), so the round trip is cm-level, not fp-exact —
    # the same asymmetry PROJ's 2D +towgs84 pipeline has.
    lo, la = inv1(X1, Y1)
    np.testing.assert_allclose(lo, lon, atol=1e-6)
    np.testing.assert_allclose(la, lat, atol=1e-6)
    # zero params short-circuit to the raw pair
    fwdz, _ = crs.proj_pair(base + " +towgs84=0,0,0")
    np.testing.assert_array_equal(np.array(fwdz(lon, lat)), np.array([X0, Y0]))
    # 7-param OSGB-style chain round-trips too
    fwd7, inv7 = crs.proj_pair(
        base + " +towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894")
    X7, Y7 = fwd7(lon, lat)
    lo, la = inv7(X7, Y7)
    np.testing.assert_allclose(lo, lon, atol=1e-6)
    np.testing.assert_allclose(la, lat, atol=1e-6)
    # transform_fn composes the shifted CRS with plain EPSG:4326
    g = crs.transform_fn(base + " +towgs84=100,200,-300", "EPSG:4326")
    lo, la = g(X1, Y1)
    np.testing.assert_allclose(lo, lon, atol=1e-6)
