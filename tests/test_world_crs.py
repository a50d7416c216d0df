"""World-projection CRS kernels (sinusoidal, Mollweide, cylindrical
equal-area, ellipsoidal orthographic) — round trips plus INDEPENDENT
anchors: published constants (WGS84 quarter meridian, EASE-Grid 2.0
width) and differential-geometry invariants (equal-area Jacobian ==
ellipsoid area element; Mercator conformality), so the checks do not
share code with the implementation."""
import numpy as np
import pytest

from gdal_ray.crs import (
    A_WGS84, F_WGS84,
    cea, mercator_1sp, mollweide, orthographic, sinusoidal,
    proj_pair, transform_fn,
)

E2 = F_WGS84 * (2.0 - F_WGS84)

LONS = np.array([-179.0, -123.4, -60.0, -0.5, 0.0, 31.7, 91.0, 179.0])
LATS = np.array([-82.0, -45.0, -12.3, 0.0, 8.0, 33.3, 60.0, 84.0])


def _grid():
    lon, lat = np.meshgrid(LONS, LATS)
    return lon.ravel(), lat.ravel()


def _roundtrip(fwd, inv, tol=1e-9):
    lon, lat = _grid()
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    assert np.abs(lon2 - lon).max() < tol
    assert np.abs(lat2 - lat).max() < tol


def _area_scale(fwd, lon, lat):
    """FD Jacobian determinant of (x,y) w.r.t. (λ,φ) in radians."""
    h = 1e-6
    x0, y0 = fwd(lon, lat)
    xl, yl = fwd(lon + h, lat)
    xp, yp = fwd(lon, lat + h)
    hr = np.radians(h)
    return ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (hr * hr)


def _ellipsoid_area_element(lat):
    phi = np.radians(lat)
    s2 = np.sin(phi) ** 2
    M = A_WGS84 * (1 - E2) / (1 - E2 * s2) ** 1.5
    N = A_WGS84 / np.sqrt(1 - E2 * s2)
    return M * N * np.cos(phi)


@pytest.mark.parametrize("make", [
    lambda: sinusoidal(0.0, 0.0, 0.0),
    lambda: mollweide(0.0, 0.0, 0.0),
    lambda: cea(30.0, 0.0, 0.0, 0.0),
    lambda: cea(0.0, 13.0, 100000.0, -200000.0),
    lambda: orthographic(40.0, -75.0, 0.0, 0.0),
    lambda: mercator_1sp(0.0, 0.0, 1.0, 0.0, 0.0),
])
def test_roundtrip(make):
    fwd, inv = make()
    if make.__code__.co_consts and "orthographic" in str(make.__code__.co_names):
        # restrict to the visible hemisphere around (40N, 75W)
        lon = np.linspace(-110.0, -40.0, 9)
        lat = np.linspace(5.0, 75.0, 9)
        lon, lat = np.meshgrid(lon, lat)
        x, y = fwd(lon.ravel(), lat.ravel())
        lon2, lat2 = inv(x, y)
        assert np.abs(lon2 - lon.ravel()).max() < 1e-9
        assert np.abs(lat2 - lat.ravel()).max() < 1e-9
    else:
        _roundtrip(fwd, inv)


def test_sinusoidal_quarter_meridian():
    # published WGS84 quarter meridian: 10 001 965.729 m
    fwd, _ = sinusoidal(0.0, 0.0, 0.0)
    _, y = fwd(0.0, 90.0)
    assert abs(float(y) - 10001965.729) < 0.01


def test_equal_area_jacobians():
    lon, lat = _grid()
    keep = np.abs(lat) < 80  # FD noise near poles
    lon, lat = lon[keep], lat[keep]
    want = _ellipsoid_area_element(lat)
    for fwd, _ in (sinusoidal(0.0, 0.0, 0.0), cea(30.0, 0.0, 0.0, 0.0)):
        got = _area_scale(fwd, lon, lat)
        assert np.abs(got / want - 1.0).max() < 1e-4
    # Mollweide is equal-area on the R=a SPHERE
    fwd, _ = mollweide(0.0, 0.0, 0.0)
    got = _area_scale(fwd, lon, lat)
    want_sphere = A_WGS84 ** 2 * np.cos(np.radians(lat))
    assert np.abs(got / want_sphere - 1.0).max() < 1e-4


def test_mercator_3395_conformal_and_anchors():
    fwd, inv = mercator_1sp(0.0, 0.0, 1.0, 0.0, 0.0)
    # x is linear in longitude: x(180) = πa
    x, y = fwd(180.0, 0.0)
    assert abs(float(x) - np.pi * A_WGS84) < 1e-6
    assert abs(float(y)) < 1e-6
    # conformality: meridian scale == parallel scale (FD, ground metric)
    lon, lat = _grid()
    keep = np.abs(lat) < 80
    lon, lat = lon[keep], lat[keep]
    h = 1e-6
    x0, y0 = fwd(lon, lat)
    xl, yl = fwd(lon + h, lat)
    xp, yp = fwd(lon, lat + h)
    phi = np.radians(lat)
    s2 = np.sin(phi) ** 2
    Nr = A_WGS84 / np.sqrt(1 - E2 * s2)
    Mr = A_WGS84 * (1 - E2) / (1 - E2 * s2) ** 1.5
    k_par = np.hypot(xl - x0, yl - y0) / (np.radians(h) * Nr * np.cos(phi))
    k_mer = np.hypot(xp - x0, yp - y0) / (np.radians(h) * Mr)
    assert np.abs(k_par / k_mer - 1.0).max() < 1e-4
    # ellipsoidal Mercator differs from spherical (web) Mercator in y
    from gdal_ray.tilemath import lonlat_to_meters
    _, y_web = lonlat_to_meters(0.0, 45.0)
    _, y_3395 = fwd(0.0, 45.0)
    assert abs(float(y_web) - float(y_3395)) > 10000.0


def test_ease_grid2_width():
    # NSIDC EASE-Grid 2.0 half-width (published): 17 367 530.445 m
    fwd, _ = cea(30.0, 0.0, 0.0, 0.0)
    x, _ = fwd(180.0, 0.0)
    assert abs(float(x) - 17367530.445) < 0.01


def test_orthographic_spherical_limit():
    # with f=0 the EPSG 9840 forward must equal Snyder's spherical 20-3/20-4
    R = 6370997.0
    lat0, lon0 = 40.0, -100.0
    fwd, _ = orthographic(lat0, lon0, 0.0, 0.0, a=R, f=0.0)
    lon, lat = np.array([-110.0, -90.0, -100.0]), np.array([30.0, 50.0, 40.0])
    x, y = fwd(lon, lat)
    lam = np.radians(lon - lon0)
    phi = np.radians(lat)
    p0 = np.radians(lat0)
    xs = R * np.cos(phi) * np.sin(lam)
    ys = R * (np.cos(p0) * np.sin(phi) - np.sin(p0) * np.cos(phi) * np.cos(lam))
    assert np.abs(x - xs).max() < 1e-6
    assert np.abs(y - ys).max() < 1e-6


def test_proj_strings_and_epsg_codes():
    for s in ("+proj=sinu +ellps=WGS84", "+proj=moll +a=6378137",
              "+proj=cea +lat_ts=30 +ellps=WGS84",
              "+proj=ortho +lat_0=20 +lon_0=5 +ellps=WGS84"):
        fwd, inv = proj_pair(s)
        lon, lat = 10.0, 25.0
        x, y = fwd(lon, lat)
        lon2, lat2 = inv(x, y)
        assert abs(float(lon2) - lon) < 1e-8 and abs(float(lat2) - lat) < 1e-8

    for code in ("EPSG:3395", "EPSG:6933", "ESRI:54008", "ESRI:54009"):
        f = transform_fn("EPSG:4326", code)
        g = transform_fn(code, "EPSG:4326")
        x, y = f(np.array([12.0]), np.array([-33.0]))
        lon, lat = g(x, y)
        assert abs(float(lon) - 12.0) < 1e-8
        assert abs(float(lat) + 33.0) < 1e-8


def test_lcc_1sp_scaled():
    """EPSG 9801 (LCC 1SP with k_0): conformal scale at lat_0 must equal
    k_0 (FD ground-metric check), and round trips hold."""
    s = ("+proj=lcc +lat_0=46.8 +lat_1=46.8 +lon_0=2.337 "
         "+k_0=0.99987742 +x_0=600000 +y_0=200000 +ellps=WGS84")
    fwd, inv = proj_pair(s)
    lon = np.linspace(-4.0, 8.0, 7)
    lat = np.linspace(42.0, 51.0, 7)
    lon, lat = np.meshgrid(lon, lat)
    x, y = fwd(lon.ravel(), lat.ravel())
    lon2, lat2 = inv(x, y)
    assert np.abs(lon2 - lon.ravel()).max() < 1e-9
    assert np.abs(lat2 - lat.ravel()).max() < 1e-9
    # scale along the parallel at lat_0 == k0
    h = 1e-6
    x0, y0 = fwd(2.337, 46.8)
    x1, y1 = fwd(2.337 + h, 46.8)
    phi = np.radians(46.8)
    Nr = A_WGS84 / np.sqrt(1 - E2 * np.sin(phi) ** 2)
    k = float(np.hypot(x1 - x0, y1 - y0)) / (np.radians(h) * Nr * np.cos(phi))
    assert abs(k - 0.99987742) < 1e-7


def test_oblique_stereographic_rd_new():
    """EPSG 9809 (double stereographic) with the RD New / EPSG:28992
    parameters — INDEPENDENT anchor: the EPSG Guidance Note 7-2 worked
    example (53°N 6°E → 196105.283 E, 557057.739 N on Bessel/Amersfoort),
    plus conformality and k0-at-origin FD checks."""
    from gdal_ray.crs import oblique_stereographic

    a, f = 6377397.155, 1 / 299.1528128
    lat0, lon0 = 52.15616055555555, 5.38763888888889
    fwd, inv = oblique_stereographic(lat0, lon0, 0.9999079,
                                     155000.0, 463000.0, a=a, f=f)
    x, y = fwd(lon0, lat0)
    assert abs(float(x) - 155000.0) < 1e-6
    assert abs(float(y) - 463000.0) < 1e-6
    x, y = fwd(6.0, 53.0)
    assert abs(float(x) - 196105.283) < 1e-3
    assert abs(float(y) - 557057.739) < 1e-3
    # round trip over the Netherlands
    lon, lat = np.meshgrid(np.linspace(3.2, 7.3, 7),
                           np.linspace(50.7, 53.6, 7))
    px, py = fwd(lon.ravel(), lat.ravel())
    lon2, lat2 = inv(px, py)
    assert np.abs(lon2 - lon.ravel()).max() < 1e-9
    assert np.abs(lat2 - lat.ravel()).max() < 1e-9
    # conformal: parallel scale == meridian scale; k(origin) == k0
    e2b = f * (2 - f)
    h = 1e-6
    for LO, LA, want_k in ((lon0, lat0, 0.9999079), (6.5, 51.2, None)):
        x0, y0 = fwd(LO, LA)
        xl, yl = fwd(LO + h, LA)
        xp, yp = fwd(LO, LA + h)
        phi = np.radians(LA)
        s2 = np.sin(phi) ** 2
        Nr = a / np.sqrt(1 - e2b * s2)
        Mr = a * (1 - e2b) / (1 - e2b * s2) ** 1.5
        kp = float(np.hypot(xl - x0, yl - y0)) / (np.radians(h) * Nr
                                                  * np.cos(phi))
        km = float(np.hypot(xp - x0, yp - y0)) / (np.radians(h) * Mr)
        assert abs(kp / km - 1.0) < 1e-6
        if want_k is not None:
            assert abs(kp - want_k) < 1e-7
    # +proj string front end
    fwd2, _ = proj_pair("+proj=sterea +lat_0=52.15616055555555 "
                        "+lon_0=5.38763888888889 +k_0=0.9999079 "
                        "+x_0=155000 +y_0=463000 +a=6377397.155 "
                        "+rf=299.1528128")
    x2, y2 = fwd2(6.0, 53.0)
    assert abs(float(x2) - 196105.283) < 1e-3


def test_hotine_omerc_rso_borneo():
    """EPSG 9815 (Hotine Oblique Mercator, azimuth center) — INDEPENDENT
    anchor: the EPSG Guidance Note 7-2 worked example, Timbalai 1948 /
    RSO Borneo (m): 5°23'14.1129"N 115°48'19.8196"E →
    679245.73 E, 596562.78 N on Everest 1830 (1967), plus conformality
    and a wide-area round trip."""
    from gdal_ray.crs import hotine_omerc

    a, f = 6377298.556, 1 / 300.8017
    alpha = 53 + 18 / 60 + 56.9537 / 3600
    gamma = 53 + 7 / 60 + 48.3685 / 3600
    fwd, inv = hotine_omerc(4.0, 115.0, alpha, gamma, 0.99984,
                            590476.87, 442857.65, variant_b=True, a=a, f=f)
    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    E, N = fwd(lon, lat)
    assert abs(float(E) - 679245.73) < 5e-3
    assert abs(float(N) - 596562.78) < 5e-3
    # round trip over Borneo
    lons, lats = np.meshgrid(np.linspace(109, 120, 8), np.linspace(0.5, 8, 8))
    x, y = fwd(lons.ravel(), lats.ravel())
    lo, la = inv(x, y)
    assert np.abs(lo - lons.ravel()).max() < 1e-9
    assert np.abs(la - lats.ravel()).max() < 1e-9
    # conformality (parallel scale == meridian scale) off-axis
    e2b = f * (2 - f)
    h = 1e-6
    for LO, LA in ((117.0, 5.5), (111.0, 2.0)):
        x0, y0 = fwd(LO, LA)
        xl, yl = fwd(LO + h, LA)
        xp, yp = fwd(LO, LA + h)
        phi = np.radians(LA)
        s2 = np.sin(phi) ** 2
        Nr = a / np.sqrt(1 - e2b * s2)
        Mr = a * (1 - e2b) / (1 - e2b * s2) ** 1.5
        kp = float(np.hypot(xl - x0, yl - y0)) / (np.radians(h) * Nr
                                                  * np.cos(phi))
        km = float(np.hypot(xp - x0, yp - y0)) / (np.radians(h) * Mr)
        assert abs(kp / km - 1.0) < 1e-6
    # proj-string front end (PROJ default = variant B; +no_uoff = A)
    fwd2, _ = proj_pair("+proj=omerc +lat_0=4 +lonc=115 "
                        "+alpha=53.3158204722 +gamma=53.1301023611 "
                        "+k_0=0.99984 +x_0=590476.87 +y_0=442857.65 "
                        "+a=6377298.556 +rf=300.8017")
    E2, N2 = fwd2(lon, lat)
    assert abs(float(E2) - 679245.73) < 5e-3
    # variant A differs from B exactly by the rectified u_c offset
    fa, _ = hotine_omerc(4.0, 115.0, alpha, gamma, 0.99984, 0.0, 0.0,
                         variant_b=False, a=a, f=f)
    fb, _ = hotine_omerc(4.0, 115.0, alpha, gamma, 0.99984, 0.0, 0.0,
                         variant_b=True, a=a, f=f)
    xa, ya = fa(lon, lat)
    xb, yb = fb(lon, lat)
    du = np.hypot(float(xa) - float(xb), float(ya) - float(yb))
    assert du > 100000  # the u_c shift is ~738 km along the initial line
