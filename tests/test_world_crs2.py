"""Winkel Tripel + Robinson world projections — round trips plus
INDEPENDENT anchors derived by hand from the defining formulas (closed
equator / central-meridian lines for Winkel, the published Robinson 1974
table knots), so the checks do not share code with the implementation."""
import numpy as np

from gdal_ray.crs import (
    A_WGS84,
    _ROBINSON_FXC, _ROBINSON_FYC,
    proj_pair, robinson, transform_fn, winkel_tripel,
)

LONS = np.array([-179.0, -123.4, -60.0, -0.5, 0.0, 31.7, 91.0, 179.0])
LATS = np.array([-82.0, -45.0, -12.3, 0.0, 8.0, 33.3, 60.0, 84.0])


def _grid():
    lon, lat = np.meshgrid(LONS, LATS)
    return lon.ravel(), lat.ravel()


def _roundtrip(fwd, inv, tol):
    lon, lat = _grid()
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    assert np.abs(lon2 - lon).max() < tol
    assert np.abs(lat2 - lat).max() < tol


# --- Winkel Tripel -----------------------------------------------------------

def test_wintri_roundtrip():
    fwd, inv = winkel_tripel(None, 0.0, 0.0, 0.0, R=A_WGS84)
    _roundtrip(fwd, inv, 1e-7)


def test_wintri_central_meridian_is_scaled_latitude():
    # lam = 0: alpha = |phi|, sinc alpha = sin|phi|/|phi| -> y = R*phi, x = 0.
    fwd, _ = winkel_tripel(None, 0.0, 0.0, 0.0, R=1.0)
    lat = np.array([-80.0, -30.0, 0.0, 10.0, 45.0, 89.0])
    x, y = fwd(np.zeros_like(lat), lat)
    assert np.abs(x).max() < 1e-12
    assert np.abs(y - np.radians(lat)).max() < 1e-12


def test_wintri_equator_line():
    # phi = 0: alpha = |lam/2|, the Aitoff term collapses to lam exactly,
    # so x = R*lam*(1 + cos phi1)/2 with Winkel's phi1 = acos(2/pi).
    fwd, _ = winkel_tripel(None, 0.0, 0.0, 0.0, R=1.0)
    lon = np.array([-150.0, -60.0, -1.0, 2.0, 90.0, 179.0])
    x, y = fwd(lon, np.zeros_like(lon))
    assert np.abs(y).max() < 1e-12
    expect = np.radians(lon) * (1.0 + 2.0 / np.pi) / 2.0
    assert np.abs(x - expect).max() < 1e-12


def test_wintri_symmetry():
    fwd, _ = winkel_tripel(None, 0.0, 0.0, 0.0, R=1.0)
    x1, y1 = fwd(np.array([40.0]), np.array([30.0]))
    x2, y2 = fwd(np.array([-40.0]), np.array([30.0]))
    x3, y3 = fwd(np.array([40.0]), np.array([-30.0]))
    assert np.isclose(x1, -x2) and np.isclose(y1, y2)
    assert np.isclose(x1, x3) and np.isclose(y1, -y3)


def test_wintri_custom_parallel_and_lon0():
    fwd, inv = winkel_tripel(40.0, 11.0, 100.0, -200.0, R=A_WGS84)
    _roundtrip(fwd, inv, 1e-7)


# --- Robinson ----------------------------------------------------------------

def test_robinson_roundtrip():
    fwd, inv = robinson(0.0, 0.0, 0.0, R=A_WGS84)
    _roundtrip(fwd, inv, 1e-7)
    fwd, inv = robinson(-17.0, 5000.0, -3000.0, R=A_WGS84)
    _roundtrip(fwd, inv, 1e-7)


def test_robinson_published_knots():
    # Spline interpolation is exact at the knots: check a few published
    # (X, Y) rows of Robinson's 1974 table directly through fwd().
    fwd, _ = robinson(0.0, 0.0, 0.0, R=1.0)
    for lat, X, Y in [(0.0, 1.0000, 0.0000), (45.0, 0.8962, 0.5571),
                      (60.0, 0.7986, 0.7346), (90.0, 0.5322, 1.0000)]:
        x, y = fwd(np.array([57.3]), np.array([lat]))
        assert np.isclose(x[0], _ROBINSON_FXC * X * np.radians(57.3), atol=1e-12)
        assert np.isclose(y[0], _ROBINSON_FYC * Y, atol=1e-12)
        x, y = fwd(np.array([57.3]), np.array([-lat]))
        assert np.isclose(y[0], -_ROBINSON_FYC * Y, atol=1e-12)


def test_robinson_equator_is_scaled_longitude():
    fwd, _ = robinson(0.0, 0.0, 0.0, R=1.0)
    lon = np.array([-179.0, -45.0, 0.0, 30.0, 120.0])
    x, y = fwd(lon, np.zeros_like(lon))
    assert np.abs(y).max() < 1e-12
    assert np.abs(x - _ROBINSON_FXC * np.radians(lon)).max() < 1e-12


def test_robinson_y_monotone_in_latitude():
    fwd, _ = robinson(0.0, 0.0, 0.0, R=1.0)
    lat = np.linspace(-90.0, 90.0, 721)
    _, y = fwd(np.zeros_like(lat), lat)
    assert (np.diff(y) > 0).all()


# --- dispatch ----------------------------------------------------------------

def test_proj_string_and_esri_codes():
    for s in ("+proj=wintri +R=6371000", "+proj=robin +a=6378137 +b=6378137",
              "+proj=wintri +lat_1=50 +lon_0=9 +R=6371000"):
        fwd, inv = proj_pair(s)
        _roundtrip(fwd, inv, 1e-7)
    for code in ("ESRI:54030", "ESRI:54042", "ESRI:54012"):
        f = transform_fn("EPSG:4326", code)
        g = transform_fn(code, "EPSG:4326")
        lon, lat = _grid()
        lon2, lat2 = g(*f(lon, lat))
        assert np.abs(lon2 - lon).max() < 1e-7
        assert np.abs(lat2 - lat).max() < 1e-7


# --- Equal Earth -------------------------------------------------------------

def _area_scale(fwd, lon, lat):
    h = 1e-6
    x0, y0 = fwd(lon, lat)
    xl, yl = fwd(lon + h, lat)
    xp, yp = fwd(lon, lat + h)
    hr = np.radians(h)
    return ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (hr * hr)


def test_eqearth_roundtrip():
    from gdal_ray.crs import equal_earth
    fwd, inv = equal_earth(0.0, 0.0, 0.0, R=A_WGS84)
    _roundtrip(fwd, inv, 1e-8)
    fwd, inv = equal_earth(23.0, 1500.0, -400.0, R=A_WGS84)
    _roundtrip(fwd, inv, 1e-8)


def test_eqearth_equal_area_jacobian():
    # |d(x,y)/d(lam,phi)| == R^2 cos(phi) — independent of the published
    # polynomial constants: any (A1..A4) satisfies it by construction, so
    # this pins the STRUCTURE (y'(theta) cancellation) not the numbers.
    from gdal_ray.crs import equal_earth
    fwd, _ = equal_earth(0.0, 0.0, 0.0, R=1.0)
    lon = np.array([-120.0, -30.0, 0.0, 45.0, 170.0])
    lat = np.array([-75.0, -20.0, 0.0, 33.0, 80.0])
    J = _area_scale(fwd, lon, lat)
    np.testing.assert_allclose(J, np.cos(np.radians(lat)), rtol=1e-5)


def test_eqearth_equator_and_meridian():
    # phi = 0: theta = 0, y = 0, x = R lam (2 sqrt(3)/3) / A1.
    from gdal_ray.crs import equal_earth
    fwd, _ = equal_earth(0.0, 0.0, 0.0, R=1.0)
    lon = np.array([-150.0, -10.0, 60.0])
    x, y = fwd(lon, np.zeros_like(lon))
    assert np.abs(y).max() < 1e-12
    expect = np.radians(lon) * (2.0 * np.sqrt(3.0) / 3.0) / 1.340264
    assert np.abs(x - expect).max() < 1e-12
    # lam = 0 maps onto the central meridian for all latitudes.
    lat = np.linspace(-89.0, 89.0, 13)
    x, y = fwd(np.zeros_like(lat), lat)
    assert np.abs(x).max() < 1e-12
    assert (np.diff(y) > 0).all()


def test_eqearth_epsg_code():
    f = transform_fn("EPSG:4326", "EPSG:8857")
    g = transform_fn("EPSG:8857", "EPSG:4326")
    lon, lat = _grid()
    lon2, lat2 = g(*f(lon, lat))
    assert np.abs(lon2 - lon).max() < 1e-8
    assert np.abs(lat2 - lat).max() < 1e-8
