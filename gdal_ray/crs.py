"""Closed-form coordinate reference systems: WGS84 UTM zones via the
Krüger series transverse Mercator (6th order in the third flattening —
sub-millimeter vs PROJ's tmerc over a zone's width).

Reference semantics: OGRProjCT::Transform (ogr/ogrct.cpp:2323) for the
EPSG:4326 ↔ EPSG:326xx/327xx pairs used throughout autotest/alg/warp.py;
no PROJ exists in this sandbox, so the projection math is implemented
from the published Krüger/Karney series (public formulas).

All functions are vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

# WGS84
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
K0 = 0.9996
E0 = 500000.0  # false easting
N0_SOUTH = 10000000.0

_n = F_WGS84 / (2.0 - F_WGS84)
_e = np.sqrt(F_WGS84 * (2.0 - F_WGS84))  # first eccentricity
# rectifying radius
_A = A_WGS84 / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64 + _n**6 / 256)

# Krüger series coefficients (6th order in n) — forward (alpha),
# inverse (beta), and inverse conformal latitude (delta)
_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
    - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630
    - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])
_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
    - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
    + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])
_DELTA = np.array([
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45 + 26 * _n**5 / 45
    - 2854 * _n**6 / 675,
    7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45 + 2704 * _n**5 / 315
    + 2323 * _n**6 / 945,
    56 * _n**3 / 15 - 136 * _n**4 / 35 - 1262 * _n**5 / 105 + 73814 * _n**6 / 2835,
    4279 * _n**4 / 630 - 332 * _n**5 / 35 - 399572 * _n**6 / 14175,
    4174 * _n**5 / 315 - 144838 * _n**6 / 6237,
    601676 * _n**6 / 22275,
])


def utm_zone_params(epsg: int) -> tuple[float, float]:
    """(central meridian degrees, false northing) for EPSG:326xx/327xx."""
    if 32601 <= epsg <= 32660:
        zone, fn = epsg - 32600, 0.0
    elif 32701 <= epsg <= 32760:
        zone, fn = epsg - 32700, N0_SOUTH
    else:
        raise ValueError(f"not a WGS84 UTM EPSG code: {epsg}")
    return -183.0 + 6.0 * zone, fn


def lonlat_to_tmerc(lon, lat, lon0_deg: float, false_northing: float = 0.0):
    """Forward ellipsoidal transverse Mercator (Krüger series)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _e * np.arctanh(_e * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi = xi + _ALPHA[j] * np.sin(w * xi_p) * np.cosh(w * eta_p)
        eta = eta + _ALPHA[j] * np.cos(w * xi_p) * np.sinh(w * eta_p)
    easting = E0 + K0 * _A * eta
    northing = false_northing + K0 * _A * xi
    return easting, northing


def tmerc_to_lonlat(e, n, lon0_deg: float, false_northing: float = 0.0):
    """Inverse ellipsoidal transverse Mercator (Krüger series)."""
    xi = (np.asarray(n, dtype=np.float64) - false_northing) / (K0 * _A)
    eta = (np.asarray(e, dtype=np.float64) - E0) / (K0 * _A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi_p = xi_p - _BETA[j] * np.sin(w * xi) * np.cosh(w * eta)
        eta_p = eta_p - _BETA[j] * np.cos(w * xi) * np.sinh(w * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    phi = chi.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        phi = phi + _DELTA[j] * np.sin(w * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


def utm_fwd(epsg: int):
    lon0, fn = utm_zone_params(epsg)

    def f(lon, lat):
        return lonlat_to_tmerc(lon, lat, lon0, fn)

    return f


def utm_inv(epsg: int):
    lon0, fn = utm_zone_params(epsg)

    def f(e, n):
        return tmerc_to_lonlat(e, n, lon0, fn)

    return f


def parse_epsg(crs: str) -> int:
    if not crs.upper().startswith("EPSG:"):
        raise ValueError(f"expected EPSG:<code>, got {crs!r}")
    return int(crs.split(":", 1)[1])


def transform_fn(src_crs: str, dst_crs: str):
    """f(x, y) -> (x', y') for any pair of {EPSG:4326, EPSG:3857, WGS84 UTM
    zones} — the closed-form subset of OGRCreateCoordinateTransformation.
    Composes through 4326 for projected↔projected pairs."""
    from gdal_ray import tilemath as tm

    if src_crs == dst_crs:
        return lambda x, y: (x, y)

    def to4326(crs):
        code = parse_epsg(crs)
        if code == 4326:
            return lambda x, y: (x, y)
        if code == 3857:
            return tm.meters_to_lonlat
        return utm_inv(code)

    def from4326(crs):
        code = parse_epsg(crs)
        if code == 4326:
            return lambda x, y: (x, y)
        if code == 3857:
            return lambda lon, lat: tm.lonlat_to_meters(
                lon, np.clip(lat, -tm.MAX_LATITUDE, tm.MAX_LATITUDE)
            )
        return utm_fwd(code)

    inv = to4326(src_crs)
    fwd = from4326(dst_crs)

    def f(x, y):
        lon, lat = inv(x, y)
        return fwd(lon, lat)

    return f
