"""Closed-form coordinate reference systems: WGS84 UTM zones via the
Krüger series transverse Mercator (6th order in the third flattening —
sub-millimeter vs PROJ's tmerc over a zone's width), plus Lambert
conformal conic (2SP), polar stereographic (variant B), Albers
equal-area conic, Lambert azimuthal equal-area (oblique + polar),
ellipsoidal Mercator (EPSG:3395), cylindrical equal-area (EPSG:6933
EASE-Grid 2.0), sinusoidal (MODIS grid), Mollweide and ellipsoidal
orthographic from Snyder's *Map Projections — A Working Manual* (USGS
PP 1395, public) and EPSG Guidance Note 7-2, with a parameter table for
the common projected EPSG/ESRI codes (Lambert-93, Canada Atlas Lambert,
CONUS Albers, NSIDC / Antarctic polar stereographic, LAEA Europe, World
Mercator/Sinusoidal/Mollweide, EASE-Grid 2.0).

Reference semantics: OGRProjCT::Transform (ogr/ogrct.cpp:2323) for the
EPSG pairs used throughout autotest/alg/warp.py; no PROJ exists in this
sandbox, so the projection math is implemented from the published
Krüger/Karney series and Snyder closed forms (public formulas).  Datum
shifts between WGS84 and GRS80-based frames (RGF93, NAD83) are treated
as identity — the same zero-shift PROJ applies absent a grid.

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

def _kruger_coeffs(f: float):
    """Krüger series machinery for an arbitrary ellipsoid flattening:
    (n, e, A/a, alpha[6], beta[6], delta[6]) — 6th order in the third
    flattening n (Karney 2011, public)."""
    n = f / (2.0 - f)
    e = np.sqrt(f * (2.0 - f))  # first eccentricity
    rect = 1.0 / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
    alpha = np.array([
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630
        - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    ])
    beta = np.array([
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    ])
    delta = np.array([
        2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45 + 26 * n**5 / 45
        - 2854 * n**6 / 675,
        7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45 + 2704 * n**5 / 315
        + 2323 * n**6 / 945,
        56 * n**3 / 15 - 136 * n**4 / 35 - 1262 * n**5 / 105 + 73814 * n**6 / 2835,
        4279 * n**4 / 630 - 332 * n**5 / 35 - 399572 * n**6 / 14175,
        4174 * n**5 / 315 - 144838 * n**6 / 6237,
        601676 * n**6 / 22275,
    ])
    return n, e, rect, alpha, beta, delta


_n, _e, _rect, _ALPHA, _BETA, _DELTA = _kruger_coeffs(F_WGS84)
_A = A_WGS84 * _rect  # rectifying radius


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


# --- Snyder closed-form conic / azimuthal projections ---------------------
# Formulas: Snyder, Map Projections — A Working Manual (USGS PP 1395):
# Lambert conformal conic 2SP pp. 104-110, polar stereographic pp. 160-163,
# Albers equal-area conic pp. 98-103.  GRS80 differs from WGS84 only in
# 1/f (298.257222101 vs .257223563) — kept exact per ellipsoid anyway.

F_GRS80 = 1.0 / 298.257222101


def _ecc(f: float) -> float:
    return float(np.sqrt(f * (2.0 - f)))


def _m(phi, e):
    """Snyder (14-15): radius of the parallel / (a·cosφ normalisation)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - (e * s) ** 2)


def _t(phi, e):
    """Snyder (15-9): isometric co-latitude parameter."""
    s = np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)


def _phi_from_t(t, e, iters: int = 15):
    """Invert Snyder (15-9) by fixed point (7-9); converges ~1e-12 rad."""
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(iters):
        s = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (e / 2))
    return phi


def _wrap_lon(lon):
    """Wrap degrees longitude to (-180, 180]."""
    return 180.0 - np.mod(180.0 - np.asarray(lon, dtype=np.float64), 360.0)


def lcc_2sp(lat1: float, lat2: float, lat0: float, lon0: float,
            fe: float, fn: float, a: float = A_WGS84, f: float = F_GRS80):
    """Lambert conformal conic, 2 standard parallels (EPSG method 9802).
    Returns (fwd, inv) with fwd(lon, lat) -> (E, N)."""
    e = _ecc(f)
    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    m1, m2 = _m(p1, e), _m(p2, e)
    t1, t2, t0 = _t(p1, e), _t(p2, e), _t(p0, e)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)) if lat1 != lat2 else np.sin(p1)
    F_ = m1 / (n * t1 ** n)
    rho0 = a * F_ * t0 ** n

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = a * F_ * _t(phi, e) ** n
        th = n * lam
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = rho0 - (np.asarray(N, dtype=np.float64) - fn)
        rho = np.sign(n) * np.hypot(x, y)
        th = np.arctan2(np.sign(n) * x, np.sign(n) * y)
        t = (rho / (a * F_)) ** (1.0 / n)
        return _wrap_lon(np.degrees(th / n) + lon0), np.degrees(_phi_from_t(t, e))

    return fwd, inv


def polar_stereographic(lat_ts: float, lon0: float, fe: float, fn: float,
                        a: float = A_WGS84, f: float = F_WGS84):
    """Polar stereographic variant B (EPSG method 9829): standard parallel
    lat_ts; north aspect when lat_ts > 0, south otherwise."""
    e = _ecc(f)
    south = lat_ts < 0
    pf = np.radians(-lat_ts if south else lat_ts)
    # scale at the standard parallel: rho(ts) = a * m(ts)
    kf = _m(pf, e) / _t(pf, e)

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        if south:
            phi, lam = -phi, -lam
        rho = a * kf * _t(phi, e)
        x, y = rho * np.sin(lam), -rho * np.cos(lam)
        if south:
            x, y = -x, -y
        return fe + x, fn + y

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N, dtype=np.float64) - fn
        if south:
            x, y = -x, -y
        rho = np.hypot(x, y)
        phi = _phi_from_t(rho / (a * kf), e)
        lam = np.arctan2(x, -y)
        if south:
            phi, lam = -phi, -lam
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)

    return fwd, inv


def albers_2sp(lat1: float, lat2: float, lat0: float, lon0: float,
               fe: float, fn: float, a: float = A_WGS84, f: float = F_GRS80):
    """Albers equal-area conic, 2 standard parallels (EPSG method 9822)."""
    e = _ecc(f)
    e2 = e * e

    def q(phi):  # Snyder (3-12)
        s = np.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - np.log((1 - e * s) / (1 + e * s)) / (2 * e))

    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    m1, m2 = _m(p1, e), _m(p2, e)
    q1, q2, q0 = q(p1), q(p2), q(p0)
    n = (m1 * m1 - m2 * m2) / (q2 - q1) if lat1 != lat2 else np.sin(p1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = a * np.sqrt(C - n * q(phi)) / n
        th = n * lam
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = rho0 - (np.asarray(N, dtype=np.float64) - fn)
        rho = np.hypot(x, y)
        qv = (C - (rho * n / a) ** 2) / n
        th = np.arctan2(np.sign(n) * x, np.sign(n) * y)
        # invert q(φ) by Newton (Snyder 3-16)
        beta = np.arcsin(np.clip(qv / q(np.pi / 2), -1.0, 1.0))
        phi = beta.copy()
        for _ in range(10):
            s = np.sin(phi)
            dq = 2.0 * (1 - e2) * np.cos(phi) / (1 - e2 * s * s) ** 2
            phi = phi + (qv - q(phi)) / np.where(dq == 0, 1e-12, dq)
        return _wrap_lon(np.degrees(th / n) + lon0), np.degrees(phi)

    return fwd, inv


def laea(lat0: float, lon0: float, fe: float, fn: float,
         a: float = A_WGS84, f: float = F_GRS80):
    """Lambert azimuthal equal-area, ellipsoidal (EPSG method 9820;
    Snyder pp. 182-190, oblique + polar aspects via authalic latitude)."""
    e = _ecc(f)
    e2 = e * e

    if e == 0.0:  # spherical limit (US National Atlas EPSG:2163/9311)
        def q(phi):
            return 2.0 * np.sin(phi)
    else:
        def q(phi):
            s = np.sin(phi)
            return (1 - e2) * (s / (1 - e2 * s * s)
                               - np.log((1 - e * s) / (1 + e * s))
                               / (2 * e))

    qp = float(q(np.pi / 2))
    Rq = a * np.sqrt(qp / 2.0)
    p0 = np.radians(lat0)
    polar = abs(lat0) >= 89.999

    def beta_of(phi):
        return np.arcsin(np.clip(q(phi) / qp, -1.0, 1.0))

    def phi_of_beta(beta):
        qv = qp * np.sin(beta)
        phi = np.asarray(beta, dtype=np.float64).copy()
        for _ in range(10):
            s = np.sin(phi)
            dq = 2.0 * (1 - e2) * np.cos(phi) / (1 - e2 * s * s) ** 2
            phi = phi + (qv - q(phi)) / np.where(dq == 0, 1e-12, dq)
        return phi

    if polar:
        north = lat0 > 0

        def fwd(lon, lat):
            lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
            phi = np.radians(np.asarray(lat, dtype=np.float64))
            b = beta_of(phi)
            rho = a * np.sqrt(qp - q(phi)) if north else a * np.sqrt(qp + q(phi))
            x = rho * np.sin(lam)
            y = -rho * np.cos(lam) if north else rho * np.cos(lam)
            return fe + x, fn + y

        def inv(E, N):
            x = np.asarray(E, dtype=np.float64) - fe
            y = np.asarray(N, dtype=np.float64) - fn
            rho = np.hypot(x, y)
            qv = qp - (rho / a) ** 2 if north else (rho / a) ** 2 - qp
            beta = np.arcsin(np.clip(qv / qp, -1.0, 1.0))
            lam = np.arctan2(x, -y) if north else np.arctan2(x, y)
            return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi_of_beta(beta))

        return fwd, inv

    b0 = float(beta_of(p0))
    m0 = float(_m(p0, e))
    D = a * m0 / (Rq * np.cos(b0))

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        b = beta_of(phi)
        B = Rq * np.sqrt(2.0 / (1 + np.sin(b0) * np.sin(b)
                                + np.cos(b0) * np.cos(b) * np.cos(lam)))
        x = B * D * np.cos(b) * np.sin(lam)
        y = (B / D) * (np.cos(b0) * np.sin(b) - np.sin(b0) * np.cos(b) * np.cos(lam))
        return fe + x, fn + y

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N, dtype=np.float64) - fn
        rho = np.hypot(x / D, D * y)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * Rq), -1.0, 1.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            beta = np.arcsin(np.clip(
                np.cos(ce) * np.sin(b0)
                + np.where(rho > 0, D * y * np.sin(ce) * np.cos(b0) / rho, 0.0),
                -1.0, 1.0))
            lam = np.arctan2(x * np.sin(ce),
                             D * rho * np.cos(b0) * np.cos(ce)
                             - D * D * y * np.sin(b0) * np.sin(ce))
        lam = np.where(rho > 0, lam, 0.0)
        beta = np.where(rho > 0, beta, b0)
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi_of_beta(beta))

    return fwd, inv


# EPSG parameter table (public EPSG registry values):
#   code: (kind, lat1, lat2, lat0/lat_ts, lon0, FE, FN, f)
_CONIC_EPSG = {
    2154: ("lcc", 49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0, F_GRS80),     # RGF93 / Lambert-93
    3978: ("lcc", 49.0, 77.0, 49.0, -95.0, 0.0, 0.0, F_GRS80),              # NAD83 / Canada Atlas Lambert
    3347: ("lcc", 49.0, 77.0, 63.390675, -91.866667, 6200000.0, 3000000.0, F_GRS80),  # NAD83 / Stats-Canada Lambert
    5070: ("aea", 29.5, 45.5, 23.0, -96.0, 0.0, 0.0, F_GRS80),              # NAD83 / Conus Albers
    3577: ("aea", -18.0, -36.0, 0.0, 132.0, 0.0, 0.0, F_GRS80),             # GDA94 / Australian Albers
    3413: ("pst", None, None, 70.0, -45.0, 0.0, 0.0, F_WGS84),              # WGS84 / NSIDC polar stereo North
    3976: ("pst", None, None, -70.0, 0.0, 0.0, 0.0, F_WGS84),               # WGS84 / NSIDC polar stereo South
    3031: ("pst", None, None, -71.0, 0.0, 0.0, 0.0, F_WGS84),               # WGS84 / Antarctic polar stereo
    3035: ("laea", None, None, 52.0, 10.0, 4321000.0, 3210000.0, F_GRS80),  # ETRS89-extended / LAEA Europe
    3575: ("laea", None, None, 90.0, 10.0, 0.0, 0.0, F_WGS84),              # WGS84 / North Pole LAEA Europe
    3574: ("laea", None, None, 90.0, -40.0, 0.0, 0.0, F_WGS84),             # WGS84 / North Pole LAEA Atlantic
    3395: ("merc", None, None, 0.0, 0.0, 0.0, 0.0, F_WGS84),                # WGS84 / World Mercator (ellipsoidal)
    6933: ("cea", 30.0, None, 0.0, 0.0, 0.0, 0.0, F_WGS84),                 # WGS84 / NSIDC EASE-Grid 2.0 Global
    2193: ("tmerc", 0.9996, None, 0.0, 173.0, 1600000.0, 10000000.0, F_GRS80),  # NZGD2000 / NZTM2000
    54008: ("sinu", None, None, 0.0, 0.0, 0.0, 0.0, F_WGS84),               # ESRI:54008 World Sinusoidal
    54009: ("moll", None, None, 0.0, 0.0, 0.0, 0.0, F_WGS84),               # ESRI:54009 World Mollweide
    54012: ("eck4", None, None, 0.0, 0.0, 0.0, 0.0, 0.0),                   # ESRI:54012 World Eckert IV
    54030: ("robin", None, None, 0.0, 0.0, 0.0, 0.0, 0.0),                  # ESRI:54030 World Robinson
    54042: ("wintri", None, None, 0.0, 0.0, 0.0, 0.0, 0.0),                 # ESRI:54042 World Winkel Tripel
    8857: ("eqearth", None, None, 0.0, 0.0, 0.0, 0.0, 0.0),                 # EPSG:8857 WGS84 / Equal Earth Greenwich
}


def conic_pair(epsg: int):
    """(fwd, inv) lon/lat↔projected for a table-registered conic/azimuthal
    EPSG code; raises KeyError for codes outside the table."""
    kind, lat1, lat2, lat0, lon0, fe, fn, f = _CONIC_EPSG[epsg]
    if kind == "tmerc":
        return tmerc_pair(lat0, lon0, lat1, fe, fn, A_WGS84, f)
    if kind == "lcc":
        return lcc_2sp(lat1, lat2, lat0, lon0, fe, fn, f=f)
    if kind == "aea":
        return albers_2sp(lat1, lat2, lat0, lon0, fe, fn, f=f)
    if kind == "laea":
        return laea(lat0, lon0, fe, fn, f=f)
    if kind == "merc":
        return mercator_1sp(0.0, lon0, 1.0, fe, fn, f=f)
    if kind == "cea":
        return cea(lat1, lon0, fe, fn, f=f)
    if kind == "sinu":
        return sinusoidal(lon0, fe, fn, f=f)
    if kind == "moll":
        return mollweide(lon0, fe, fn)
    if kind == "eck4":
        return eckert4(lon0, fe, fn)
    if kind == "robin":
        return robinson(lon0, fe, fn)
    if kind == "wintri":
        return winkel_tripel(None, lon0, fe, fn)
    if kind == "eqearth":
        return equal_earth(lon0, fe, fn)
    return polar_stereographic(lat0, lon0, fe, fn, f=f)


# --- EPSG registry subset (round 5, VERDICT r4 #7) -------------------------
# The reference resolves EPSG codes through PROJ's proj.db
# (ogr/ogrspatialref.cpp importFromEPSG); no such database exists in this
# sandbox, so this registry is GENERATED from the public EPSG dataset's
# structure: the big zone families by rule (ETRS89/NAD83/NAD27/ED50/WGS72
# UTM, DHDN Gauss-Krüger, GDA MGA — ~270 codes) plus the most-used
# national grids by explicit parameters, every entry resolving into the
# existing closed-form "+proj=" front end (proj_pair), datum shifts via
# +towgs84 Helmert.  Codes outside every table raise loudly
# (NotImplementedError naming the code).

# web-mercator aliases (deprecated EPSG + ESRI codes for EPSG:3857)
_WEBMERC_ALIASES = {3785, 900913, 102100, 102113}


def _build_epsg_registry() -> dict:
    reg = {}
    for z in range(28, 39):   # ETRS89 / UTM 28N-38N (ETRS89 ≡ WGS84 here)
        reg[25800 + z] = f"+proj=utm +zone={z} +ellps=GRS80"
    for z in range(1, 24):    # NAD83 / UTM 1N-23N
        reg[26900 + z] = f"+proj=utm +zone={z} +ellps=GRS80"
    for z in range(1, 23):    # NAD27 / UTM 1N-22N
        reg[26700 + z] = (f"+proj=utm +zone={z} +ellps=clrk66 "
                          "+towgs84=-8,160,176")
    for z in range(28, 39):   # ED50 / UTM 28N-38N
        reg[23000 + z] = (f"+proj=utm +zone={z} +ellps=intl "
                          "+towgs84=-87,-98,-121")
    for z in range(1, 61):    # WGS 72 / UTM north + south
        reg[32200 + z] = f"+proj=utm +zone={z} +ellps=WGS72 +towgs84=0,0,4.5"
        reg[32300 + z] = (f"+proj=utm +zone={z} +south +ellps=WGS72 "
                          "+towgs84=0,0,4.5")
    for z in range(2, 33):    # Pulkovo 1942 / Gauss-Krüger zones 2-32
        reg[28400 + z] = (
            f"+proj=tmerc +lat_0=0 +lon_0={6 * z - 3} +k=1 "
            f"+x_0={z * 1000000 + 500000} +y_0=0 +ellps=krass "
            "+towgs84=23.92,-141.27,-80.9,0,0.35,0.82,-0.12")
    for z in range(13, 24):   # Beijing 1954 / Gauss-Krüger zones 13-23
        reg[21400 + z] = (
            f"+proj=tmerc +lat_0=0 +lon_0={6 * z - 3} +k=1 "
            f"+x_0={z * 1000000 + 500000} +y_0=0 +ellps=krass")
    for z in (2, 3, 4, 5):    # DHDN / 3-degree Gauss-Krüger zones 2-5
        reg[31464 + z] = (
            f"+proj=tmerc +lat_0=0 +lon_0={3 * z} +k=1 "
            f"+x_0={z}500000 +y_0=0 +ellps=bessel "
            "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7")
    for z in range(48, 59):   # GDA94 / MGA zones 48-58
        reg[28300 + z] = f"+proj=utm +zone={z} +south +ellps=GRS80"
    for z in range(46, 60):   # GDA2020 / MGA zones 46-59
        reg[7800 + z] = f"+proj=utm +zone={z} +south +ellps=GRS80"
    for z in range(48, 59):   # AGD84 / AMG zones 48-58
        reg[20300 + z] = (f"+proj=utm +zone={z} +south +ellps=aust_SA "
                          "+towgs84=-134,-48,149")
    reg.update({
        # OSGB36 / British National Grid (towgs84 per EPSG:1314, the
        # same values the reference's autotest WKT carries)
        27700: ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
                "+x_0=400000 +y_0=-100000 +ellps=airy "
                "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,"
                "-20.489"),
        # TM75 / Irish Grid
        29903: ("+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=1.000035 "
                "+x_0=200000 +y_0=250000 +ellps=mod_airy "
                "+towgs84=482.5,-130.6,564.6,-1.042,-0.214,-0.631,8.15"),
        # IRENET95 / Irish Transverse Mercator
        2157: ("+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=0.99982 "
               "+x_0=600000 +y_0=750000 +ellps=GRS80"),
        # SWEREF99 TM
        3006: "+proj=utm +zone=33 +ellps=GRS80",
        # ETRS89 / TM35FIN
        3067: "+proj=utm +zone=35 +ellps=GRS80",
        # ETRS89 / Poland CS92
        2180: ("+proj=tmerc +lat_0=0 +lon_0=19 +k=0.9993 +x_0=500000 "
               "+y_0=-5300000 +ellps=GRS80"),
        # Belge 1972 / Belgian Lambert 72
        31370: ("+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 "
                "+lat_0=90 +lon_0=4.367486666666666 +x_0=150000.013 "
                "+y_0=5400088.438 +ellps=intl "
                "+towgs84=-106.8686,52.2978,-103.7239,0.3366,-0.457,"
                "1.8422,-1.2747"),
        # ETRS89 / Belgian Lambert 2008
        3812: ("+proj=lcc +lat_1=49.83333333333334 "
               "+lat_2=51.16666666666666 +lat_0=50.797815 "
               "+lon_0=4.359215833333333 +x_0=649328 +y_0=665262 "
               "+ellps=GRS80"),
        # Amersfoort / RD New (oblique stereographic on Bessel;
        # towgs84 per EPSG:15934)
        28992: ("+proj=sterea +lat_0=52.15616055555555 "
                "+lon_0=5.38763888888889 +k_0=0.9999079 +x_0=155000 "
                "+y_0=463000 +ellps=bessel "
                "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,"
                "-1.8774,4.0725"),
        # CH1903 / LV03 and CH1903+ / LV95 (Swiss oblique Mercator)
        21781: ("+proj=somerc +lat_0=46.95240555555556 "
                "+lon_0=7.439583333333333 +x_0=600000 +y_0=200000 "
                "+ellps=bessel +towgs84=674.374,15.056,405.346"),
        2056: ("+proj=somerc +lat_0=46.95240555555556 "
               "+lon_0=7.439583333333333 +x_0=2600000 +y_0=1200000 "
               "+ellps=bessel +towgs84=674.374,15.056,405.346"),
        # Palestine 1923 / Palestine Grid (Cassini-Soldner on Clarke
        # 1880 Benoit)
        28191: ("+proj=cass +lat_0=31.73409694444445 "
                "+lon_0=35.21208055555556 +x_0=170251.555 "
                "+y_0=126867.909 +a=6378300.789 +b=6356566.435 "
                "+towgs84=-275.722,94.7824,340.894,-8.001,-4.42,"
                "-11.821,1"),
        # Timbalai 1948 / RSO Borneo (m) — Hotine variant B on
        # Everest 1830 (1967); GN7-2's own worked example
        29873: ("+proj=omerc +lat_0=4 +lonc=115 "
                "+alpha=53.31582047222222 +gamma=53.13010235555556 "
                "+k_0=0.99984 +x_0=590476.87 +y_0=442857.65 "
                "+a=6377298.556 +b=6356097.550300896 "
                "+towgs84=-679,669,-48"),
        # GDM2000 / East Malaysia BRSO (same axes on GRS80)
        3376: ("+proj=omerc +lat_0=4 +lonc=115 "
               "+alpha=53.31582047222222 +gamma=53.13010235555556 "
               "+k_0=0.99984 +x_0=0 +y_0=0 +ellps=GRS80"),
        # NAD83 / Alaska zone 1 (Hotine variant A, +no_uoff)
        26931: ("+proj=omerc +no_uoff +lat_0=57 "
                "+lonc=-133.66666666666666 +alpha=323.13010236111114 "
                "+gamma=323.13010236111114 +k_0=0.9999 +x_0=5000000 "
                "+y_0=-5000000 +ellps=GRS80"),
        # S-JTSK / Krovak East North (EPSG method 9819)
        5514: ("+proj=krovak +lat_0=49.5 "
               "+lon_0=24.833333333333332 +x_0=0 +y_0=0 +ellps=bessel "
               "+towgs84=589,76,480"),
        # NTF (Paris) / Lambert zones I-IV + carto variants (lcc 1sp
        # on Clarke 1880 IGN, Paris prime meridian, EPSG method 9801)
        27561: ("+proj=lcc +lat_1=49.5 +lat_2=49.5 +lat_0=49.5 +lon_0=0 "
                "+k_0=0.999877341 +x_0=600000 +y_0=200000 +a=6378249.2 "
                "+b=6356515 +towgs84=-168,-60,320 +pm=paris"),
        27562: ("+proj=lcc +lat_1=46.8 +lat_2=46.8 +lat_0=46.8 +lon_0=0 "
                "+k_0=0.99987742 +x_0=600000 +y_0=200000 +a=6378249.2 "
                "+b=6356515 +towgs84=-168,-60,320 +pm=paris"),
        27563: ("+proj=lcc +lat_1=44.1 +lat_2=44.1 +lat_0=44.1 +lon_0=0 "
                "+k_0=0.999877499 +x_0=600000 +y_0=200000 +a=6378249.2 "
                "+b=6356515 +towgs84=-168,-60,320 +pm=paris"),
        27564: ("+proj=lcc +lat_1=42.165 +lat_2=42.165 +lat_0=42.165 "
                "+lon_0=0 +k_0=0.99994471 +x_0=234.358 +y_0=185861.369 "
                "+a=6378249.2 +b=6356515 +towgs84=-168,-60,320 "
                "+pm=paris"),
        27572: ("+proj=lcc +lat_1=46.8 +lat_2=46.8 +lat_0=46.8 +lon_0=0 "
                "+k_0=0.99987742 +x_0=600000 +y_0=2200000 +a=6378249.2 "
                "+b=6356515 +towgs84=-168,-60,320 +pm=paris"),
        # NSIDC EASE-Grid 2.0 North / South (laea on WGS84)
        6931: "+proj=laea +lat_0=90 +lon_0=0 +ellps=WGS84",
        6932: "+proj=laea +lat_0=-90 +lon_0=0 +ellps=WGS84",
        # NSIDC sea-ice polar stereographic N/S (Hughes 1980 ellipsoid)
        3411: ("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 "
               "+a=6378273 +b=6356889.449"),
        3412: ("+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 "
               "+a=6378273 +b=6356889.449"),
        # NAD83 / Alaska Albers
        3338: ("+proj=aea +lat_1=55 +lat_2=65 +lat_0=50 +lon_0=-154 "
               "+x_0=0 +y_0=0 +ellps=GRS80"),
        # US National Atlas Equal Area (laea on the authalic sphere)
        2163: ("+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 "
               "+a=6370997 +b=6370997"),
        9311: ("+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 "
               "+a=6370997 +b=6370997"),
        # WGS 84 / Plate Carrée / World Equidistant Cylindrical
        32662: "+proj=eqc +ellps=WGS84",
        4087: "+proj=eqc +ellps=WGS84",
        # geographic 2D CRS on non-WGS84 datums (lon/lat order)
        4258: "+proj=longlat +ellps=GRS80",                    # ETRS89
        4269: "+proj=longlat +ellps=GRS80",                    # NAD83
        4171: "+proj=longlat +ellps=GRS80",                    # RGF93
        4277: ("+proj=longlat +ellps=airy "
               "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,"
               "-20.489"),                                     # OSGB36
        4267: "+proj=longlat +ellps=clrk66 +towgs84=-8,160,176",  # NAD27
        4230: "+proj=longlat +ellps=intl +towgs84=-87,-98,-121",  # ED50
        4322: "+proj=longlat +ellps=WGS72 +towgs84=0,0,4.5",   # WGS 72
    })
    return reg


_EPSG_PROJ = _build_epsg_registry()


def epsg_to_proj(code: int) -> str:
    """Registry lookup: EPSG code -> '+proj=' string; raises
    NotImplementedError (naming the code) outside the registry."""
    if code in _EPSG_PROJ:
        return _EPSG_PROJ[code]
    raise NotImplementedError(
        f"EPSG:{code} is outside the built-in registry (supported: "
        f"4326/3857, WGS84 UTM, {len(_EPSG_PROJ)} registry codes, "
        f"{len(_CONIC_EPSG)} conic table codes)")


def parse_epsg(crs: str) -> int:
    """'EPSG:<code>' (or 'ESRI:<code>' — the 54xxx world projections
    share the numeric keyspace in our table) -> int code."""
    if not crs.upper().startswith(("EPSG:", "ESRI:")):
        raise ValueError(f"expected EPSG:<code>, got {crs!r}")
    return int(crs.split(":", 1)[1])


def transform_fn(src_crs: str, dst_crs: str):
    """f(x, y) -> (x', y') for any pair of {EPSG:4326, EPSG:3857, WGS84 UTM
    zones, table conics, arbitrary '+proj=…' strings, WKT1 strings
    (PROJCS/GEOGCS, via crs_wkt)} — the closed-form subset of
    OGRCreateCoordinateTransformation.  Composes through 4326 for
    projected↔projected pairs."""
    from gdal_ray import tilemath as tm

    if src_crs == dst_crs:
        return lambda x, y: (x, y)

    def to4326(crs):
        if crs.lstrip().startswith(("PROJCS", "GEOGCS")):
            from gdal_ray.crs_wkt import wkt_to_proj

            return proj_pair(wkt_to_proj(crs))[1]
        if crs.lstrip().startswith("+"):
            return proj_pair(crs)[1]
        code = parse_epsg(crs)
        if code == 4326:
            return lambda x, y: (x, y)
        if code == 3857 or code in _WEBMERC_ALIASES:
            return tm.meters_to_lonlat
        if code in _CONIC_EPSG:
            return conic_pair(code)[1]
        if 32601 <= code <= 32660 or 32701 <= code <= 32760:
            return utm_inv(code)
        return proj_pair(epsg_to_proj(code))[1]

    def from4326(crs):
        if crs.lstrip().startswith(("PROJCS", "GEOGCS")):
            from gdal_ray.crs_wkt import wkt_to_proj

            return proj_pair(wkt_to_proj(crs))[0]
        if crs.lstrip().startswith("+"):
            return proj_pair(crs)[0]
        code = parse_epsg(crs)
        if code == 4326:
            return lambda x, y: (x, y)
        if code == 3857 or code in _WEBMERC_ALIASES:
            return lambda lon, lat: tm.lonlat_to_meters(
                lon, np.clip(lat, -tm.MAX_LATITUDE, tm.MAX_LATITUDE)
            )
        if code in _CONIC_EPSG:
            return conic_pair(code)[0]
        if 32601 <= code <= 32660 or 32701 <= code <= 32760:
            return utm_fwd(code)
        return proj_pair(epsg_to_proj(code))[0]

    inv = to4326(src_crs)
    fwd = from4326(dst_crs)

    def f(x, y):
        lon, lat = inv(x, y)
        return fwd(lon, lat)

    return f


# --- PROJ-string front end -------------------------------------------------
# The reference resolves arbitrary CRS through PROJ (ogr/ogrct.cpp:2323);
# here a "+proj=..." string is parsed into the same closed-form kernels
# above, so any CRS expressible in the longlat/merc/webmerc/eqc/tmerc/utm/
# lcc/stere(polar)/aea/laea families — with arbitrary ellipsoid, central
# meridian, standard parallels, scale and false origin — transforms without
# an enumerated EPSG table entry.  Unsupported projections raise loudly.

# PROJ's named prime meridians (degrees east of Greenwich; proj -le pm)
_PRIME_MERIDIANS = {
    "greenwich": 0.0,
    "paris": 2.0 + 20.0 / 60 + 14.025 / 3600,      # 2°20'14.025"
    "lisbon": -(9.0 + 7.0 / 60 + 54.862 / 3600),
    "madrid": -(3.0 + 41.0 / 60 + 14.55 / 3600),
    "rome": 12.0 + 27.0 / 60 + 8.4 / 3600,
    "bern": 7.0 + 26.0 / 60 + 22.5 / 3600,
    "bogota": -(74.0 + 4.0 / 60 + 51.3 / 3600),
    "ferro": -(17.0 + 40.0 / 60),
    "oslo": 10.0 + 43.0 / 60 + 22.5 / 3600,
}

_ELLPS = {
    "WGS84": (A_WGS84, F_WGS84),
    "GRS80": (6378137.0, F_GRS80),
    "intl": (6378388.0, 1.0 / 297.0),          # International 1924
    "clrk66": (6378206.4, 1.0 / 294.978698214),
    "bessel": (6377397.155, 1.0 / 299.1528128),
    "sphere": (6370997.0, 0.0),
    "airy": (6377563.396, 1.0 / 299.3249646),  # Airy 1830 (OSGB36)
    "mod_airy": (6377340.189, 1.0 / 299.3249646),  # Airy Modified (Irish)
    "WGS72": (6378135.0, 1.0 / 298.26),
    "krass": (6378245.0, 1.0 / 298.3),         # Krassowsky 1940
    "aust_SA": (6378160.0, 1.0 / 298.25),      # Australian National
}


def parse_proj_params(s: str) -> dict:
    """'+proj=lcc +lat_1=49 …' -> {key: float|str|True}."""
    out: dict = {}
    for tok in s.split():
        if not tok.startswith("+"):
            raise ValueError(f"bad proj token {tok!r}")
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
        else:
            out[body] = True
    return out


def _proj_ellipsoid(p: dict) -> tuple[float, float]:
    if "a" in p:
        a = float(p["a"])
        if "rf" in p:
            return a, 1.0 / float(p["rf"])
        if "f" in p:
            return a, float(p["f"])
        if "b" in p:
            return a, (a - float(p["b"])) / a
        return a, 0.0  # sphere of radius a
    if "R" in p:
        return float(p["R"]), 0.0
    name = p.get("ellps", p.get("datum", "WGS84"))
    if name not in _ELLPS:
        raise NotImplementedError(f"ellipsoid {name!r} not in table "
                                  f"(give +a/+rf explicitly)")
    return _ELLPS[name]


def tmerc_pair(lat0: float, lon0: float, k0: float, fe: float, fn: float,
               a: float = A_WGS84, f: float = F_WGS84):
    """Generic ellipsoidal transverse Mercator (Krüger 6th order) with
    arbitrary origin/scale/ellipsoid.  Returns (fwd, inv)."""
    n_, e_, rect, alpha, beta, delta = _kruger_coeffs(f)
    A_ = a * rect

    def _xi_eta(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        s = np.sin(phi)
        t = (np.sinh(np.arctanh(s) - e_ * np.arctanh(e_ * s)) if f > 0
             else np.tan(phi))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        xi, eta = xi_p.copy(), eta_p.copy()
        for j in range(6):
            w = 2.0 * (j + 1)
            xi = xi + alpha[j] * np.sin(w * xi_p) * np.cosh(w * eta_p)
            eta = eta + alpha[j] * np.cos(w * xi_p) * np.sinh(w * eta_p)
        return xi, eta

    # meridian-arc offset so northing(lat0) == fn on the central meridian
    m0 = float(_xi_eta(lon0, lat0)[0]) * A_ if lat0 else 0.0

    def fwd(lon, lat):
        xi, eta = _xi_eta(lon, lat)
        return fe + k0 * A_ * eta, fn + k0 * (A_ * xi - m0)

    def inv(E, N):
        xi = (np.asarray(N, dtype=np.float64) - fn + k0 * m0) / (k0 * A_)
        eta = (np.asarray(E, dtype=np.float64) - fe) / (k0 * A_)
        xi_p, eta_p = xi.copy(), eta.copy()
        for j in range(6):
            w = 2.0 * (j + 1)
            xi_p = xi_p - beta[j] * np.sin(w * xi) * np.cosh(w * eta)
            eta_p = eta_p - beta[j] * np.cos(w * xi) * np.sinh(w * eta)
        chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
        phi = chi.copy()
        for j in range(6):
            w = 2.0 * (j + 1)
            phi = phi + delta[j] * np.sin(w * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)

    return fwd, inv


def mercator_1sp(lat_ts: float, lon0: float, k0: float, fe: float, fn: float,
                 a: float = A_WGS84, f: float = F_WGS84):
    """Ellipsoidal Mercator (EPSG 9804/9805; Snyder 7-6..7-8): scale from
    +k_0 or a standard parallel +lat_ts (k0 = m(lat_ts))."""
    e = _ecc(f)
    k = _m(np.radians(lat_ts), e) if lat_ts else k0

    def fwd(lon, lat):
        lam = np.radians(_wrap_lon(np.asarray(lon, dtype=np.float64) - lon0))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        return fe + a * k * lam, fn - a * k * np.log(_t(phi, e))

    def inv(E, N):
        lam = (np.asarray(E, dtype=np.float64) - fe) / (a * k)
        t = np.exp(-(np.asarray(N, dtype=np.float64) - fn) / (a * k))
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(_phi_from_t(t, e))

    return fwd, inv


def eqc(lat_ts: float, lon0: float, fe: float, fn: float,
        a: float = A_WGS84):
    """Equidistant cylindrical / plate carrée (+proj=eqc, EPSG 1028/1029
    spherical form — what PROJ uses for EPSG:4087/32662)."""
    c = np.cos(np.radians(lat_ts))

    def fwd(lon, lat):
        lon = _wrap_lon(np.asarray(lon, dtype=np.float64) - lon0)
        return fe + a * np.radians(lon) * c, fn + a * np.radians(
            np.asarray(lat, dtype=np.float64))

    def inv(E, N):
        lon = np.degrees((np.asarray(E, dtype=np.float64) - fe) / (a * c))
        lat = np.degrees((np.asarray(N, dtype=np.float64) - fn) / a)
        return _wrap_lon(lon + lon0), lat

    return fwd, inv


def oblique_stereographic(lat0: float, lon0: float, k0: float,
                          fe: float, fn: float,
                          a: float = A_WGS84, f: float = F_WGS84):
    """Oblique stereographic, EPSG method 9809 ("double" projection via
    the conformal sphere — the RD New / EPSG:28992 method; +proj=sterea).
    Forward per EPSG Guidance Note 7-2; inverse by vectorized 2×2 Newton
    on the forward (FD Jacobian) seeded with the spherical stereographic
    inverse — valid on the projection's usable hemisphere."""
    e = _ecc(f)
    e2 = e * e
    p0 = np.radians(lat0)
    s0 = np.sin(p0)
    rho0 = a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
    nu0 = a / np.sqrt(1 - e2 * s0 * s0)
    R = np.sqrt(rho0 * nu0)              # conformal sphere radius
    n = np.sqrt(1.0 + e2 * np.cos(p0) ** 4 / (1.0 - e2))
    w1 = (((1 + s0) / (1 - s0)) * ((1 - e * s0) / (1 + e * s0)) ** e) ** n
    sin_chi0 = (w1 - 1) / (w1 + 1)
    c = (n + s0) * (1 - sin_chi0) / ((n - s0) * (1 + sin_chi0))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1) / (w2 + 1))
    sc0, cc0 = np.sin(chi0), np.cos(chi0)

    def _fwd_rad(lam, phi):
        """(n·Δλ on the sphere, geodetic φ) -> (E-FE, N-FN)."""
        s = np.sin(phi)
        w = c * (((1 + s) / (1 - s)) * ((1 - e * s) / (1 + e * s)) ** e) ** n
        chi = np.arcsin((w - 1) / (w + 1))
        B = 1 + np.sin(chi) * sc0 + np.cos(chi) * cc0 * np.cos(lam)
        E = 2 * R * k0 * np.cos(chi) * np.sin(lam) / B
        N = 2 * R * k0 * (np.sin(chi) * cc0 - np.cos(chi) * sc0
                          * np.cos(lam)) / B
        return E, N

    def fwd(lon, lat):
        lam = n * np.radians(
            _wrap_lon(np.asarray(lon, dtype=np.float64) - lon0))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        E, N = _fwd_rad(lam, phi)
        return fe + E, fn + N

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N, dtype=np.float64) - fn
        # spherical seed: invert the stereographic on the conformal sphere
        rho = np.hypot(x, y)
        ce = 2 * np.arctan2(rho, 2 * R * k0)
        sc, cc = np.sin(ce), np.cos(ce)
        safe = np.where(rho == 0, 1.0, rho)
        chi = np.arcsin(np.clip(cc * sc0 + y * sc * cc0 / safe, -1.0, 1.0))
        lam = np.arctan2(x * sc, rho * cc * cc0 - y * sc * sc0)
        lam = np.where(rho == 0, 0.0, lam)
        phi = chi                         # first guess: geodetic ≈ conformal
        h = 1e-8
        for _ in range(10):
            fx, fy = _fwd_rad(lam, phi)
            rx, ry = fx - x, fy - y
            dxl, dyl = _fwd_rad(lam + h, phi)
            dxp, dyp = _fwd_rad(lam, phi + h)
            j11, j21 = (dxl - fx) / h, (dyl - fy) / h
            j12, j22 = (dxp - fx) / h, (dyp - fy) / h
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-12, 1e-12, det)
            lam = lam - (j22 * rx - j12 * ry) / det
            phi = phi - (-j21 * rx + j11 * ry) / det
        return _wrap_lon(np.degrees(lam / n) + lon0), np.degrees(phi)

    return fwd, inv


def _merid_arc_fns(a: float, e2: float):
    """Meridian arc distance M(φ) and its inverse (Snyder 3-21 / 3-26,
    public series).  Returns (M, M_inv) over radians/metres."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    c0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    c4 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    c6 = 35.0 * e6 / 3072.0
    sq = np.sqrt(1.0 - e2)
    e1 = (1.0 - sq) / (1.0 + sq)
    d2 = 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0
    d4 = 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0
    d6 = 151.0 * e1 ** 3 / 96.0
    d8 = 1097.0 * e1 ** 4 / 512.0

    def M(phi):
        return a * (c0 * phi - c2 * np.sin(2 * phi) + c4 * np.sin(4 * phi)
                    - c6 * np.sin(6 * phi))

    def M_inv(dist):
        dist = np.asarray(dist, dtype=np.float64)
        mu = dist / (a * c0)
        phi = (mu + d2 * np.sin(2 * mu) + d4 * np.sin(4 * mu)
               + d6 * np.sin(6 * mu) + d8 * np.sin(8 * mu))
        for _ in range(3):  # Newton on the exact forward (dM/dφ = ρ)
            s2 = np.sin(phi) ** 2
            rho = a * (1.0 - e2) / (1.0 - e2 * s2) ** 1.5
            phi = phi + (dist - M(phi)) / rho
        return phi

    return M, M_inv


def _q_authalic(phi, e):
    """Snyder (3-12): q such that authalic latitude β = arcsin(q/q_p)."""
    e2 = e * e
    s = np.sin(phi)
    return (1 - e2) * (s / (1 - e2 * s * s)
                       - np.log((1 - e * s) / (1 + e * s)) / (2 * e))


def _phi_from_q(qv, e, iters: int = 10):
    """Invert q(φ) by Newton (Snyder 3-16)."""
    e2 = e * e
    phi = np.arcsin(np.clip(np.asarray(qv, dtype=np.float64) / 2.0, -1., 1.))
    for _ in range(iters):
        s = np.sin(phi)
        dq = 2.0 * (1 - e2) * np.cos(phi) / (1 - e2 * s * s) ** 2
        phi = phi + (qv - _q_authalic(phi, e)) / np.where(dq == 0, 1e-12, dq)
    return phi


def sinusoidal(lon0: float, fe: float, fn: float,
               a: float = A_WGS84, f: float = F_WGS84):
    """Sinusoidal, ellipsoidal (+proj=sinu, ESRI:54008; Snyder 30-8/30-9):
    equal-area pseudocylindrical — x = aλcosφ/√(1-e²sin²φ), y = meridian
    arc M(φ) — the MODIS grid projection."""
    e2 = f * (2.0 - f)
    M, M_inv = _merid_arc_fns(a, e2)

    def fwd(lon, lat):
        lam = np.radians(_wrap_lon(np.asarray(lon, dtype=np.float64) - lon0))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        s = np.sin(phi)
        return (fe + a * lam * np.cos(phi) / np.sqrt(1.0 - e2 * s * s),
                fn + M(phi))

    def inv(E, N):
        phi = M_inv(np.asarray(N, dtype=np.float64) - fn)
        s = np.sin(phi)
        cos = np.cos(phi)
        lam = np.where(
            np.abs(cos) < 1e-12, 0.0,
            (np.asarray(E, dtype=np.float64) - fe)
            * np.sqrt(1.0 - e2 * s * s) / (a * np.where(cos == 0, 1, cos)))
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)

    return fwd, inv


def mollweide(lon0: float, fe: float, fn: float, R: float = A_WGS84):
    """Mollweide, spherical (+proj=moll, ESRI:54009; Snyder 31-1..31-7):
    equal-area pseudocylindrical on the sphere of radius R = semi-major
    axis (PROJ's moll likewise applies the spherical formulas)."""
    rt2 = np.sqrt(2.0)

    def fwd(lon, lat):
        lam = np.radians(_wrap_lon(np.asarray(lon, dtype=np.float64) - lon0))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rhs = np.pi * np.sin(phi)
        th = phi.copy()        # Newton on 2θ + sin2θ = π sinφ
        for _ in range(12):
            th = th - (2 * th + np.sin(2 * th) - rhs) / (2 + 2 * np.cos(2 * th)
                                                         + 1e-15)
        return (fe + (2.0 * rt2 / np.pi) * R * lam * np.cos(th),
                fn + rt2 * R * np.sin(th))

    def inv(E, N):
        th = np.arcsin(np.clip(
            (np.asarray(N, dtype=np.float64) - fn) / (rt2 * R), -1.0, 1.0))
        phi = np.arcsin(np.clip((2 * th + np.sin(2 * th)) / np.pi, -1.0, 1.0))
        cos = np.cos(th)
        lam = np.where(
            np.abs(cos) < 1e-12, 0.0,
            np.pi * (np.asarray(E, dtype=np.float64) - fe)
            / (2.0 * rt2 * R * np.where(cos == 0, 1, cos)))
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)

    return fwd, inv


def cea(lat_ts: float, lon0: float, fe: float, fn: float,
        a: float = A_WGS84, f: float = F_WGS84):
    """Lambert cylindrical equal area, ellipsoidal (EPSG method 9835;
    Snyder 10-13..10-17) — EPSG:6933 NSIDC EASE-Grid 2.0 Global is this
    with lat_ts=30."""
    e = _ecc(f)
    k0 = _m(np.radians(lat_ts), e)

    def fwd(lon, lat):
        lam = np.radians(_wrap_lon(np.asarray(lon, dtype=np.float64) - lon0))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        return fe + a * k0 * lam, fn + a * _q_authalic(phi, e) / (2.0 * k0)

    def inv(E, N):
        qv = 2.0 * k0 * (np.asarray(N, dtype=np.float64) - fn) / a
        phi = _phi_from_q(qv, e)
        lam = (np.asarray(E, dtype=np.float64) - fe) / (a * k0)
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)

    return fwd, inv


def orthographic(lat0: float, lon0: float, fe: float, fn: float,
                 a: float = A_WGS84, f: float = F_WGS84):
    """Orthographic, ellipsoidal (EPSG method 9840).  Forward per the EPSG
    closed form; inverse by vectorized 2×2 Newton on the forward (FD
    Jacobian), seeded with the spherical inverse — valid on the visible
    hemisphere."""
    e2 = f * (2.0 - f)
    p0 = np.radians(lat0)
    nu0 = a / np.sqrt(1.0 - e2 * np.sin(p0) ** 2)
    sp0, cp0 = np.sin(p0), np.cos(p0)

    def _fwd_rad(lam, phi):
        s = np.sin(phi)
        nu = a / np.sqrt(1.0 - e2 * s * s)
        E = nu * np.cos(phi) * np.sin(lam)
        N = nu * (s * cp0 - np.cos(phi) * sp0 * np.cos(lam)) \
            + e2 * (nu0 * sp0 - nu * s) * cp0
        return E, N

    def fwd(lon, lat):
        lam = np.radians(_wrap_lon(np.asarray(lon, dtype=np.float64) - lon0))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        E, N = _fwd_rad(lam, phi)
        return fe + E, fn + N

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N, dtype=np.float64) - fn
        # spherical seed (Snyder 20-14..20-15)
        rho = np.hypot(x, y)
        c = np.arcsin(np.clip(rho / a, -1.0, 1.0))
        sc, cc = np.sin(c), np.cos(c)
        safe = np.where(rho == 0, 1.0, rho)
        phi = np.arcsin(np.clip(cc * sp0 + y * sc * cp0 / safe, -1.0, 1.0))
        lam = np.arctan2(x * sc, rho * cc * cp0 - y * sc * sp0)
        lam = np.where(rho == 0, 0.0, lam)
        h = 1e-7
        for _ in range(8):
            fx, fy = _fwd_rad(lam, phi)
            rx, ry = fx - x, fy - y
            dxl, dyl = _fwd_rad(lam + h, phi)
            dxp, dyp = _fwd_rad(lam, phi + h)
            j11, j21 = (dxl - fx) / h, (dyl - fy) / h
            j12, j22 = (dxp - fx) / h, (dyp - fy) / h
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-12, 1e-12, det)
            lam = lam - (j22 * rx - j12 * ry) / det
            phi = phi - (-j21 * rx + j11 * ry) / det
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)

    return fwd, inv


def eckert4(lon0: float, fe: float, fn: float, R: float = A_WGS84):
    """Eckert IV, spherical (Snyder ch. 32, eqs 32-1..32-8; +proj=eck4,
    ESRI:54012): equal-area pseudocylindrical world map with elliptical
    meridians — the Jacobian pin |∂(x,y)/∂(λ,φ)| = R²cosφ validates the
    constants independently of any worked example."""
    lam0 = np.radians(lon0)
    CX = 2.0 / np.sqrt(np.pi * (4.0 + np.pi))
    CY = 2.0 * np.sqrt(np.pi / (4.0 + np.pi))
    CT = 2.0 + np.pi / 2.0

    def _theta(phi):
        t = phi / 2.0
        rhs = CT * np.sin(phi)
        for _ in range(30):  # Newton on θ + sinθcosθ + 2sinθ = (2+π/2)sinφ
            f = t + np.sin(t) * np.cos(t) + 2.0 * np.sin(t) - rhs
            df = 1.0 + np.cos(2.0 * t) + 2.0 * np.cos(t)
            t = t - f / np.where(np.abs(df) < 1e-12, 1e-12, df)
        return t

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
        th = _theta(phi)
        x = CX * R * lam * (1.0 + np.cos(th))
        y = CY * R * np.sin(th)
        return fe + x, fn + y

    def inv(E, N):
        y = (np.asarray(N, dtype=np.float64) - fn) / (CY * R)
        th = np.arcsin(np.clip(y, -1.0, 1.0))
        sphi = (th + np.sin(th) * np.cos(th) + 2.0 * np.sin(th)) / CT
        phi = np.arcsin(np.clip(sphi, -1.0, 1.0))
        x = np.asarray(E, dtype=np.float64) - fe
        lam = lam0 + x / (CX * R * (1.0 + np.cos(th)))
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    return fwd, inv


def oblique_stereographic(lat0: float, lon0: float, k0: float, fe: float,
                          fn: float, *, a: float = A_WGS84,
                          f: float = F_WGS84):
    """Oblique ("double") Stereographic, EPSG method 9809 — the
    conformal-sphere construction of EPSG Guidance Note 7-2 §3.2.5
    (the reference reaches it through PROJ +proj=sterea; RD New /
    Amersfoort EPSG:28992 is the flagship user).  Worked-example-pinned
    in tests (GN7-2: 53°N 6°E -> 196105.283, 557057.739)."""
    e = _ecc(f)
    phi0 = np.radians(lat0)
    lam0 = np.radians(lon0)
    e2 = e * e
    rho0 = a * (1 - e2) / (1 - e2 * np.sin(phi0) ** 2) ** 1.5
    nu0 = a / np.sqrt(1 - e2 * np.sin(phi0) ** 2)
    R = np.sqrt(rho0 * nu0)
    n = np.sqrt(1 + e2 * np.cos(phi0) ** 4 / (1 - e2))
    S1 = (1 + np.sin(phi0)) / (1 - np.sin(phi0))
    S2 = (1 - e * np.sin(phi0)) / (1 + e * np.sin(phi0))
    w1 = (S1 * S2 ** e) ** n
    sin_chi0 = (w1 - 1) / (w1 + 1)
    c = ((n + np.sin(phi0)) * (1 - sin_chi0)) / (
        (n - np.sin(phi0)) * (1 + sin_chi0))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1) / (w2 + 1))
    lam0_c = lam0

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        Lam = n * (lam - lam0_c) + lam0_c
        Sa = (1 + np.sin(phi)) / (1 - np.sin(phi))
        Sb = (1 - e * np.sin(phi)) / (1 + e * np.sin(phi))
        w = c * (Sa * Sb ** e) ** n
        chi = np.arcsin((w - 1) / (w + 1))
        B = 1 + np.sin(chi) * np.sin(chi0) + np.cos(chi) * np.cos(chi0) \
            * np.cos(Lam - lam0_c)
        E = fe + 2 * R * k0 * np.cos(chi) * np.sin(Lam - lam0_c) / B
        N = fn + 2 * R * k0 * (np.sin(chi) * np.cos(chi0)
                               - np.cos(chi) * np.sin(chi0)
                               * np.cos(Lam - lam0_c)) / B
        return E, N

    def inv(E, N):
        Ep = np.asarray(E, dtype=np.float64) - fe
        Np = np.asarray(N, dtype=np.float64) - fn
        g = 2 * R * k0 * np.tan(np.pi / 4 - chi0 / 2)
        h = 4 * R * k0 * np.tan(chi0) + g
        i = np.arctan2(Ep, h + Np)
        j = np.arctan2(Ep, g - Np) - i
        chi = chi0 + 2 * np.arctan((Np - Ep * np.tan(j / 2))
                                   / (2 * R * k0))
        Lam = j + 2 * i + lam0_c
        lam = (Lam - lam0_c) / n + lam0_c
        psi = 0.5 * np.log((1 + np.sin(chi))
                           / (c * (1 - np.sin(chi)))) / n
        phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
        for _ in range(8):
            psi_i = np.log(np.tan(phi / 2 + np.pi / 4)
                           * ((1 - e * np.sin(phi))
                              / (1 + e * np.sin(phi))) ** (e / 2))
            phi = phi - (psi_i - psi) * np.cos(phi) \
                * (1 - e2 * np.sin(phi) ** 2) / (1 - e2)
        return np.degrees(lam), np.degrees(phi)

    return fwd, inv


def swiss_oblique_mercator(lat0: float, lon0: float, fe: float, fn: float,
                           *, a: float = 6377397.155,
                           f: float = 1.0 / 299.1528128):
    """Swiss Oblique Mercator (PROJ +proj=somerc; swisstopo's published
    "Formulas and constants for the calculation of the Swiss conformal
    cylindrical projection" — rigorous formulas, not the series):
    ellipsoid -> conformal sphere -> pseudo-equator rotation ->
    Mercator.  CH1903/LV03 (EPSG:21781) and CH1903+/LV95 (EPSG:2056)."""
    e = _ecc(f)
    e2 = e * e
    phi0 = np.radians(lat0)
    lam0 = np.radians(lon0)
    R = a * np.sqrt(1 - e2) / (1 - e2 * np.sin(phi0) ** 2)
    alpha = np.sqrt(1 + e2 / (1 - e2) * np.cos(phi0) ** 4)
    b0 = np.arcsin(np.sin(phi0) / alpha)
    K = np.log(np.tan(np.pi / 4 + b0 / 2)) \
        - alpha * np.log(np.tan(np.pi / 4 + phi0 / 2)) \
        + alpha * e / 2 * np.log((1 + e * np.sin(phi0))
                                 / (1 - e * np.sin(phi0)))

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        S = alpha * np.log(np.tan(np.pi / 4 + phi / 2)) \
            - alpha * e / 2 * np.log((1 + e * np.sin(phi))
                                     / (1 - e * np.sin(phi))) + K
        b = 2 * (np.arctan(np.exp(S)) - np.pi / 4)
        lbar = alpha * (lam - lam0)
        bb = np.arcsin(np.cos(b0) * np.sin(b)
                       - np.sin(b0) * np.cos(b) * np.cos(lbar))
        ll = np.arctan2(np.sin(lbar) * np.cos(b),
                        np.cos(b0) * np.cos(lbar) * np.cos(b)
                        + np.sin(b0) * np.sin(b))
        E = fe + R * ll
        N = fn + R / 2 * np.log((1 + np.sin(bb)) / (1 - np.sin(bb)))
        return E, N

    def inv(E, N):
        Y = (np.asarray(E, dtype=np.float64) - fe) / R
        X = (np.asarray(N, dtype=np.float64) - fn) / R
        bb = 2 * (np.arctan(np.exp(X)) - np.pi / 4)
        b = np.arcsin(np.cos(b0) * np.sin(bb)
                      + np.sin(b0) * np.cos(bb) * np.cos(Y))
        ll = np.arctan2(np.sin(Y) * np.cos(bb),
                        np.cos(b0) * np.cos(Y) * np.cos(bb)
                        - np.sin(b0) * np.sin(bb))
        lam = lam0 + ll / alpha
        phi = b.copy()
        for _ in range(8):
            S = (np.log(np.tan(np.pi / 4 + b / 2)) - K) / alpha \
                + e * np.log(np.tan(np.pi / 4
                                    + np.arcsin(e * np.sin(phi)) / 2))
            phi = 2 * np.arctan(np.exp(S)) - np.pi / 2
        return np.degrees(lam), np.degrees(phi)

    return fwd, inv


def cassini_soldner(lat0: float, lon0: float, fe: float, fn: float, *,
                    a: float = A_WGS84, f: float = F_WGS84):
    """Cassini-Soldner (EPSG method 9806; Snyder/GN7-2 series) — the
    historic national grids (Trinidad, Palestine, old German soldner).
    Pinned in tests to the GN7-2 Trinidad 1903 worked example
    (10°N 62°W -> 66644.94, 82536.22 Clarke's links, to the cm)."""
    import math

    e2 = f * (2 - f)

    def M(phi):
        return a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 ** 3 / 256)
                    * phi
                    - (3 * e2 / 8 + 3 * e2 * e2 / 32
                       + 45 * e2 ** 3 / 1024) * np.sin(2 * phi)
                    + (15 * e2 * e2 / 256 + 45 * e2 ** 3 / 1024)
                    * np.sin(4 * phi)
                    - (35 * e2 ** 3 / 3072) * np.sin(6 * phi))

    phi0 = math.radians(lat0)
    lam0 = math.radians(lon0)
    M0 = float(M(phi0))

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        A_ = (lam - lam0) * np.cos(phi)
        T = np.tan(phi) ** 2
        C = e2 * np.cos(phi) ** 2 / (1 - e2)
        nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        E = fe + nu * (A_ - T * A_ ** 3 / 6
                       - (8 - T + 8 * C) * T * A_ ** 5 / 120)
        N = fn + M(phi) - M0 + nu * np.tan(phi) * (
            A_ ** 2 / 2 + (5 - T + 6 * C) * A_ ** 4 / 24)
        return E, N

    def inv(E, N):
        E = np.asarray(E, dtype=np.float64)
        N = np.asarray(N, dtype=np.float64)
        M1 = M0 + (N - fn)
        mu1 = M1 / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64
                         - 5 * e2 ** 3 / 256))
        e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
        phi1 = (mu1 + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu1)
                + (21 * e1 * e1 / 16 - 55 * e1 ** 4 / 32)
                * np.sin(4 * mu1)
                + (151 * e1 ** 3 / 96) * np.sin(6 * mu1)
                + (1097 * e1 ** 4 / 512) * np.sin(8 * mu1))
        nu1 = a / np.sqrt(1 - e2 * np.sin(phi1) ** 2)
        rho1 = a * (1 - e2) / (1 - e2 * np.sin(phi1) ** 2) ** 1.5
        T1 = np.tan(phi1) ** 2
        D = (E - fe) / nu1
        phi = phi1 - (nu1 * np.tan(phi1) / rho1) * (
            D * D / 2 - (1 + 3 * T1) * D ** 4 / 24)
        lam = lam0 + (D - T1 * D ** 3 / 3
                      + (1 + 3 * T1) * T1 * D ** 5 / 15) / np.cos(phi1)
        return np.degrees(lam), np.degrees(phi)

    return fwd, inv


def hotine_oblique_mercator(lat_c: float, lon_c: float, alpha_c: float,
                            gamma_c: float, k_c: float, fe: float,
                            fn: float, *, variant_b: bool = True,
                            a: float = A_WGS84, f: float = F_WGS84):
    """Hotine Oblique Mercator (EPSG methods 9812 variant A /
    9815 variant B; PROJ +proj=omerc).  Formulas from EPSG Guidance
    Note 7-2 §3.2.6; pinned in tests to the GN7-2 Timbalai 1948 / RSO
    Borneo worked example (E 679245.73, N 596562.78 to the cm).
    ``variant_b``: false easting/northing at the projection CENTRE
    (uC offset applied); variant A (+no_uoff) references the natural
    origin instead."""
    import math

    e = _ecc(f)
    e2 = e * e
    phiC = np.radians(lat_c)
    lamC = np.radians(lon_c)
    aC = np.radians(alpha_c)
    gC = np.radians(gamma_c)
    sphi = 1.0 if lat_c >= 0 else -1.0
    B_ = math.sqrt(1 + e2 * math.cos(phiC) ** 4 / (1 - e2))
    A_ = a * B_ * k_c * math.sqrt(1 - e2) / (1 - e2 * math.sin(phiC) ** 2)
    t0 = math.tan(math.pi / 4 - phiC / 2) / (
        (1 - e * math.sin(phiC)) / (1 + e * math.sin(phiC))) ** (e / 2)
    D_ = B_ * math.sqrt(1 - e2) / (
        math.cos(phiC) * math.sqrt(1 - e2 * math.sin(phiC) ** 2))
    D2 = max(D_ * D_, 1.0)
    F_ = D_ + math.sqrt(D2 - 1.0) * sphi
    H_ = F_ * t0 ** B_
    G_ = (F_ - 1.0 / F_) / 2.0
    g0 = math.asin(math.sin(aC) / D_)
    lam0 = lamC - math.asin(G_ * math.tan(g0)) / B_
    uC = (A_ / B_) * math.atan2(math.sqrt(D2 - 1.0), math.cos(aC)) * sphi
    u_off = abs(uC) * sphi if variant_b else 0.0

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        t = np.tan(np.pi / 4 - phi / 2) / (
            (1 - e * np.sin(phi)) / (1 + e * np.sin(phi))) ** (e / 2)
        Q = H_ / t ** B_
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        V = np.sin(B_ * (lam - lam0))
        U = (-V * np.cos(g0) + S * np.sin(g0)) / T
        v = A_ * np.log((1 - U) / (1 + U)) / (2 * B_)
        u = A_ * np.arctan2(S * np.cos(g0) + V * np.sin(g0),
                            np.cos(B_ * (lam - lam0))) / B_ - u_off
        E = v * np.cos(gC) + u * np.sin(gC) + fe
        N = u * np.cos(gC) - v * np.sin(gC) + fn
        return E, N

    def inv(E, N):
        Ep = np.asarray(E, dtype=np.float64) - fe
        Np = np.asarray(N, dtype=np.float64) - fn
        v = Ep * np.cos(gC) - Np * np.sin(gC)
        u = Np * np.cos(gC) + Ep * np.sin(gC) + u_off
        Q = np.exp(-B_ * v / A_)
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        V = np.sin(B_ * u / A_)
        U = (V * np.cos(g0) + S * np.sin(g0)) / T
        t = (H_ / np.sqrt((1 + U) / (1 - U))) ** (1.0 / B_)
        chi = np.pi / 2 - 2 * np.arctan(t)
        phi = chi
        for _ in range(8):
            phi = np.pi / 2 - 2 * np.arctan(
                t * ((1 - e * np.sin(phi))
                     / (1 + e * np.sin(phi))) ** (e / 2))
        lam = lam0 - np.arctan2(S * np.cos(g0) - V * np.sin(g0),
                                np.cos(B_ * u / A_)) / B_
        return np.degrees(lam), np.degrees(phi)

    return fwd, inv


def krovak(*, lat_c: float = 49.5, lon0: float = 24.0 + 50.0 / 60.0,
           alpha_c: float = 30.0 + 17.0 / 60.0 + 17.3031 / 3600.0,
           lat_p: float = 78.5, k_p: float = 0.9999,
           fe: float = 0.0, fn: float = 0.0, east_north: bool = True,
           a: float = 6377397.155, f: float = 1.0 / 299.15281):
    """Krovak oblique conformal conic (EPSG method 9819; S-JTSK,
    Czech/Slovak national grid).  Formulas and the worked example from
    EPSG Guidance Note 7-2 §3.2.9 (50°12'32.4416"N 16°50'59.1790"E ->
    Southing 1050538.643, Westing 568991.204); ``east_north=True``
    negates into the EPSG:5514 East/North convention."""
    e = _ecc(f)
    e2 = e * e
    phiC = np.radians(lat_c)
    lam0 = np.radians(lon0)
    aC = np.radians(alpha_c)
    phiP = np.radians(lat_p)
    A_ = a * np.sqrt(1 - e2) / (1 - e2 * np.sin(phiC) ** 2)
    B_ = np.sqrt(1 + e2 * np.cos(phiC) ** 4 / (1 - e2))
    g0 = np.arcsin(np.sin(phiC) / B_)
    t0 = np.tan(np.pi / 4 + g0 / 2) \
        * ((1 + e * np.sin(phiC)) / (1 - e * np.sin(phiC))) ** (e * B_ / 2) \
        / np.tan(np.pi / 4 + phiC / 2) ** B_
    n_ = np.sin(phiP)
    r0 = k_p * A_ / np.tan(phiP)

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        U = 2 * (np.arctan(
            t0 * np.tan(phi / 2 + np.pi / 4) ** B_
            * ((1 - e * np.sin(phi)) / (1 + e * np.sin(phi)))
            ** (e * B_ / 2)) - np.pi / 4)
        V = B_ * (lam0 - lam)
        T = np.arcsin(np.cos(aC) * np.sin(U)
                      + np.sin(aC) * np.cos(U) * np.cos(V))
        D = np.arcsin(np.cos(U) * np.sin(V) / np.cos(T))
        theta = n_ * D
        r = r0 * np.tan(np.pi / 4 + phiP / 2) ** n_ \
            / np.tan(T / 2 + np.pi / 4) ** n_
        X = r * np.cos(theta) + fn   # Southing
        Y = r * np.sin(theta) + fe   # Westing
        if east_north:
            return -Y, -X
        return Y, X

    def inv(E, N):
        if east_north:
            Y = -np.asarray(E, dtype=np.float64) - fe
            X = -np.asarray(N, dtype=np.float64) - fn
        else:
            Y = np.asarray(E, dtype=np.float64) - fe
            X = np.asarray(N, dtype=np.float64) - fn
        r = np.hypot(X, Y)
        theta = np.arctan2(Y, X)
        D = theta / np.sin(phiP)
        T = 2 * (np.arctan((r0 / r) ** (1.0 / n_)
                           * np.tan(np.pi / 4 + phiP / 2)) - np.pi / 4)
        U = np.arcsin(np.cos(aC) * np.sin(T)
                      - np.sin(aC) * np.cos(T) * np.cos(D))
        V = np.arcsin(np.cos(T) * np.sin(D) / np.cos(U))
        lam = lam0 - V / B_
        phi = U.copy()
        for _ in range(8):
            phi = 2 * (np.arctan(
                t0 ** (-1.0 / B_)
                * np.tan(U / 2 + np.pi / 4) ** (1.0 / B_)
                * ((1 + e * np.sin(phi)) / (1 - e * np.sin(phi)))
                ** (e / 2)) - np.pi / 4)
        return np.degrees(lam), np.degrees(phi)

    return fwd, inv


def winkel_tripel(lat1: float | None, lon0: float, fe: float, fn: float,
                  R: float = A_WGS84):
    """Winkel Tripel, spherical (+proj=wintri, ESRI:54042): arithmetic mean
    of the equirectangular projection at standard parallel lat_1 and the
    Aitoff projection (public formulas — Snyder, "Flattening the Earth"
    ch. on modified azimuthals; the NGS/PROJ parameterization).  Winkel's
    own standard parallel acos(2/pi) ~= 50deg28' is the default, as in
    PROJ.  Inverse by vectorized 2x2 Newton with numeric Jacobian (no
    closed form exists).

    Closed anchors used by the tests, derived from the formulas:
      lam = 0  ->  x = 0,                    y = R*phi
      phi = 0  ->  x = R*lam*(1+cos phi1)/2, y = 0
    """
    cosphi1 = 2.0 / np.pi if lat1 is None else np.cos(np.radians(lat1))
    lam0 = np.radians(lon0)

    def _fwd_rad(lam, phi):
        cp = np.cos(phi)
        alpha = np.arccos(np.clip(cp * np.cos(lam / 2.0), -1.0, 1.0))
        sinc = np.where(alpha < 1e-12, 1.0, np.sin(alpha) / np.where(alpha == 0, 1.0, alpha))
        x = 0.5 * (lam * cosphi1 + 2.0 * cp * np.sin(lam / 2.0) / sinc)
        y = 0.5 * (phi + np.sin(phi) / sinc)
        return x, y

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
        lam = np.radians(_wrap_lon(np.degrees(lam)))
        x, y = _fwd_rad(lam, phi)
        return fe + R * x, fn + R * y

    def inv(E, N):
        x = (np.asarray(E, dtype=np.float64) - fe) / R
        y = (np.asarray(N, dtype=np.float64) - fn) / R
        phi = np.clip(y, -np.pi / 2.0, np.pi / 2.0)
        lam = np.clip(2.0 * x / (cosphi1 + np.cos(phi)), -np.pi, np.pi)
        h = 1e-7
        for _ in range(15):
            fx, fy = _fwd_rad(lam, phi)
            rx, ry = fx - x, fy - y
            dxl, dyl = _fwd_rad(lam + h, phi)
            dxp, dyp = _fwd_rad(lam, phi + h)
            j11, j21 = (dxl - fx) / h, (dyl - fy) / h
            j12, j22 = (dxp - fx) / h, (dyp - fy) / h
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-14, 1e-14, det)
            lam = lam - (j22 * rx - j12 * ry) / det
            phi = np.clip(phi - (-j21 * rx + j11 * ry) / det,
                          -np.pi / 2.0, np.pi / 2.0)
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)

    return fwd, inv


# Robinson (1974) lookup table, 5-degree latitude steps 0..90 — published in
# Robinson, "A New Map Projection" (1974) and reproduced in Snyder,
# "Flattening the Earth" (public data, not code):
#   x = 0.8487 * R * X(|phi|) * lam ;  y = 1.3523 * R * Y(|phi|) * sign(phi)
_ROBINSON_X = np.array([
    1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427, 0.9216,
    0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732, 0.6213, 0.5722,
    0.5322])
_ROBINSON_Y = np.array([
    0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340, 0.4958,
    0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936, 0.9394, 0.9761,
    1.0000])
_ROBINSON_FXC, _ROBINSON_FYC = 0.8487, 1.3523


def _natural_cubic_m(yk: np.ndarray, hstep: float) -> np.ndarray:
    """Second derivatives of the natural cubic spline through equally
    spaced knots (classic tridiagonal system, Thomas solve)."""
    n = len(yk)
    m = np.zeros(n)
    if n < 3:
        return m
    # interior equations: m[i-1] + 4 m[i] + m[i+1] = 6 (y[i-1]-2y[i]+y[i+1])/h^2
    rhs = 6.0 * (yk[:-2] - 2.0 * yk[1:-1] + yk[2:]) / (hstep * hstep)
    k = n - 2
    diag = np.full(k, 4.0)
    # forward elimination (sub/super diagonals are 1)
    for i in range(1, k):
        w = 1.0 / diag[i - 1]
        diag[i] -= w
        rhs[i] -= w * rhs[i - 1]
    sol = np.zeros(k)
    sol[-1] = rhs[-1] / diag[-1]
    for i in range(k - 2, -1, -1):
        sol[i] = (rhs[i] - sol[i + 1]) / diag[i]
    m[1:-1] = sol
    return m


def _spline_eval(yk, m, hstep, s):
    """Evaluate the natural cubic spline (knots 0, h, 2h, …) and its
    derivative at s (vectorized)."""
    n = len(yk)
    idx = np.clip((s // hstep).astype(np.int64), 0, n - 2)
    t = s - idx * hstep
    y0, y1 = yk[idx], yk[idx + 1]
    m0, m1 = m[idx], m[idx + 1]
    h = hstep
    val = (m0 * (h - t) ** 3 + m1 * t ** 3) / (6.0 * h) \
        + (y0 / h - m0 * h / 6.0) * (h - t) + (y1 / h - m1 * h / 6.0) * t
    der = (-m0 * (h - t) ** 2 + m1 * t ** 2) / (2.0 * h) \
        - (y0 / h - m0 * h / 6.0) + (y1 / h - m1 * h / 6.0)
    return val, der


_ROBINSON_MX = _natural_cubic_m(_ROBINSON_X, 5.0)
_ROBINSON_MY = _natural_cubic_m(_ROBINSON_Y, 5.0)


def robinson(lon0: float, fe: float, fn: float, R: float = A_WGS84):
    """Robinson, spherical (+proj=robin, ESRI:54030): pseudocylindrical
    compromise world projection defined by Robinson's published 5-degree
    X/Y table (1974), interpolated here with a natural cubic spline (the
    reference delegates to PROJ, which uses its own per-segment quintics —
    both reproduce the published knots exactly; between knots the curves
    are interpolation choices, and our tests pin the knots + round trip).
    Inverse: Newton on the monotone Y spline for |phi|, then divide out
    X(|phi|) for lambda."""
    lam0 = np.radians(lon0)

    def _xy_of(absphi_deg):
        X, _ = _spline_eval(_ROBINSON_X, _ROBINSON_MX, 5.0, absphi_deg)
        Y, _ = _spline_eval(_ROBINSON_Y, _ROBINSON_MY, 5.0, absphi_deg)
        return X, Y

    def fwd(lon, lat):
        lat = np.asarray(lat, dtype=np.float64)
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
        lam = np.radians(_wrap_lon(np.degrees(lam)))
        ap = np.clip(np.abs(lat), 0.0, 90.0)
        X, Y = _xy_of(ap)
        x = _ROBINSON_FXC * R * X * lam
        y = _ROBINSON_FYC * R * Y * np.sign(lat)
        return fe + x, fn + y

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N, dtype=np.float64) - fn
        Yt = np.clip(np.abs(y) / (_ROBINSON_FYC * R), 0.0, 1.0)
        ap = np.clip(Yt * 90.0, 0.0, 90.0)  # Y is near-linear in phi
        for _ in range(25):
            Yv, Yd = _spline_eval(_ROBINSON_Y, _ROBINSON_MY, 5.0, ap)
            ap = np.clip(ap - (Yv - Yt) / np.where(np.abs(Yd) < 1e-12, 1e-12, Yd),
                         0.0, 90.0)
        X, _ = _spline_eval(_ROBINSON_X, _ROBINSON_MX, 5.0, ap)
        lam = x / (_ROBINSON_FXC * R * X)
        return _wrap_lon(np.degrees(lam) + lon0), ap * np.sign(y)

    return fwd, inv


def equal_earth(lon0: float, fe: float, fn: float, R: float = A_WGS84):
    """Equal Earth, spherical (+proj=eqearth, EPSG:8857): equal-area
    pseudocylindrical world projection (Savric, Patterson & Jenny 2018,
    IJGIS — published closed-form polynomial, public constants):

        sin(theta) = (sqrt(3)/2) sin(phi)
        y = R (A1 t + A2 t^3 + A3 t^7 + A4 t^9),  t = theta
        x = R (2 sqrt(3)/3) lam cos(theta) / y'(theta)

    Equal-area by construction: |d(x,y)/d(lam,phi)| = R^2 cos(phi) exactly
    (the y'(theta) factors cancel against d(theta)/d(phi)) — the tests pin
    that invariant independently of the constants.  Inverse: Newton on the
    monotone y(theta) polynomial, then divide out for lambda."""
    lam0 = np.radians(lon0)
    A1, A2, A3, A4 = 1.340264, -0.081106, 0.000893, 0.003796
    M = np.sqrt(3.0) / 2.0

    def _y_poly(t):
        t2 = t * t
        return t * (A1 + t2 * (A2 + t2 * t2 * (A3 + A4 * t2)))

    def _y_der(t):
        t2 = t * t
        return A1 + t2 * (3.0 * A2 + t2 * t2 * (7.0 * A3 + 9.0 * A4 * t2))

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
        lam = np.radians(_wrap_lon(np.degrees(lam)))
        th = np.arcsin(np.clip(M * np.sin(phi), -1.0, 1.0))
        x = R * (2.0 * np.sqrt(3.0) / 3.0) * lam * np.cos(th) / _y_der(th)
        y = R * _y_poly(th)
        return fe + x, fn + y

    def inv(E, N):
        yt = (np.asarray(N, dtype=np.float64) - fn) / R
        th = np.clip(yt / A1, -np.pi / 2.0, np.pi / 2.0)
        for _ in range(25):
            th = th - (_y_poly(th) - yt) / _y_der(th)
        x = np.asarray(E, dtype=np.float64) - fe
        lam = x * _y_der(th) / (R * (2.0 * np.sqrt(3.0) / 3.0) * np.cos(th))
        phi = np.arcsin(np.clip(np.sin(th) / M, -1.0, 1.0))
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)

    return fwd, inv


def cassini(lat0: float, lon0: float, fe: float, fn: float,
            a: float = A_WGS84, f: float = F_WGS84):
    """Cassini–Soldner, ellipsoidal (EPSG method 9806; Snyder ch. 13,
    eqs 13-7/13-8 forward, 13-ff inverse): the classic cadastral grid
    (Trinidad 30339, older German/levant grids).  The central meridian is
    true (y = M − M0 exactly); x is the perpendicular distance to it.
    The series reduce to the EXACT spherical formulas when e = 0 — the
    pytest pins that limit against the closed spherical form, an
    independent check of the series structure."""
    e2 = _ecc(f) ** 2
    M, M_inv = _merid_arc_fns(a, e2)
    p0 = np.radians(lat0)
    lam0 = np.radians(lon0)
    M0 = M(p0)

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
        sphi, cphi = np.sin(phi), np.cos(phi)
        N = a / np.sqrt(1.0 - e2 * sphi * sphi)
        T = np.tan(phi) ** 2
        A = dlam * cphi
        C = e2 * cphi * cphi / (1.0 - e2)
        x = N * (A - T * A ** 3 / 6.0
                 - (8.0 - T + 8.0 * C) * T * A ** 5 / 120.0)
        y = M(phi) - M0 + N * np.tan(phi) * (
            A * A / 2.0 + (5.0 - T + 6.0 * C) * A ** 4 / 24.0)
        return fe + x, fn + y

    def inv(E, Nn):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(Nn, dtype=np.float64) - fn
        phi1 = M_inv(M0 + y)
        s1, c1 = np.sin(phi1), np.cos(phi1)
        T1 = np.tan(phi1) ** 2
        N1 = a / np.sqrt(1.0 - e2 * s1 * s1)
        R1 = a * (1.0 - e2) / (1.0 - e2 * s1 * s1) ** 1.5
        D = x / N1
        phi = phi1 - (N1 * np.tan(phi1) / R1) * (
            D * D / 2.0 - (1.0 + 3.0 * T1) * D ** 4 / 24.0)
        lam = lam0 + (D - T1 * D ** 3 / 3.0
                      + (1.0 + 3.0 * T1) * T1 * D ** 5 / 15.0) / c1
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    return fwd, inv


def cassini_spherical_exact(lat0: float, lon0: float, R: float):
    """Closed-form spherical Cassini (Snyder 13-1..13-5) — the e = 0
    reference the series must reproduce."""
    p0 = np.radians(lat0)
    lam0 = np.radians(lon0)

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
        B = np.cos(phi) * np.sin(dlam)
        x = R * np.arcsin(B)
        y = R * (np.arctan2(np.tan(phi), np.cos(dlam)) - p0)
        return x, y

    def inv(x, y):
        D = np.asarray(y, dtype=np.float64) / R + p0
        xr = np.asarray(x, dtype=np.float64) / R
        phi = np.arcsin(np.sin(D) * np.cos(xr))
        lam = lam0 + np.arctan2(np.tan(xr), np.cos(D))
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    return fwd, inv


def bonne(lat1: float, lon0: float, fe: float, fn: float,
          R: float = A_WGS84):
    """Bonne pseudoconic, spherical (Snyder ch. 19, eqs 19-1..19-6;
    +proj=bonne +R=…): equal-area (the pytest pins the Jacobian = R²cosφ),
    the central meridian and EVERY parallel true to scale.  φ1 = 90° is
    the Werner heart-shaped projection."""
    p1 = np.radians(lat1)
    lam0 = np.radians(lon0)
    if abs(np.cos(p1)) < 1e-12:
        cot1 = 0.0  # Werner
    else:
        cot1 = np.cos(p1) / np.sin(p1)
    if abs(lat1) < 1e-9:
        raise NotImplementedError(
            "bonne with lat_1=0 degenerates to sinusoidal (use +proj=sinu)")

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
        rho = cot1 + p1 - phi
        Ea = np.where(np.abs(rho) > 1e-12, lam * np.cos(phi) / rho, 0.0)
        return fe + R * rho * np.sin(Ea), fn + R * (cot1 - rho * np.cos(Ea))

    def inv(E, N):
        x = (np.asarray(E, dtype=np.float64) - fe) / R
        y = (np.asarray(N, dtype=np.float64) - fn) / R
        rho = np.sign(p1) * np.hypot(x, cot1 - y)
        phi = cot1 + p1 - rho
        cphi = np.cos(phi)
        Ea = np.arctan2(np.sign(p1) * x, np.sign(p1) * (cot1 - y))
        lam = lam0 + np.where(np.abs(cphi) > 1e-12, rho * Ea / cphi, 0.0)
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    return fwd, inv


def aeqd_spherical(lat0: float, lon0: float, fe: float, fn: float,
                   R: float = A_WGS84):
    """Azimuthal equidistant, spherical (Snyder ch. 25, eqs 5-3/5-4 with
    k' = c/sin c; +proj=aeqd +R=…): every distance AND azimuth from the
    center is true — the classic "range rings" projection.  The
    ellipsoidal form needs geodesic distance/azimuth (PROJ delegates to
    Karney's geodesics) and is gated in the proj front end."""
    phi1 = np.radians(lat0)
    lam0 = np.radians(lon0)
    s1, c1 = np.sin(phi1), np.cos(phi1)

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
        cos_c = np.clip(s1 * np.sin(phi) + c1 * np.cos(phi) * np.cos(dlam),
                        -1.0, 1.0)
        c = np.arccos(cos_c)
        sin_c = np.sin(c)
        kp = np.where(sin_c > 1e-12, c / np.where(sin_c == 0, 1.0, sin_c), 1.0)
        x = R * kp * np.cos(phi) * np.sin(dlam)
        y = R * kp * (c1 * np.sin(phi) - s1 * np.cos(phi) * np.cos(dlam))
        return fe + x, fn + y

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N, dtype=np.float64) - fn
        rho = np.hypot(x, y)
        c = rho / R
        sin_c, cos_c = np.sin(c), np.cos(c)
        safe = np.where(rho == 0, 1.0, rho)
        phi = np.arcsin(np.clip(
            cos_c * s1 + np.where(rho == 0, 0.0, y * sin_c * c1 / safe),
            -1.0, 1.0))
        lam = lam0 + np.arctan2(x * sin_c,
                                safe * c1 * cos_c - y * s1 * sin_c)
        lam = np.where(rho == 0, lam0, lam)
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    return fwd, inv


def gnomonic(lat0: float, lon0: float, fe: float, fn: float,
             R: float = A_WGS84):
    """Gnomonic, spherical (Snyder ch. 22; +proj=gnom +R=…): projection
    from the sphere's center — every great circle maps to a straight
    line (the geometric test the pytest pins).  Valid for c < 90° from
    the center; points at/beyond the horizon raise."""
    phi1 = np.radians(lat0)
    lam0 = np.radians(lon0)
    s1, c1 = np.sin(phi1), np.cos(phi1)

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
        cos_c = s1 * np.sin(phi) + c1 * np.cos(phi) * np.cos(dlam)
        if np.any(cos_c <= 1e-10):
            raise ValueError("gnomonic: point at or beyond the horizon")
        kp = 1.0 / cos_c
        x = R * kp * np.cos(phi) * np.sin(dlam)
        y = R * kp * (c1 * np.sin(phi) - s1 * np.cos(phi) * np.cos(dlam))
        return fe + x, fn + y

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N, dtype=np.float64) - fn
        rho = np.hypot(x, y)
        c = np.arctan2(rho, R)
        sin_c, cos_c = np.sin(c), np.cos(c)
        safe = np.where(rho == 0, 1.0, rho)
        phi = np.arcsin(np.clip(
            cos_c * s1 + np.where(rho == 0, 0.0, y * sin_c * c1 / safe),
            -1.0, 1.0))
        lam = lam0 + np.arctan2(x * sin_c,
                                safe * c1 * cos_c - y * s1 * sin_c)
        lam = np.where(rho == 0, lam0, lam)
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    return fwd, inv


def eqdc(lat1: float, lat2: float, lat0: float, lon0: float,
         fe: float, fn: float, a: float = A_WGS84, f: float = F_WGS84):
    """Equidistant conic, ellipsoidal (Snyder ch. 16, eqs 16-4..16-6;
    +proj=eqdc): meridians are true to scale (ρ decreases by exactly the
    meridian arc — the pytest pins ρ(φa) − ρ(φb) = M(φb) − M(φa)) and both
    standard parallels are true (ρi·n = a·mi)."""
    e = _ecc(f)
    e2 = e * e
    M, M_inv = _merid_arc_fns(a, e2)
    p1, p2, p0 = (np.radians(v) for v in (lat1, lat2, lat0))
    lam0 = np.radians(lon0)

    def m_of(phi):
        return np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)

    m1, m2 = m_of(p1), m_of(p2)
    if abs(lat1 - lat2) < 1e-12:
        n = np.sin(p1)
    else:
        n = a * (m1 - m2) / (M(p2) - M(p1))
    G = m1 / n + M(p1) / a
    rho0 = a * G - M(p0)

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = a * G - M(phi)
        th = n * (np.radians(np.asarray(lon, dtype=np.float64)) - lam0)
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = rho0 - (np.asarray(N, dtype=np.float64) - fn)
        rho = np.sign(n) * np.hypot(x, y)
        th = np.arctan2(np.sign(n) * x, np.sign(n) * y)
        phi = M_inv(a * G - rho)
        lam = lam0 + th / n
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    return fwd, inv


def polyconic(lat0: float, lon0: float, fe: float, fn: float,
              a: float = A_WGS84, f: float = F_WGS84):
    """American polyconic, ellipsoidal (EPSG method 9818; Snyder ch. 18,
    eqs 18-12..18-15): each parallel is an arc of a circle of radius
    N·cotφ, true to scale (the pytest pins that circle geometry); the
    central meridian is true (y = M − M0).  Inverse: vectorized 2-D
    Newton on the exact forward (same idiom as the RPC inverse,
    transformer.py) — Snyder's scalar iteration (18-18..18-21) trades
    poorly against numpy batches."""
    e2 = _ecc(f) ** 2
    M, _ = _merid_arc_fns(a, e2)
    p0 = np.radians(lat0)
    lam0 = np.radians(lon0)
    M0 = M(p0)

    def _fwd_rad(lam, phi):
        flat = np.abs(phi) < 1e-12
        phi_s = np.where(flat, 1e-3, phi)  # dummy for the non-flat branch
        sphi = np.sin(phi_s)
        N = a / np.sqrt(1.0 - e2 * sphi ** 2)
        Ecirc = (lam - lam0) * sphi
        cot = np.cos(phi_s) / sphi
        x_r = N * cot * np.sin(Ecirc)
        y_r = M(phi_s) - M0 + N * cot * (1.0 - np.cos(Ecirc))
        x_f = a * (lam - lam0)
        y_f = -M0 + 0.0 * lam
        return np.where(flat, x_f, x_r), np.where(flat, y_f, y_r)

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        x, y = _fwd_rad(lam, phi)
        return fe + x, fn + y

    def inv(E, N_):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N_, dtype=np.float64) - fn
        phi = np.clip((M0 + y) / a, -1.5, 1.5)
        lam = lam0 + x / (a * np.maximum(np.cos(phi), 1e-6))
        h = 1e-7
        for _ in range(12):
            fx, fy = _fwd_rad(lam, phi)
            rx, ry = fx - x, fy - y
            dxl, dyl = _fwd_rad(lam + h, phi)
            dxp, dyp = _fwd_rad(lam, phi + h)
            j11, j21 = (dxl - fx) / h, (dyl - fy) / h
            j12, j22 = (dxp - fx) / h, (dyp - fy) / h
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-12, 1e-12, det)
            lam = lam - (j22 * rx - j12 * ry) / det
            phi = phi - (-j21 * rx + j11 * ry) / det
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    return fwd, inv


def hotine_omerc(lat_c: float, lon_c: float, alpha_c: float, gamma_c: float,
                 k_c: float, fe: float, fn: float, *, variant_b: bool = True,
                 a: float = A_WGS84, f: float = F_WGS84):
    """Hotine Oblique Mercator (EPSG 9812 variant A / 9815 variant B
    "azimuth center" — Malaysian RSO grids, Alaska zone 1; +proj=omerc).
    EPSG Guidance Note 7-2 closed forms; the reference delegates to PROJ
    (ogr/ogrct.cpp).  variant_b applies the u_c offset at the projection
    center (PROJ's default; +no_uoff selects variant A).  Pytest pins the
    GN7-2 Timbalai 1948 RSO Borneo worked example."""
    e = _ecc(f)
    e2 = e * e
    pc = np.radians(lat_c)
    lam_c = np.radians(lon_c)
    al = np.radians(alpha_c)
    ga = np.radians(gamma_c)
    sp, cp = np.sin(pc), np.cos(pc)
    B = np.sqrt(1.0 + e2 * cp ** 4 / (1.0 - e2))
    A_ = a * B * k_c * np.sqrt(1.0 - e2) / (1.0 - e2 * sp * sp)
    t0 = _t(pc, e)
    D = B * np.sqrt(1.0 - e2) / (cp * np.sqrt(1.0 - e2 * sp * sp))
    D2 = max(D * D, 1.0)
    sgn = 1.0 if lat_c >= 0 else -1.0
    F = D + np.sqrt(D2 - 1.0) * sgn
    H = F * t0 ** B
    G = (F - 1.0 / F) / 2.0
    g0 = np.arcsin(np.clip(np.sin(al) / D, -1.0, 1.0))
    lam0 = lam_c - np.arcsin(np.clip(G * np.tan(g0), -1.0, 1.0)) / B
    if abs(np.cos(al)) < 1e-12:
        raise NotImplementedError(
            "omerc with azimuth 90° (Swiss-style; use a somerc kernel)")
    uc = 0.0
    if variant_b:
        uc = (A_ / B) * np.arctan2(np.sqrt(D2 - 1.0), np.cos(al)) * sgn
    sg0, cg0 = np.sin(g0), np.cos(g0)
    sgc, cgc = np.sin(ga), np.cos(ga)

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = B * np.radians(_wrap_lon(
            np.asarray(lon, dtype=np.float64) - np.degrees(lam0)))
        t = _t(phi, e)
        Q = H / t ** B
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        V = np.sin(dlam)
        U = (-V * cg0 + S * sg0) / T
        v = A_ * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
        u = A_ * np.arctan2(S * cg0 + V * sg0, np.cos(dlam)) / B - abs(uc) * sgn
        return fe + v * cgc + u * sgc, fn + u * cgc - v * sgc

    def inv(E, N):
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N, dtype=np.float64) - fn
        v = x * cgc - y * sgc
        u = y * cgc + x * sgc + abs(uc) * sgn
        Q = np.exp(-B * v / A_)
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        V = np.sin(B * u / A_)
        U = (V * cg0 + S * sg0) / T
        t = (H / np.sqrt((1.0 + U) / (1.0 - U))) ** (1.0 / B)
        phi = _phi_from_t(t, e)
        lam = lam0 - np.arctan2(S * cg0 - V * sg0, np.cos(B * u / A_)) / B
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    return fwd, inv


def proj_pair(s: str):
    """'+proj=…' string -> (fwd, inv) lon/lat(deg) ↔ projected, built on
    the closed-form kernels above.  With +towgs84 the lon/lat side is
    WGS84: the 3/7-parameter Helmert datum shift (helmert_fns) composes
    with the projection through geocentric coordinates, as PROJ does.
    Raises NotImplementedError for projections outside the supported
    families."""
    p = parse_proj_params(s)
    pair = _proj_pair_raw(p)
    pm = p.get("pm")
    if pm not in (None, True):
        # +pm=: the CRS (and its lon_0) is relative to a non-Greenwich
        # prime meridian; the lon/lat side of this pair stays Greenwich
        # (PROJ's normalization order: lam = lon_gw - pm - lon_0)
        pm_deg = _PRIME_MERIDIANS.get(str(pm))
        if pm_deg is None:
            pm_deg = float(pm)
        raw_fwd0, raw_inv0 = pair

        def fwd_pm(lon, lat, _f=raw_fwd0, _o=pm_deg):
            return _f(np.asarray(lon, dtype=np.float64) - _o, lat)

        def inv_pm(E, N, _i=raw_inv0, _o=pm_deg):
            lo, la = _i(E, N)
            return lo + _o, la

        pair = (fwd_pm, inv_pm)
    grids = p.get("nadgrids")
    if grids not in (None, True) and str(grids) not in ("@null", "null"):
        # +nadgrids=path.gsb — NTv2 horizontal grid shift (PROJ
        # hgridshift): local-datum lon/lat -> shifted lon/lat before the
        # projection kernel, exactly where PROJ applies it
        from gdal_ray.sources.ntv2 import ntv2_transform

        g_fwd, g_inv = ntv2_transform(str(grids))
        raw_fwd, raw_inv = pair

        def fwd(lon, lat):  # shifted-datum lon/lat -> projected local
            lo, la = g_inv(lon, lat)
            return raw_fwd(lo, la)

        def inv(E, N):
            lo, la = raw_inv(E, N)
            return g_fwd(lo, la)

        pair = (fwd, inv)
    tow = p.get("towgs84")
    if tow in (None, True):
        return pair
    params = [float(v) for v in str(tow).split(",")]
    if all(v == 0.0 for v in params):
        return pair
    a, f = _proj_ellipsoid(p)
    h_fwd, h_inv = helmert_fns(params)
    raw_fwd, raw_inv = pair

    def fwd(lon, lat):  # WGS84 lon/lat -> projected on the local datum
        X, Y, Z = geodetic_to_geocentric(lon, lat, A_WGS84, F_WGS84)
        lo, la = geocentric_to_geodetic(*h_inv(X, Y, Z), a, f)
        return raw_fwd(lo, la)

    def inv(E, N):  # projected -> WGS84 lon/lat
        lo, la = raw_inv(E, N)
        X, Y, Z = geodetic_to_geocentric(lo, la, a, f)
        return geocentric_to_geodetic(*h_fwd(X, Y, Z), A_WGS84, F_WGS84)

    return fwd, inv


def _proj_pair_raw(p: dict):
    proj = p.get("proj")
    a, f = _proj_ellipsoid(p)
    lat0 = float(p.get("lat_0", 0.0))
    lon0 = float(p.get("lon_0", 0.0))
    k0 = float(p.get("k_0", p.get("k", 1.0)))
    fe = float(p.get("x_0", 0.0))
    fn = float(p.get("y_0", 0.0))
    if proj in ("longlat", "latlong", "lonlat"):
        ident = lambda x, y: (x, y)  # noqa: E731
        return ident, ident
    if proj == "utm":
        zone = int(p["zone"])
        lon0_z = -183.0 + 6.0 * zone
        fn_z = N0_SOUTH if p.get("south") else 0.0
        return tmerc_pair(0.0, lon0_z, 0.9996, 500000.0, fn_z, a, f)
    if proj == "tmerc":
        return tmerc_pair(lat0, lon0, k0, fe, fn, a, f)
    if proj == "merc":
        return mercator_1sp(float(p.get("lat_ts", 0.0)), lon0, k0, fe, fn, a, f)
    if proj == "webmerc":
        from gdal_ray import tilemath as tm

        def fwd(lon, lat):
            return tm.lonlat_to_meters(
                lon, np.clip(lat, -tm.MAX_LATITUDE, tm.MAX_LATITUDE))

        return fwd, tm.meters_to_lonlat
    if proj == "eqc":
        return eqc(float(p.get("lat_ts", 0.0)), lon0, fe, fn, a)
    if proj == "cass":
        return cassini_soldner(lat0, lon0, fe, fn, a=a, f=f)
    if proj == "sterea":
        return oblique_stereographic(lat0, lon0, k0, fe, fn, a=a, f=f)
    if proj == "somerc":
        if k0 != 1.0:
            raise NotImplementedError("somerc with k_0 != 1")
        return swiss_oblique_mercator(lat0, lon0, fe, fn, a=a, f=f)
    if proj == "omerc":
        lonc = float(p.get("lonc", lon0))
        alpha = float(p.get("alpha", 90.0))
        gamma = float(p.get("gamma", alpha))
        return hotine_oblique_mercator(
            lat0, lonc, alpha, gamma, k0, fe, fn,
            variant_b="no_uoff" not in p, a=a, f=f)
    if proj == "krovak":
        return krovak(lat_c=lat0 if "lat_0" in p else 49.5,
                      lon0=lon0 if "lon_0" in p else 24.0 + 50.0 / 60.0,
                      fe=fe, fn=fn, east_north=True, a=a, f=f)
    if proj == "lcc":
        lat1 = float(p.get("lat_1", lat0))
        lat2 = float(p.get("lat_2", lat1))
        pair = lcc_2sp(lat1, lat2, lat0, lon0, fe, fn, a=a, f=f)
        if k0 == 1.0:
            return pair
        # LCC 1SP (EPSG 9801): ρ = k0·a·F·tⁿ — identical to the 2SP cone
        # touched at lat_0 scaled radially by k0 about the false origin
        # (both ρ and ρ0 carry the same k0 factor).
        if not (lat1 == lat2 == lat0):
            raise NotImplementedError(
                "lcc with k_0 != 1 needs lat_1 == lat_2 == lat_0 (9801)")
        f2, i2 = pair

        def fwd(lon, lat):
            x, y = f2(lon, lat)
            return fe + (np.asarray(x) - fe) * k0, \
                fn + (np.asarray(y) - fn) * k0

        def inv(E, N):
            return i2(fe + (np.asarray(E, dtype=np.float64) - fe) / k0,
                      fn + (np.asarray(N, dtype=np.float64) - fn) / k0)

        return fwd, inv
    if proj == "aea":
        return albers_2sp(float(p["lat_1"]), float(p["lat_2"]), lat0, lon0,
                          fe, fn, a=a, f=f)
    if proj == "laea":
        return laea(lat0, lon0, fe, fn, a=a, f=f)
    if proj == "stere":
        if abs(lat0) < 89.999:
            raise NotImplementedError(
                "oblique +proj=stere (use +proj=sterea — EPSG 9809 double "
                "stereographic — for oblique aspects)")
        lat_ts = float(p.get("lat_ts", lat0))
        return polar_stereographic(lat_ts, lon0, fe, fn, a=a, f=f)
    if proj == "sterea":
        return oblique_stereographic(lat0, lon0, k0, fe, fn, a=a, f=f)
    if proj == "sinu":
        return sinusoidal(lon0, fe, fn, a=a, f=f)
    if proj == "moll":
        return mollweide(lon0, fe, fn, R=a)
    if proj == "cea":
        return cea(float(p.get("lat_ts", 0.0)), lon0, fe, fn, a=a, f=f)
    if proj == "ortho":
        return orthographic(lat0, lon0, fe, fn, a=a, f=f)
    if proj == "omerc":
        if "lat_1" in p or "lon_1" in p:
            raise NotImplementedError("two-point omerc form (+lat_1/+lon_1)")
        alpha = float(p["alpha"])
        gamma = float(p.get("gamma", alpha))
        lonc = float(p.get("lonc", lon0))
        return hotine_omerc(lat0, lonc, alpha, gamma, k0, fe, fn,
                            variant_b=not p.get("no_uoff"), a=a, f=f)
    if proj in ("aeqd", "gnom"):
        # spherical forms only: the ellipsoidal aeqd needs Karney
        # geodesics (PROJ's delegate); demand an explicit sphere
        if "R" in p:
            R = float(p["R"])
        elif f == 0.0:
            R = a
        else:
            raise NotImplementedError(
                f"ellipsoidal +proj={proj} (pass +R=<radius> for the "
                "spherical form — the ellipsoidal aeqd needs geodesics)")
        maker = aeqd_spherical if proj == "aeqd" else gnomonic
        return maker(lat0, lon0, fe, fn, R=R)
    if proj == "eqdc":
        lat1 = float(p.get("lat_1", lat0))
        lat2 = float(p.get("lat_2", lat1))
        return eqdc(lat1, lat2, lat0, lon0, fe, fn, a=a, f=f)
    if proj == "bonne":
        if "R" in p:
            Rb = float(p["R"])
        elif f == 0.0:
            Rb = a
        else:
            raise NotImplementedError(
                "ellipsoidal +proj=bonne (pass +R=<radius> for the "
                "spherical form)")
        return bonne(float(p["lat_1"]), lon0, fe, fn, R=Rb)
    if proj == "poly":
        return polyconic(lat0, lon0, fe, fn, a=a, f=f)
    if proj == "cass":
        return cassini(lat0, lon0, fe, fn, a=a, f=f)
    if proj == "eck4":
        return eckert4(lon0, fe, fn, R=a)
    if proj == "wintri":
        lat1 = float(p["lat_1"]) if "lat_1" in p else None
        return winkel_tripel(lat1, lon0, fe, fn, R=a)
    if proj == "robin":
        return robinson(lon0, fe, fn, R=a)
    if proj == "eqearth":
        return equal_earth(lon0, fe, fn, R=a)
    raise NotImplementedError(f"+proj={proj} (supported: longlat, utm, "
                              "tmerc, merc, webmerc, eqc, lcc, aea, laea, "
                              "polar stere, sinu, moll, cea, ortho, omerc, "
                              "aeqd/gnom (spherical), eqdc, poly, robin, "
                              "wintri)")


# --- datum shifts (+towgs84) -------------------------------------------------
# EPSG method 9606 (position-vector 7-parameter Helmert) / 9603 (3-param
# geocentric translation) — the convention PROJ's +towgs84 uses.  The chain
# is geodetic → geocentric on the source ellipsoid → Helmert → geodetic on
# WGS84 (Snyder/EPSG guidance note 7-2 formulas, public).


def geodetic_to_geocentric(lon, lat, a: float = A_WGS84, f: float = F_WGS84):
    """(deg, deg, h=0) → ECEF metres on the given ellipsoid."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    e2 = f * (2.0 - f)
    s = np.sin(phi)
    N = a / np.sqrt(1.0 - e2 * s * s)
    return (N * np.cos(phi) * np.cos(lam),
            N * np.cos(phi) * np.sin(lam),
            N * (1.0 - e2) * s)


def geocentric_to_geodetic(X, Y, Z, a: float = A_WGS84, f: float = F_WGS84,
                           iters: int = 12):
    """ECEF → (lon deg, lat deg) at h=0 surface (fixed-point in φ)."""
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    Z = np.asarray(Z, dtype=np.float64)
    e2 = f * (2.0 - f)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(iters):
        s = np.sin(phi)
        N = a / np.sqrt(1.0 - e2 * s * s)
        h = p / np.cos(phi) - N
        phi = np.arctan2(Z, p * (1.0 - e2 * N / (N + h)))
    return np.degrees(np.arctan2(Y, X)), np.degrees(phi)


def helmert_fns(params):
    """3- or 7-parameter position-vector Helmert → (fwd, inv) over ECEF
    triples.  params = (dx, dy, dz[, rx", ry", rz", s_ppm])."""
    params = [float(v) for v in params]
    if len(params) == 3:
        dx, dy, dz = params
        rx = ry = rz = s = 0.0
    elif len(params) == 7:
        dx, dy, dz, rx, ry, rz, s = params
    else:
        raise ValueError("towgs84 expects 3 or 7 parameters")
    arc = np.pi / 180.0 / 3600.0
    rx, ry, rz = rx * arc, ry * arc, rz * arc
    m = 1.0 + s * 1e-6
    R = m * np.array([[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]])
    Rinv = np.linalg.inv(R)  # exact inverse — round trips to fp precision
    d = np.array([dx, dy, dz])

    def fwd(X, Y, Z):
        return (R[0, 0] * X + R[0, 1] * Y + R[0, 2] * Z + d[0],
                R[1, 0] * X + R[1, 1] * Y + R[1, 2] * Z + d[1],
                R[2, 0] * X + R[2, 1] * Y + R[2, 2] * Z + d[2])

    def inv(X, Y, Z):
        X, Y, Z = X - d[0], Y - d[1], Z - d[2]
        return (Rinv[0, 0] * X + Rinv[0, 1] * Y + Rinv[0, 2] * Z,
                Rinv[1, 0] * X + Rinv[1, 1] * Y + Rinv[1, 2] * Z,
                Rinv[2, 0] * X + Rinv[2, 1] * Y + Rinv[2, 2] * Z)

    return fwd, inv
