"""Geodesic (ellipsoidal) distance, line length, and polygon area on
WGS84 — the OGR_G_GeodesicLength / OGR_G_GeodesicArea surface
(ogr/ogrgeometry.cpp GeodesicLength/GeodesicArea, which delegate to
GeographicLib's geod_* C API).

Implementations are from the public literature, fully vectorized:

- **Inverse problem** (:func:`inverse`): Vincenty (1975, "Direct and
  inverse solutions of geodesics on the ellipsoid with application of
  nested equations") — iterate on the difference of longitude on the
  auxiliary sphere.  Accurate to ~0.5 mm on WGS84 wherever it
  converges; the classical non-convergent band around antipodal pairs
  (λ > π·(1−f·cos²…), roughly within 0.6′ of the antipode) falls back
  to a bisection on Vincenty's λ-equation, keeping the result finite
  and monotone (GeographicLib solves this band with Karney's Newton
  method; the fallback here is within centimeters of it).
- **Polygon area** (:func:`polygon_area`): spherical excess on the
  AUTHALIC sphere (Snyder 1987, eq. 3-11/3-13: authalic latitude β(φ)
  and radius R_q preserve areas of latitude bands exactly, so the
  total ellipsoid area is exact by construction).  Edges are treated
  as great circles of the authalic sphere; for geodesic-edged figures
  this differs from the rigorous Karney (2013 §6) area by O(e⁴·edge²)
  — sub-1e-6 relative for country-scale polygons, and EXACT for any
  polygon bounded by meridians and the equator (both map to great
  circles).  The per-edge excess uses the stable atan2 form of the
  spherical excess (Eriksson 1990 / GeographicLib's spherical term).

Everything takes degrees and returns meters / m².
"""

from __future__ import annotations

import numpy as np

A = 6378137.0
F = 1.0 / 298.257223563
B = A * (1.0 - F)
E2 = F * (2.0 - F)
_E = np.sqrt(E2)

# authalic radius: R_q² = (a²/2)(1 + (1-e²)/e · atanh(e))
_RQ2 = (A * A / 2.0) * (1.0 + (1.0 - E2) / _E * np.arctanh(_E))
ELLIPSOID_AREA = 4.0 * np.pi * _RQ2


def _vincenty_lambda(U1, U2, L, lam):
    """One Vincenty iteration step: given λ, return (new λ, σ, aux)."""
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)
    sinl, cosl = np.sin(lam), np.cos(lam)
    sin_sig = np.hypot(cosU2 * sinl, cosU1 * sinU2 - sinU1 * cosU2 * cosl)
    cos_sig = sinU1 * sinU2 + cosU1 * cosU2 * cosl
    sig = np.arctan2(sin_sig, cos_sig)
    with np.errstate(divide="ignore", invalid="ignore"):
        sin_alpha = np.where(sin_sig != 0.0,
                             cosU1 * cosU2 * sinl / np.where(sin_sig == 0.0,
                                                             1.0, sin_sig),
                             0.0)
    cos2_alpha = 1.0 - sin_alpha * sin_alpha
    with np.errstate(divide="ignore", invalid="ignore"):
        cos_2sigm = np.where(cos2_alpha != 0.0,
                             cos_sig - 2.0 * sinU1 * sinU2
                             / np.where(cos2_alpha == 0.0, 1.0, cos2_alpha),
                             0.0)  # equatorial line: cos²α = 0
    C = F / 16.0 * cos2_alpha * (4.0 + F * (4.0 - 3.0 * cos2_alpha))
    new_lam = L + (1.0 - C) * F * sin_alpha * (
        sig + C * sin_sig * (cos_2sigm + C * cos_sig
                             * (-1.0 + 2.0 * cos_2sigm * cos_2sigm)))
    return new_lam, sig, (sin_sig, cos_sig, cos2_alpha, cos_2sigm)


def _vincenty_distance(U1, U2, L, sig, aux):
    sin_sig, cos_sig, cos2_alpha, cos_2sigm = aux
    u2 = cos2_alpha * (A * A - B * B) / (B * B)
    k1 = (np.sqrt(1.0 + u2) - 1.0) / (np.sqrt(1.0 + u2) + 1.0)
    AA = (1.0 + 0.25 * k1 * k1) / (1.0 - k1)
    BB = k1 * (1.0 - 3.0 / 8.0 * k1 * k1)
    d_sig = BB * sin_sig * (
        cos_2sigm + 0.25 * BB * (
            cos_sig * (-1.0 + 2.0 * cos_2sigm ** 2)
            - BB / 6.0 * cos_2sigm * (-3.0 + 4.0 * sin_sig ** 2)
            * (-3.0 + 4.0 * cos_2sigm ** 2)))
    return B * AA * (sig - d_sig)


def inverse(lat1, lon1, lat2, lon2, *, max_iter: int = 200,
            tol: float = 1e-12):
    """Vectorized Vincenty inverse: geodesic distance in meters.

    Inputs in degrees (scalars or arrays, broadcast together).
    Coincident points return 0.  Near-antipodal pairs where the fixed
    point fails to converge are resolved by bisection on λ.
    """
    lat1, lon1, lat2, lon2 = np.broadcast_arrays(
        *(np.asarray(v, dtype=np.float64) for v in (lat1, lon1, lat2, lon2)))
    U1 = np.arctan((1.0 - F) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - F) * np.tan(np.radians(lat2)))
    L = np.radians(((lon2 - lon1) + 180.0) % 360.0 - 180.0)

    lam = L.copy()
    converged = np.zeros(lam.shape, dtype=bool)
    sig = np.zeros(lam.shape)
    aux = None
    for _ in range(max_iter):
        new_lam, sig, aux = _vincenty_lambda(U1, U2, L, lam)
        delta = np.abs(new_lam - lam)
        lam = np.where(converged, lam, new_lam)
        converged |= delta < tol
        if converged.all():
            break

    dist = _vincenty_distance(U1, U2, L, sig, aux)

    if not converged.all():
        # antipodal band: Vincenty's fixed point diverges/oscillates.
        # g(λ) = vincenty_rhs(λ) − λ is continuous and changes sign on
        # [|L|, π]; bisect it (50 steps → ~1e-15 rad) per element.
        bad = np.nonzero(~converged.ravel())[0]
        fd = dist.ravel()
        for k in bad:
            u1, u2v, ll = U1.ravel()[k], U2.ravel()[k], L.ravel()[k]
            lo, hi = abs(ll), np.pi
            for _ in range(60):
                mid = 0.5 * (lo + hi)
                nl, sg, ax = _vincenty_lambda(u1, u2v, ll, mid)
                if (nl - mid) * np.sign(ll if ll != 0 else 1.0) > 0:
                    lo = mid
                else:
                    hi = mid
            mid = 0.5 * (lo + hi)
            _, sg, ax = _vincenty_lambda(u1, u2v, ll, mid)
            fd[k] = _vincenty_distance(u1, u2v, ll, sg, ax)
        dist = fd.reshape(dist.shape)

    coincident = (lat1 == lat2) & (L == 0.0)
    return np.where(coincident, 0.0, dist)


def line_length(lons: np.ndarray, lats: np.ndarray) -> float:
    """Geodesic length of a polyline (degrees) in meters."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    if len(lons) < 2:
        return 0.0
    return float(inverse(lats[:-1], lons[:-1], lats[1:], lons[1:]).sum())


def _authalic_lat(phi: np.ndarray) -> np.ndarray:
    """Geodetic -> authalic latitude (Snyder 1987 eq. 3-11/3-12):
    sin β = q(φ) / q(π/2) with q = (1−e²)[sinφ/(1−e²sin²φ) −
    (1/2e)·ln((1−e sinφ)/(1+e sinφ))]."""
    s = np.sin(phi)
    q = (1.0 - E2) * (s / (1.0 - E2 * s * s)
                      + np.arctanh(_E * s) / _E)
    qp = (1.0 - E2) * (1.0 / (1.0 - E2) + np.arctanh(_E) / _E)
    return np.arcsin(np.clip(q / qp, -1.0, 1.0))


def _spherical_ring_area(lam: np.ndarray, beta: np.ndarray) -> float:
    """Signed spherical-excess area of a closed ring on the unit sphere
    (vertices as longitude λ, latitude β in radians), via the per-edge
    atan2 excess (the l'Huilier/Eriksson form GeographicLib's spherical
    term reduces to):

        E_edge = 2·atan2( tan(Δλ/2)·(t1 + t2), 1 + t1·t2 ),
        t = tan(β/2)

    Summed over edges this is the signed solid angle of the ring (CCW
    positive), correct for rings not containing a pole; polygons are
    normalized by the caller so the outer ring is CCW."""
    if lam[0] != lam[-1] or beta[0] != beta[-1]:
        lam = np.append(lam, lam[0])
        beta = np.append(beta, beta[0])
    dlam = np.diff(lam)
    dlam = (dlam + np.pi) % (2.0 * np.pi) - np.pi  # shortest way round
    t = np.tan(beta / 2.0)
    t1, t2 = t[:-1], t[1:]
    exc = 2.0 * np.arctan2(np.tan(dlam / 2.0) * (t1 + t2), 1.0 + t1 * t2)
    return float(exc.sum())


def polygon_area(rings: list[np.ndarray]) -> float:
    """Geodesic area (m²) of a polygon given as rings of (lon, lat)
    degrees — first ring outer, rest holes (orientation ignored; holes
    are subtracted by |area|).  Authalic-sphere spherical excess."""
    total = 0.0
    for i, r in enumerate(rings):
        lam = np.radians(np.asarray(r[:, 0], dtype=np.float64))
        beta = _authalic_lat(np.radians(np.asarray(r[:, 1],
                                                   dtype=np.float64)))
        a = abs(_spherical_ring_area(lam, beta)) * _RQ2
        # a ring traversed the "short way" can still legitimately be
        # more than a hemisphere only if the caller says so; clamp to
        # the smaller of the two cap areas like geod_polygonarea's
        # default (sign convention: counter-clockwise encloses)
        a = min(a, ELLIPSOID_AREA - a) if a > ELLIPSOID_AREA / 2 else a
        total += a if i == 0 else -a
    return max(total, 0.0)


def wkb_geodesic_measures(wkb: bytes) -> tuple[float, float]:
    """(geodesic_area_m2, geodesic_perimeter_m) of a WKB polygon /
    multipolygon / linestring in EPSG:4326 lon-lat."""
    from gdal_ray.geometry.wkb import GeomType, decode_wkb

    kind, coords = decode_wkb(wkb)
    area = 0.0
    length = 0.0
    if kind in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        polys = ([coords] if kind == GeomType.POLYGON
                 else [rings for _t, rings in coords])
        for rings in polys:
            area += polygon_area(rings)
            for r in rings:
                length += line_length(r[:, 0], r[:, 1])
    elif kind in (GeomType.LINESTRING, GeomType.MULTILINESTRING):
        lines = ([coords] if kind == GeomType.LINESTRING
                 else [pts for _t, pts in coords])
        for ln in lines:
            length += line_length(ln[:, 0], ln[:, 1])
    return area, length
