"""GCP-based geotransformers (polynomial orders 1-3, thin-plate spline)
and the RPC camera model.

Reference semantics: GDALCreateGCPTransformer (alg/gdal_crs.c — least-squares
polynomial fit over ground control points, orders 1..3, forward and inverse
fitted independently) and GDALCreateTPSTransformer (alg/gdal_tps.cpp /
alg/thinplatespline.cpp — exact radial-basis interpolation with the
r²·log r kernel plus an affine part).  Both are implemented from the
published math (least squares / classic Duchon thin-plate spline), fully
vectorized over numpy arrays.

A GCP is (pixel, line, X, Y): source image coordinates → georeferenced
coordinates.  Each factory returns ``(fwd, inv)`` closures with the same
``f(x, y) -> (x', y')`` shape `warp_image` consumes, so a GCP/TPS warp is
the existing inverse-mapping warp with an identity source GeoTransform.
"""

from __future__ import annotations

import numpy as np

_N_TERMS = {1: 3, 2: 6, 3: 10}


def _poly_terms(x, y, order: int) -> np.ndarray:
    """Design matrix columns for a bivariate polynomial of given order
    (same term basis as gdal_crs.c: 1, x, y, xy, x², y², …)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * y, x * x, y * y]
    if order >= 3:
        cols += [x * x * y, x * y * y, x**3, y**3]
    return np.stack(cols, axis=-1)


def _poly_fit(sx, sy, dx, dy, order: int) -> np.ndarray:
    A = _poly_terms(sx, sy, order)
    n = _N_TERMS[order]
    if A.shape[0] < n:
        raise ValueError(f"order-{order} polynomial needs >= {n} GCPs, got {A.shape[0]}")
    coef, *_ = np.linalg.lstsq(A, np.stack([dx, dy], axis=-1), rcond=None)
    return coef  # (n_terms, 2)


def gcp_polynomial(gcps, order: int | None = None):
    """(fwd, inv) polynomial transformer fitted to GCPs by least squares.

    ``order=None`` picks the GDAL default: the highest order the GCP count
    supports, capped at 2 (gdal_crs.c auto-order; order 3 only on request).
    """
    g = np.asarray(gcps, dtype=np.float64)
    if g.ndim != 2 or g.shape[1] != 4:
        raise ValueError("gcps must be (n, 4): pixel, line, X, Y")
    px, ln, X, Y = g.T
    if order is None:
        order = 2 if len(g) >= _N_TERMS[2] else 1
    cf = _poly_fit(px, ln, X, Y, order)
    ci = _poly_fit(X, Y, px, ln, order)

    def fwd(x, y):
        T = _poly_terms(x, y, order)
        return T @ cf[:, 0], T @ cf[:, 1]

    def inv(x, y):
        T = _poly_terms(x, y, order)
        return T @ ci[:, 0], T @ ci[:, 1]

    return fwd, inv


# RPC00B 20-term cubic basis order (public NITF RPC00B spec; same ordering
# GDALRPCTransform evaluates in alg/gdal_rpc.cpp RPCEvaluate):
def _rpc_terms(L, P, H):
    one = np.ones_like(L)
    return np.stack([
        one, L, P, H, L * P, L * H, P * H, L * L, P * P, H * H,
        P * L * H, L**3, L * P * P, L * H * H, L * L * P, P**3,
        P * H * H, L * L * H, P * P * H, H**3,
    ], axis=-1)


_RPC_KEYS = ("LINE_OFF", "SAMP_OFF", "LAT_OFF", "LONG_OFF", "HEIGHT_OFF",
             "LINE_SCALE", "SAMP_SCALE", "LAT_SCALE", "LONG_SCALE",
             "HEIGHT_SCALE")


def rpc_transformer(rpc: dict, height: float = 0.0, tol: float = 1e-10,
                    max_iter: int = 20):
    """Rational polynomial coefficient transformer (GDALCreateRPCTransformer,
    alg/gdal_rpc.cpp; the RPC00B camera model).  ``rpc`` carries the ten
    offset/scale keys plus LINE_NUM_COEFF / LINE_DEN_COEFF / SAMP_NUM_COEFF /
    SAMP_DEN_COEFF (20 floats each).  Returns (fwd, inv):

    - fwd(pixel, line) -> (lon, lat): the iterative direction — Newton on
      the native model with a finite-difference Jacobian, exactly the
      reference's RPCInverseTransformPoint strategy;
    - inv(lon, lat) -> (pixel, line): the native closed-form direction
      (what an inverse-mapping warp consumes).

    ``height`` is the fixed terrain height (RPC_HEIGHT); no DEM path in
    this sandbox."""
    for k in _RPC_KEYS:
        if k not in rpc:
            raise ValueError(f"rpc missing {k}")
    coef = {k: np.asarray(rpc[k], dtype=np.float64)
            for k in ("LINE_NUM_COEFF", "LINE_DEN_COEFF",
                      "SAMP_NUM_COEFF", "SAMP_DEN_COEFF")}
    if any(c.shape != (20,) for c in coef.values()):
        raise ValueError("RPC coefficient vectors must have 20 terms")

    def native(lon, lat):
        L = (np.asarray(lon, dtype=np.float64) - rpc["LONG_OFF"]) / rpc["LONG_SCALE"]
        P = (np.asarray(lat, dtype=np.float64) - rpc["LAT_OFF"]) / rpc["LAT_SCALE"]
        H = (height - rpc["HEIGHT_OFF"]) / rpc["HEIGHT_SCALE"] * np.ones_like(L)
        T = _rpc_terms(L, P, H)
        line = (T @ coef["LINE_NUM_COEFF"]) / (T @ coef["LINE_DEN_COEFF"])
        samp = (T @ coef["SAMP_NUM_COEFF"]) / (T @ coef["SAMP_DEN_COEFF"])
        return (samp * rpc["SAMP_SCALE"] + rpc["SAMP_OFF"],
                line * rpc["LINE_SCALE"] + rpc["LINE_OFF"])

    def inv(lon, lat):
        return native(lon, lat)

    def fwd(pixel, line):
        pixel = np.asarray(pixel, dtype=np.float64)
        line = np.asarray(line, dtype=np.float64)
        lon = np.full_like(pixel, float(rpc["LONG_OFF"]))
        lat = np.full_like(line, float(rpc["LAT_OFF"]))
        dl = 1e-7 * rpc["LONG_SCALE"]
        dp = 1e-7 * rpc["LAT_SCALE"]
        for _ in range(max_iter):
            px, ln = native(lon, lat)
            ex, ey = px - pixel, ln - line
            if max(np.abs(ex).max(initial=0), np.abs(ey).max(initial=0)) < tol:
                break
            pxl, lnl = native(lon + dl, lat)
            pxp, lnp = native(lon, lat + dp)
            j11, j21 = (pxl - px) / dl, (lnl - ln) / dl   # d/dlon
            j12, j22 = (pxp - px) / dp, (lnp - ln) / dp   # d/dlat
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            lon = lon - (j22 * ex - j12 * ey) / det
            lat = lat - (-j21 * ex + j11 * ey) / det
        return lon, lat

    return fwd, inv


def _tps_solve(sx, sy, vals) -> tuple[np.ndarray, np.ndarray]:
    """Solve the thin-plate-spline system  [K P; Pᵀ 0][w; a] = [v; 0]
    with kernel U(r) = r² log r² (thinplatespline.cpp's VizGeorefSpline2D
    uses the same r²·log r² form).  Returns (weights (n,2), affine (3,2))."""
    n = len(sx)
    dx = sx[:, None] - sx[None, :]
    dy = sy[:, None] - sy[None, :]
    r2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        K = np.where(r2 > 0, r2 * np.log(r2), 0.0)
    P = np.stack([np.ones(n), sx, sy], axis=-1)
    A = np.zeros((n + 3, n + 3))
    A[:n, :n] = K
    A[:n, n:] = P
    A[n:, :n] = P.T
    b = np.zeros((n + 3, vals.shape[1]))
    b[:n] = vals
    sol = np.linalg.solve(A, b)
    return sol[:n], sol[n:]


def tps_transformer(gcps):
    """(fwd, inv) exact thin-plate-spline transformer through all GCPs
    (GDALCreateTPSTransformer semantics: interpolates every GCP exactly;
    the inverse is an independently fitted spline, as in gdal_tps.cpp)."""
    g = np.asarray(gcps, dtype=np.float64)
    if g.ndim != 2 or g.shape[1] != 4:
        raise ValueError("gcps must be (n, 4): pixel, line, X, Y")
    if len(g) < 3:
        raise ValueError("TPS needs >= 3 GCPs")
    px, ln, X, Y = g.T

    def make(sx, sy, dx, dy):
        w, aff = _tps_solve(sx, sy, np.stack([dx, dy], axis=-1))

        def f(x, y):
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            shp = x.shape
            xf, yf = x.ravel(), y.ravel()
            r2 = (xf[:, None] - sx[None, :]) ** 2 + (yf[:, None] - sy[None, :]) ** 2
            with np.errstate(divide="ignore", invalid="ignore"):
                U = np.where(r2 > 0, r2 * np.log(r2), 0.0)
            out = U @ w + _poly_terms(xf, yf, 1) @ aff
            return out[:, 0].reshape(shp), out[:, 1].reshape(shp)

        return f

    return make(px, ln, X, Y), make(X, Y, px, ln)
