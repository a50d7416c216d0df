"""GCP-based geotransformers (polynomial orders 1-3, thin-plate spline),
the RPC camera model, projective homography, and geolocation arrays.

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


def homography_transformer(gcps):
    """(fwd, inv) projective (homography) transformer fitted to >= 4 GCPs
    by normalized DLT least squares.

    Reference semantics: GDALCreateHomographyTransformerFromGCPs
    (alg/gdal_homography.cpp) — a 3x3 matrix H maps (pixel, line, 1) to
    homogeneous (X, Y, W) with perspective divide; the inverse transform
    is H⁻¹.  Exact for 4 GCPs, least-squares for more."""
    g = np.asarray(gcps, dtype=np.float64)
    if g.ndim != 2 or g.shape[1] != 4:
        raise ValueError("gcps must be (n, 4): pixel, line, X, Y")
    if len(g) < 4:
        raise ValueError("homography needs >= 4 GCPs")
    px, ln, X, Y = g.T

    def _norm(u, v):
        """Hartley normalization: translate to centroid, scale to RMS √2."""
        cu, cv = u.mean(), v.mean()
        s = np.sqrt(2.0) / max(np.sqrt(((u - cu) ** 2 + (v - cv) ** 2).mean()), 1e-300)
        T = np.array([[s, 0, -s * cu], [0, s, -s * cv], [0, 0, 1.0]])
        return T

    Ts, Td = _norm(px, ln), _norm(X, Y)
    sxn = Ts[0, 0] * px + Ts[0, 2]
    syn = Ts[1, 1] * ln + Ts[1, 2]
    dxn = Td[0, 0] * X + Td[0, 2]
    dyn = Td[1, 1] * Y + Td[1, 2]
    n = len(g)
    A = np.zeros((2 * n, 9))
    A[0::2, 0] = sxn; A[0::2, 1] = syn; A[0::2, 2] = 1.0
    A[0::2, 6] = -dxn * sxn; A[0::2, 7] = -dxn * syn; A[0::2, 8] = -dxn
    A[1::2, 3] = sxn; A[1::2, 4] = syn; A[1::2, 5] = 1.0
    A[1::2, 6] = -dyn * sxn; A[1::2, 7] = -dyn * syn; A[1::2, 8] = -dyn
    _, _, Vt = np.linalg.svd(A)
    Hn = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ Hn @ Ts
    H = H / H[2, 2]
    Hi = np.linalg.inv(H)
    Hi = Hi / Hi[2, 2]

    def _apply(M):
        def f(x, y):
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            w = M[2, 0] * x + M[2, 1] * y + M[2, 2]
            w = np.where(np.abs(w) < 1e-300, 1e-300, w)
            return ((M[0, 0] * x + M[0, 1] * y + M[0, 2]) / w,
                    (M[1, 0] * x + M[1, 1] * y + M[1, 2]) / w)

        return f

    return _apply(H), _apply(Hi)


def geoloc_transformer(geo_x: np.ndarray, geo_y: np.ndarray, *,
                       pixel_offset: float = 0.0, line_offset: float = 0.0,
                       pixel_step: float = 1.0, line_step: float = 1.0,
                       tol: float = 1e-9, max_iter: int = 30):
    """(fwd, inv) geolocation-array transformer.

    Reference semantics: GDALCreateGeoLocTransformer (alg/gdalgeoloc.cpp)
    — two 2-D arrays give the georeferenced X/Y of sampled source pixels;
    geoloc cell (r, c) corresponds to source pixel
    ``x = PIXEL_OFFSET + c·PIXEL_STEP``, ``y = LINE_OFFSET + r·LINE_STEP``.

    - fwd(pixel, line) -> (X, Y): bilinear interpolation inside the
      arrays, linear extrapolation at the edges (the reference's
      GDALGeoLocTransform forward path);
    - inv(X, Y) -> (pixel, line): Newton iteration on the bilinear
      surface with an analytic per-cell Jacobian, seeded by a global
      affine fit — replacing the reference's backmap/quadtree inverse
      (gdalgeolocquadtree.cpp) with an iterative solver that needs no
      precomputed raster.  Requires a locally invertible (non-folding)
      geolocation field, as the reference does.
    """
    gx = np.ascontiguousarray(geo_x, dtype=np.float64)
    gy = np.ascontiguousarray(geo_y, dtype=np.float64)
    if gx.shape != gy.shape or gx.ndim != 2 or min(gx.shape) < 2:
        raise ValueError("geo_x/geo_y must be equal-shape 2-D arrays (>=2x2)")
    nr, nc = gx.shape

    def _sample(arr, c, r):
        """Bilinear with linear edge extrapolation (cells clamped, fractions
        left unclamped)."""
        c0 = np.clip(np.floor(c).astype(np.int64), 0, nc - 2)
        r0 = np.clip(np.floor(r).astype(np.int64), 0, nr - 2)
        fc = c - c0
        fr = r - r0
        a = arr[r0, c0]
        b = arr[r0, c0 + 1]
        d = arr[r0 + 1, c0]
        e = arr[r0 + 1, c0 + 1]
        return (a * (1 - fc) * (1 - fr) + b * fc * (1 - fr)
                + d * (1 - fc) * fr + e * fc * fr)

    def _grad(arr, c, r):
        """d/dc and d/dr of the bilinear surface (exact within a cell)."""
        c0 = np.clip(np.floor(c).astype(np.int64), 0, nc - 2)
        r0 = np.clip(np.floor(r).astype(np.int64), 0, nr - 2)
        fc = c - c0
        fr = r - r0
        a = arr[r0, c0]
        b = arr[r0, c0 + 1]
        d = arr[r0 + 1, c0]
        e = arr[r0 + 1, c0 + 1]
        dc = (b - a) * (1 - fr) + (e - d) * fr
        dr = (d - a) * (1 - fc) + (e - b) * fc
        return dc, dr

    def _to_arr(pixel, line):
        c = (np.asarray(pixel, dtype=np.float64) - pixel_offset) / pixel_step
        r = (np.asarray(line, dtype=np.float64) - line_offset) / line_step
        return c, r

    def fwd(pixel, line):
        c, r = _to_arr(pixel, line)
        return _sample(gx, c, r), _sample(gy, c, r)

    # global affine seed for the inverse: X,Y ~ A·(c,r) least squares
    rr, cc = np.meshgrid(np.arange(nr, dtype=np.float64),
                         np.arange(nc, dtype=np.float64), indexing="ij")
    P = np.stack([np.ones(gx.size), cc.ravel(), rr.ravel()], axis=-1)
    coefx, *_ = np.linalg.lstsq(P, gx.ravel(), rcond=None)
    coefy, *_ = np.linalg.lstsq(P, gy.ravel(), rcond=None)
    Aff = np.array([[coefx[1], coefx[2]], [coefy[1], coefy[2]]])
    det = Aff[0, 0] * Aff[1, 1] - Aff[0, 1] * Aff[1, 0]
    if abs(det) < 1e-300:
        raise ValueError("degenerate geolocation arrays (affine seed singular)")
    Ainv = np.array([[Aff[1, 1], -Aff[0, 1]], [-Aff[1, 0], Aff[0, 0]]]) / det

    def inv(X, Y):
        X = np.asarray(X, dtype=np.float64)
        Y = np.asarray(Y, dtype=np.float64)
        c = Ainv[0, 0] * (X - coefx[0]) + Ainv[0, 1] * (Y - coefy[0])
        r = Ainv[1, 0] * (X - coefx[0]) + Ainv[1, 1] * (Y - coefy[0])
        for _ in range(max_iter):
            ex = _sample(gx, c, r) - X
            ey = _sample(gy, c, r) - Y
            if max(np.abs(ex).max(initial=0.0), np.abs(ey).max(initial=0.0)) < tol:
                break
            j11, j12 = _grad(gx, c, r)
            j21, j22 = _grad(gy, c, r)
            dj = j11 * j22 - j12 * j21
            dj = np.where(np.abs(dj) < 1e-30, 1e-30, dj)
            c = c - (j22 * ex - j12 * ey) / dj
            r = r - (-j21 * ex + j11 * ey) / dj
        return (pixel_offset + c * pixel_step,
                line_offset + r * line_step)

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
