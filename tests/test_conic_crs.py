"""Snyder conic/azimuthal projections (LCC 2SP, polar stereographic,
Albers) and GCP polynomial / thin-plate-spline transformers: defining
invariants, round-trips, and warp integration (GDAL parity for the
gdalwarp -t_srs / -order / -tps surfaces; alg/gdal_crs.c, gdal_tps.cpp)."""

import numpy as np
import pytest

from gdal_ray import crs
from gdal_ray.transformer import gcp_polynomial, tps_transformer
from gdal_ray.stages.warp import warp_image, warp_image_gcp

RANGES = {
    2154: ((-8, 15), (41, 52)),      # Lambert-93 over France
    3978: ((-140, -50), (42, 84)),   # Canada Atlas Lambert
    3347: ((-140, -50), (42, 84)),   # Statistics Canada Lambert
    5070: ((-125, -65), (22, 50)),   # CONUS Albers
    3577: ((110, 155), (-45, -10)),  # Australian Albers
    3413: ((-180, 180), (60, 89)),   # NSIDC polar stereo North
    3976: ((-180, 180), (-89, -55)), # NSIDC polar stereo South
    3031: ((-180, 180), (-89, -55)), # Antarctic polar stereo
}


@pytest.mark.parametrize("code", sorted(RANGES))
def test_conic_roundtrip(code):
    (lo0, lo1), (la0, la1) = RANGES[code]
    rng = np.random.default_rng(code)
    lon = rng.uniform(lo0, lo1, 2000)
    lat = rng.uniform(la0, la1, 2000)
    fwd, inv = crs.conic_pair(code)
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


@pytest.mark.parametrize(
    "code,lon0,lat0,fe,fn",
    [(2154, 3.0, 46.5, 700000.0, 6600000.0),
     (3978, -95.0, 49.0, 0.0, 0.0),
     (5070, -96.0, 23.0, 0.0, 0.0),
     (3577, 132.0, 0.0, 0.0, 0.0)],
)
def test_conic_natural_origin_maps_to_false_origin(code, lon0, lat0, fe, fn):
    fwd, _ = crs.conic_pair(code)
    x, y = fwd(np.array([lon0]), np.array([lat0]))
    assert abs(x[0] - fe) < 1e-6 and abs(y[0] - fn) < 1e-6


def test_polar_stereographic_invariants():
    fwd, _ = crs.conic_pair(3031)
    # the pole is the projection origin regardless of longitude
    x, y = fwd(np.array([123.0, -45.0]), np.array([-90.0, -90.0]))
    assert np.abs(x).max() < 1e-9 and np.abs(y).max() < 1e-9
    # scale is true at the standard parallel: rho(-71) == a * m(71)
    x, y = fwd(np.array([0.0]), np.array([-71.0]))
    m = crs._m(np.radians(71.0), crs._ecc(crs.F_WGS84))
    assert abs(float(np.hypot(x[0], y[0])) - crs.A_WGS84 * float(m)) < 1e-6
    # south aspect: grid north points away from Greenwich meridian
    assert y[0] > 0
    xe, ye = fwd(np.array([90.0]), np.array([-75.0]))
    assert xe[0] > 0 and abs(ye[0]) < 1e-6


def test_albers_preserves_area_between_parallels():
    # equal-area property: the authalic area of a lon/lat cell equals its
    # projected polygon area (sampled as a dense ring, shoelace formula)
    fwd, _ = crs.conic_pair(5070)
    lon = np.concatenate([np.linspace(-100, -98, 200), np.full(200, -98),
                          np.linspace(-98, -100, 200), np.full(200, -100)])
    lat = np.concatenate([np.full(200, 35.0), np.linspace(35, 37, 200),
                          np.full(200, 37.0), np.linspace(37, 35, 200)])
    x, y = fwd(lon, lat)
    proj_area = 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    # authalic cell area on the ellipsoid via q (Snyder 3-12): the exact
    # area between parallels is  pi*a^2*(1-e^2)*... == a^2/2 * dlam * (q2-q1)
    e = crs._ecc(crs.F_GRS80)
    e2 = e * e

    def q(phi):
        s = np.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - np.log((1 - e * s) / (1 + e * s)) / (2 * e))

    dlam = np.radians(2.0)
    true_area = crs.A_WGS84**2 / 2 * dlam * (q(np.radians(37.0)) - q(np.radians(35.0)))
    assert abs(proj_area - true_area) / true_area < 1e-6


def test_transform_fn_routes_conic_codes():
    f = crs.transform_fn("EPSG:4326", "EPSG:2154")
    x, y = f(np.array([3.0]), np.array([46.5]))
    assert abs(x[0] - 700000.0) < 1e-6 and abs(y[0] - 6600000.0) < 1e-6
    g = crs.transform_fn("EPSG:2154", "EPSG:3857")  # composes through 4326
    mx, my = g(x, y)
    lon = mx[0] / (crs.A_WGS84 * np.pi / 180.0)
    assert abs(lon - 3.0) < 1e-9


def _affine_gcps():
    px = np.array([0.0, 64, 0, 64, 32, 10, 50, 20])
    ln = np.array([0.0, 0, 64, 64, 32, 50, 10, 30])
    return np.stack([px, ln, 100 + 2 * px, 500 - 2 * ln], axis=-1)


def test_gcp_polynomial_recovers_affine_exactly():
    fwd, inv = gcp_polynomial(_affine_gcps(), order=1)
    x, y = fwd(np.array([16.0, 3.25]), np.array([8.0, 40.5]))
    np.testing.assert_allclose(x, [132.0, 106.5], atol=1e-9)
    np.testing.assert_allclose(y, [484.0, 419.0], atol=1e-9)
    xi, yi = inv(x, y)
    np.testing.assert_allclose(xi, [16.0, 3.25], atol=1e-9)
    np.testing.assert_allclose(yi, [8.0, 40.5], atol=1e-9)


def test_gcp_polynomial_order2_fits_quadratic():
    rng = np.random.default_rng(7)
    px, ln = rng.uniform(0, 100, 30), rng.uniform(0, 100, 30)
    X = 10 + px + 0.01 * px * ln
    Y = 5 - ln + 0.002 * px * px
    fwd, _ = gcp_polynomial(np.stack([px, ln, X, Y], -1), order=2)
    qx, qy = rng.uniform(10, 90, 50), rng.uniform(10, 90, 50)
    x, y = fwd(qx, qy)
    np.testing.assert_allclose(x, 10 + qx + 0.01 * qx * qy, atol=1e-8)
    np.testing.assert_allclose(y, 5 - qy + 0.002 * qx * qx, atol=1e-8)


def test_gcp_auto_order_and_count_guard():
    g = _affine_gcps()[:4]
    fwd, _ = gcp_polynomial(g)  # 4 GCPs -> auto order 1
    x, _ = fwd(np.array([32.0]), np.array([32.0]))
    assert abs(x[0] - 164.0) < 1e-9
    with pytest.raises(ValueError):
        gcp_polynomial(g, order=3)


def test_tps_interpolates_gcps_exactly_and_bends_between():
    # non-polynomial warp field: TPS must hit every GCP exactly
    rng = np.random.default_rng(11)
    px, ln = rng.uniform(0, 100, 25), rng.uniform(0, 100, 25)
    X = px + 5 * np.sin(ln / 15.0)
    Y = ln + 3 * np.cos(px / 20.0)
    fwd, inv = tps_transformer(np.stack([px, ln, X, Y], -1))
    x, y = fwd(px, ln)
    np.testing.assert_allclose(x, X, atol=1e-8)
    np.testing.assert_allclose(y, Y, atol=1e-8)
    xi, yi = inv(X, Y)
    np.testing.assert_allclose(xi, px, atol=1e-8)
    np.testing.assert_allclose(yi, ln, atol=1e-8)


def test_warp_image_gcp_affine_is_identity_resample():
    img = (np.arange(64 * 64).reshape(64, 64) % 251).astype(np.uint8)
    out, gt = warp_image_gcp(img, _affine_gcps(), order=1, method="nearest")
    assert out.shape == (64, 64)
    np.testing.assert_allclose(gt, (100.0, 2.0, 0.0, 500.0, 0.0, -2.0), atol=1e-6)
    # exact affine GCPs + nearest at native resolution = the input image
    np.testing.assert_array_equal(out, img)


def test_laea_roundtrip_and_equal_area():
    fwd, inv = crs.conic_pair(3035)
    rng = np.random.default_rng(3)
    lon, lat = rng.uniform(-10, 40, 2000), rng.uniform(35, 70, 2000)
    x, y = fwd(lon, lat)
    lo, la = inv(x, y)
    assert np.abs(lo - lon).max() < 1e-9 and np.abs(la - lat).max() < 1e-9
    # natural origin (10E, 52N) -> false origin (EPSG:3035)
    x, y = fwd(np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6
    # polar aspect: the pole is the origin for EPSG:3575
    pf, pi = crs.conic_pair(3575)
    x, y = pf(np.array([33.0]), np.array([90.0]))
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    lon, lat = rng.uniform(-180, 180, 1000), rng.uniform(45, 89, 1000)
    x, y = pf(lon, lat)
    lo, la = pi(x, y)
    assert np.abs(lo - lon).max() < 1e-9 and np.abs(la - lat).max() < 1e-9


def _toy_rpc():
    line_num = np.zeros(20); samp_num = np.zeros(20); den = np.zeros(20)
    line_num[2] = -1.0; line_num[4] = 0.02; line_num[7] = 0.005
    samp_num[1] = 1.0; samp_num[4] = -0.015; samp_num[8] = 0.004
    den[0] = 1.0; den[1] = 0.001; den[2] = -0.0005
    return {
        "LINE_OFF": 2048.0, "SAMP_OFF": 2048.0,
        "LAT_OFF": 45.0, "LONG_OFF": 7.0, "HEIGHT_OFF": 500.0,
        "LINE_SCALE": 2048.0, "SAMP_SCALE": 2048.0,
        "LAT_SCALE": 0.1, "LONG_SCALE": 0.1, "HEIGHT_SCALE": 500.0,
        "LINE_NUM_COEFF": line_num, "LINE_DEN_COEFF": den,
        "SAMP_NUM_COEFF": samp_num, "SAMP_DEN_COEFF": den,
    }


def test_rpc_transformer_roundtrip_and_validation():
    from gdal_ray.transformer import rpc_transformer

    fwd, inv = rpc_transformer(_toy_rpc(), height=500.0)
    rng = np.random.default_rng(5)
    lon = rng.uniform(6.92, 7.08, 500)
    lat = rng.uniform(44.92, 45.08, 500)
    px, ln = inv(lon, lat)
    lo, la = fwd(px, ln)
    assert np.abs(lo - lon).max() < 1e-9 and np.abs(la - lat).max() < 1e-9
    bad = dict(_toy_rpc()); del bad["LAT_OFF"]
    with pytest.raises(ValueError):
        rpc_transformer(bad)
    bad = dict(_toy_rpc()); bad["LINE_NUM_COEFF"] = np.zeros(19)
    with pytest.raises(ValueError):
        rpc_transformer(bad)


def test_warp_image_with_rpc_transformer():
    # georeference a raw sensor grid through the RPC camera model: the
    # warp machinery consumes (fwd, inv) directly (gdalwarp -rpc path)
    from gdal_ray.transformer import rpc_transformer

    pair = rpc_transformer(_toy_rpc(), height=500.0)
    img = ((np.add.outer(np.arange(64), np.arange(64))) % 17).astype(np.uint8) * 15
    out, gt = warp_image(img, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), "RPC", "RPC",
                         method="bilinear", transformer=pair)
    assert out.ndim == 2 and out.size > 0
    # output grid is in degrees near the RPC offsets
    assert 6.8 < gt[0] < 7.2 and abs(gt[1]) < 0.01


def test_warp_image_conic_roundtrip_preserves_content():
    # 4326 -> Lambert-93 -> back: interior pixels survive (same machinery
    # as the UTM round-trip gate in test_crs.py, via the conic path)
    img = ((np.add.outer(np.arange(48), np.arange(48))) % 19).astype(np.uint8) * 13
    gt = (2.0, 0.01, 0.0, 48.0, 0.0, -0.01)
    warped, wgt = warp_image(img, gt, "EPSG:4326", "EPSG:2154", method="bilinear")
    back, _ = warp_image(warped, wgt, "EPSG:2154", "EPSG:4326",
                         dst_size=(48, 48), dst_gt=gt, method="bilinear")
    interior = (slice(4, -4), slice(4, -4))
    assert np.abs(back[interior].astype(int) - img[interior].astype(int)).mean() < 8
