import numpy as np

from gdal_ray.stages.polygonize import label_components, polygonize, rings_to_wkt
from gdal_ray.stages.rasterize import rasterize_polygons
from gdal_ray.stages.resample import downsample_2x2_average, resize
from gdal_ray.stages.stats import checksum_image, checksum_plane
from gdal_ray.geometry.wkb import encode_polygon


# ---------------------------------------------------------------------------
# checksum (alg/gdalchecksum.cpp:68 semantics)

def test_checksum_known_value():
    # independent scalar evaluation of the documented rule
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    img = (np.arange(20 * 20, dtype=np.uint8).reshape(20, 20) * 7 + 3).astype(np.uint8)
    want = 0
    for i, v in enumerate(img.ravel().tolist()):
        want += v % primes[i % 11]
        want &= 0xFFFF
    assert checksum_plane(img) == want


def test_checksum_deterministic_multiband():
    from gdal_ray.synth import pixels_for

    img = pixels_for(11, 32, 32)
    a = checksum_image(img)
    assert a == checksum_image(img)
    assert 0 <= a <= 0xFFFF


# ---------------------------------------------------------------------------
# resampling

def test_nearest_identity():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert np.array_equal(resize(img, 4, 4, "nearest"), img)


def test_nearest_2x_upsample_replicates():
    img = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    out = resize(img, 4, 4, "nearest")
    want = np.array([[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]], np.uint8)
    assert np.array_equal(out, want)


def test_average_2x2_exact():
    img = np.array([[0, 2, 10, 12], [4, 6, 14, 16], [100, 100, 200, 200], [100, 100, 200, 200]], np.uint8)
    out = downsample_2x2_average(img)
    assert np.array_equal(out, np.array([[3, 13], [100, 200]], np.uint8))


def test_average_odd_size_partial_window():
    # 3 -> 2: windows [0,1.5) and [1.5,3); pixel 1 contributes half to each
    img = np.array([[0.0, 6.0, 12.0]])
    out = resize(img, 2, 1, "average")
    # window0 = (0*1 + 6*0.5)/1.5 = 2 ; window1 = (6*0.5 + 12*1)/1.5 = 10
    assert np.allclose(out, [[2.0, 10.0]])


def test_bilinear_constant_preserved():
    img = np.full((8, 8), 77, np.uint8)
    for m in ("bilinear", "cubic", "lanczos", "average"):
        out = resize(img, 5, 3, m)
        assert np.all(out == 77), m


def test_bilinear_2x_downsample_matches_manual():
    img = np.array([[0.0, 10.0], [20.0, 30.0]])
    out = resize(img, 1, 1, "bilinear")
    assert np.allclose(out, [[15.0]])


def test_cubic_interpolates_linear_ramp_exactly():
    # Catmull-Rom reproduces linear functions away from edges
    img = np.tile(np.arange(16, dtype=np.float64), (4, 1))
    out = resize(img, 31, 4, "cubic")
    xs = (np.arange(31) + 0.5) * (16 / 31) - 0.5
    interior = (xs > 2) & (xs < 13)
    assert np.allclose(out[2][interior], xs[interior], atol=1e-9)


# ---------------------------------------------------------------------------
# rasterize (pixel-center even-odd; llrasterize.cpp:49-58)

def test_rasterize_box_pixel_center_rule():
    # box [1.0, 3.0) in a 4x4 unit grid: centers 1.5, 2.5 inside
    wkb = encode_polygon([np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])])
    out = rasterize_polygons(
        [wkb], [5], width=4, height=4, origin_x=0.0, origin_y=4.0, pixel_w=1.0, pixel_h=1.0
    )
    want = np.zeros((4, 4))
    want[1:3, 1:3] = 5
    assert np.array_equal(out, want)


def test_rasterize_merge_add_and_replace():
    b1 = encode_polygon([np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])])
    b2 = encode_polygon([np.array([[2.0, 0.0], [4.0, 0.0], [4.0, 4.0], [2.0, 4.0]])])
    rep = rasterize_polygons([b1, b2], [1, 2], width=4, height=4, origin_x=0, origin_y=4, pixel_w=1, pixel_h=1)
    assert rep[0, 0] == 1 and rep[0, 3] == 2  # last wins on overlap
    add = rasterize_polygons([b1, b2], [1, 2], width=4, height=4, origin_x=0, origin_y=4, pixel_w=1, pixel_h=1, merge_alg="ADD")
    assert add[0, 0] == 1 and add[0, 3] == 3


def test_rasterize_polygon_with_hole():
    outer = np.array([[0.0, 0.0], [6.0, 0.0], [6.0, 6.0], [0.0, 6.0]])
    inner = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0]])
    wkb = encode_polygon([outer, inner])
    out = rasterize_polygons([wkb], [9], width=6, height=6, origin_x=0, origin_y=6, pixel_w=1, pixel_h=1)
    assert out[0, 0] == 9 and out[3, 3] == 0
    assert out.sum() == 9 * (36 - 4)


# ---------------------------------------------------------------------------
# polygonize (alg/polygonize.cpp semantics on handcrafted rasters)

def test_label_two_components_4conn():
    img = np.array([[1, 1, 0], [0, 1, 0], [1, 0, 1]], np.uint8)
    lab = label_components(img)
    # 4-connected: diagonal 1s at (2,0) and (2,2) are separate
    assert lab[0, 0] == lab[0, 1] == lab[1, 1]
    assert lab[2, 0] != lab[1, 1]
    assert lab[2, 2] != lab[2, 0]
    # zeros form components too (polygonize labels every value)
    assert lab[0, 2] == lab[1, 2]


def test_label_8conn_merges_diagonal():
    img = np.array([[1, 0], [0, 1]], np.uint8)
    l4 = label_components(img)
    l8 = label_components(img, connect8=True)
    assert l4[0, 0] != l4[1, 1]
    assert l8[0, 0] == l8[1, 1]


def test_polygonize_counts_and_donut():
    img = np.zeros((8, 8), np.uint8)
    img[1:7, 1:7] = 3
    img[3:5, 3:5] = 0  # hole (separate zero component inside)
    polys = polygonize(img)
    vals = sorted((p["value"], p["pixel_count"]) for p in polys)
    # outer zero ring: 64-36=28 px; ring of 3s: 36-4=32 px; inner zero: 4 px
    assert vals == [(0, 4), (0, 28), (3, 32)]
    ring_poly = [p for p in polys if p["value"] == 3][0]
    assert len(ring_poly["rings"]) == 2  # exterior + hole
    wkt = rings_to_wkt(ring_poly["rings"])
    assert wkt.startswith("POLYGON ((")


def test_polygonize_mask_excludes():
    img = np.ones((4, 4), np.uint8)
    mask = np.ones((4, 4), bool)
    mask[0, :] = False
    polys = polygonize(img, mask=mask)
    assert len(polys) == 1 and polys[0]["pixel_count"] == 12


def test_polygonize_ring_geometry_square():
    img = np.zeros((4, 4), np.uint8)
    img[1:3, 1:3] = 7
    polys = polygonize(img)
    sq = [p for p in polys if p["value"] == 7][0]
    ring = sq["rings"][0]
    assert set(ring[:-1]) == {(1, 1), (3, 1), (3, 3), (1, 3)}
