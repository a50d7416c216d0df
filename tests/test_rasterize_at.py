"""ALL_TOUCHED rasterization (gdal_rasterize -at parity): supercover
edge walk + interior centers vs an independent Liang-Barsky brute force."""

import numpy as np

from gdal_ray.geometry.predicates import points_in_rings
from gdal_ray.geometry.wkb import encode_polygon
from gdal_ray.stages.rasterize import (all_touched_mask,
                                       rasterize_polygons,
                                       rasterize_polygons_all_touched)


def _seg_crosses_cell(x0, y0, x1, y1, cx0, cy0, cx1, cy1) -> bool:
    """Liang-Barsky: does the open segment pass through the open box?"""
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, x0 - cx0), (dx, cx1 - x0),
                 (-dy, y0 - cy0), (dy, cy1 - y0)):
        if p == 0:
            if q < 0:
                return False
            continue
        r = q / p
        if p < 0:
            t0 = max(t0, r)
        else:
            t1 = min(t1, r)
    return t0 < t1


def _brute_mask(rings, width, height, ox, oy, pw, ph):
    mask = np.zeros((height, width), dtype=bool)
    for r in range(height):
        for c in range(width):
            cx0, cx1 = ox + c * pw, ox + (c + 1) * pw
            cy1, cy0 = oy - r * ph, oy - (r + 1) * ph
            hit = False
            for ring in rings:
                for i in range(len(ring) - 1):
                    if _seg_crosses_cell(ring[i, 0], ring[i, 1],
                                         ring[i + 1, 0], ring[i + 1, 1],
                                         cx0, cy0, cx1, cy1):
                        hit = True
                        break
                if hit:
                    break
            mask[r, c] = hit
    gx = ox + (np.arange(width) + 0.5) * pw
    gy = oy - (np.arange(height) + 0.5) * ph
    mx, my = np.meshgrid(gx, gy)
    mask |= points_in_rings(mx.ravel(), my.ravel(), rings).reshape(mask.shape)
    return mask


def test_all_touched_matches_brute_force_random_polygons():
    rng = np.random.RandomState(42)
    W = H = 24
    for trial in range(12):
        n = int(rng.randint(3, 7))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        cx, cy = rng.uniform(6, 18, 2)
        rad = rng.uniform(2, 9, n)
        pts = np.column_stack([cx + rad * np.cos(ang),
                               cy + rad * np.sin(ang)])
        ring = np.vstack([pts, pts[:1]])
        got = all_touched_mask([ring], width=W, height=H, origin_x=0.0,
                               origin_y=float(H), pixel_w=1.0, pixel_h=1.0)
        want = _brute_mask([ring], W, H, 0.0, float(H), 1.0, 1.0)
        assert np.array_equal(got, want), f"trial {trial}"


def test_all_touched_superset_of_center_rule():
    # every center-inside pixel must also be ALL_TOUCHED-burned
    ring = np.array([[2.2, 2.2], [14.7, 3.1], [12.3, 13.8],
                     [3.4, 11.6], [2.2, 2.2]])
    wkb = encode_polygon([ring])
    kw = dict(width=16, height=16, origin_x=0.0, origin_y=16.0,
              pixel_w=1.0, pixel_h=1.0)
    center = rasterize_polygons([wkb], [1.0], **kw)
    at = rasterize_polygons_all_touched([wkb], [1.0], **kw)
    assert ((center == 1.0) <= (at == 1.0)).all()
    assert (at == 1.0).sum() > (center == 1.0).sum()  # boundary adds pixels


def test_all_touched_thin_sliver():
    # a sliver thinner than a pixel contains NO centers but must burn
    # the diagonal band of cells it crosses
    ring = np.array([[0.6, 0.55], [11.4, 11.35], [11.45, 11.42],
                     [0.65, 0.62], [0.6, 0.55]])
    wkb = encode_polygon([ring])
    kw = dict(width=12, height=12, origin_x=0.0, origin_y=12.0,
              pixel_w=1.0, pixel_h=1.0)
    center = rasterize_polygons([wkb], [1.0], **kw)
    at = rasterize_polygons_all_touched([wkb], [1.0], **kw)
    assert (center == 1.0).sum() == 0
    assert (at == 1.0).sum() >= 12  # one cell per diagonal step at least
    # diagonal cells all burned
    for k in range(1, 11):
        assert at[11 - k, k] == 1.0


def test_axis_aligned_rect_closed_form():
    # non-grid-aligned rect with binary-exact fractional corners:
    # touched cells = floor span product
    x0, y0, x1, y1 = 2.25, 3.75, 7.75, 9.25
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    got = all_touched_mask([ring], width=16, height=16, origin_x=0.0,
                           origin_y=16.0, pixel_w=1.0, pixel_h=1.0)
    n_cols = int(np.floor(x1) - np.floor(x0) + 1)
    n_rows = int(np.floor(y1) - np.floor(y0) + 1)
    assert int(got.sum()) == n_cols * n_rows


def test_line_bresenham_vs_all_touched():
    from gdal_ray.geometry.wkb import encode_linestring
    from gdal_ray.stages.rasterize import rasterize_lines

    pts = np.array([[0.5, 0.5], [11.5, 7.5]])
    wkb = encode_linestring(pts)
    kw = dict(width=12, height=12, origin_x=0.0, origin_y=12.0,
              pixel_w=1.0, pixel_h=1.0)
    br = rasterize_lines([wkb], [1.0], **kw)
    at = rasterize_lines([wkb], [1.0], all_touched=True, **kw)
    # Bresenham: exactly one pixel per major-axis column
    assert (br == 1.0).sum() == 12
    assert ((br == 1.0).sum(axis=0) == 1).all()
    # all-touched is a superset and adds the corner-crossing cells
    assert ((br == 1.0) <= (at == 1.0)).all()
    assert (at == 1.0).sum() > (br == 1.0).sum()
    # endpoints burned in both
    assert br[11, 0] == 1.0 and br[4, 11] == 1.0


def test_line_all_touched_matches_brute():
    from gdal_ray.stages.rasterize import all_touched_mask  # noqa: F401
    from gdal_ray.stages.rasterize import _edge_touched_cells

    rng = np.random.RandomState(5)
    W = H = 20
    for _ in range(20):
        x0, y0, x1, y1 = rng.uniform(0.3, 19.7, 4)
        mask = np.zeros((H, W), dtype=bool)
        _edge_touched_cells(x0, y0, x1, y1, W, H, mask)
        ring = np.array([[x0, H - y0], [x1, H - y1]])  # geo coords
        want = np.zeros((H, W), dtype=bool)
        for r in range(H):
            for c in range(W):
                if _seg_crosses_cell(x0, y0, x1, y1, c, r, c + 1, r + 1):
                    want[r, c] = True
        assert np.array_equal(mask, want)


def test_points_burn_and_add():
    from gdal_ray.stages.rasterize import rasterize_points

    xs = np.array([0.2, 0.7, 5.5, 11.9, -1.0, 12.1])
    ys = np.array([11.8, 11.2, 6.5, 0.1, 5.0, 5.0])
    out = rasterize_points(xs, ys, np.ones(6), width=12, height=12,
                           origin_x=0.0, origin_y=12.0, pixel_w=1.0,
                           pixel_h=1.0, merge_alg="ADD")
    assert out[0, 0] == 2.0          # two points share the top-left cell
    assert out[5, 5] == 1.0
    assert out[11, 11] == 1.0
    assert out.sum() == 4.0          # two out-of-bounds points dropped
