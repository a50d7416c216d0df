"""Aggregating warp resamplers, src-nodata masks, and cutline — brute-force
per-cell references."""

import numpy as np

from gdal_ray.stages.warp import cutline_mask, suggested_output, warp_aggregate, warp_image


def _brute_cells(img, src_gt, dst_gt, dw, dh, fwd=lambda x, y: (x, y)):
    """src-pixel-center forward mapping reference: dict cell -> values."""
    h, w = img.shape[:2]
    cells = {}
    for r in range(h):
        for c in range(w):
            sx = src_gt[0] + (c + 0.5) * src_gt[1]
            sy = src_gt[3] + (r + 0.5) * src_gt[5]
            dx, dy = fwd(sx, sy)
            fc = (dx - dst_gt[0]) / dst_gt[1]
            fr = (dy - dst_gt[3]) / dst_gt[5]
            cc, rr = int(np.floor(fc)), int(np.floor(fr))
            if 0 <= cc < dw and 0 <= rr < dh:
                cells.setdefault((rr, cc), []).append(float(img[r, c]))
    return cells


def test_warp_aggregate_identity_all_stats():
    rng = np.random.Generator(np.random.PCG64(3))
    img = rng.integers(0, 50, size=(12, 20)).astype(np.float64)
    src_gt = (0.0, 1.0, 0.0, 12.0, 0.0, -1.0)
    dst_gt = (0.0, 4.0, 0.0, 12.0, 0.0, -4.0)
    dw, dh = 5, 3
    cells = _brute_cells(img, src_gt, dst_gt, dw, dh)
    for stat, ref in [
        ("count", lambda v: len(v)),
        ("sum", lambda v: sum(v)),
        ("min", lambda v: min(v)),
        ("max", lambda v: max(v)),
        ("average", lambda v: sum(v) / len(v)),
        ("med", lambda v: float(np.quantile(v, 0.5))),
        ("q1", lambda v: float(np.quantile(v, 0.25))),
        ("q3", lambda v: float(np.quantile(v, 0.75))),
    ]:
        out, _ = warp_aggregate(img, src_gt, "EPSG:4326", "EPSG:4326",
                                dst_size=(dw, dh), dst_gt=dst_gt, stat=stat)
        for (rr, cc), v in cells.items():
            assert abs(out[rr, cc] - ref(v)) < 1e-9, (stat, rr, cc)


def test_warp_aggregate_mode_tie_smallest():
    img = np.array([[1.0, 2.0], [2.0, 1.0]])
    src_gt = (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)
    dst_gt = (0.0, 2.0, 0.0, 2.0, 0.0, -2.0)
    out, _ = warp_aggregate(img, src_gt, "EPSG:4326", "EPSG:4326",
                            dst_size=(1, 1), dst_gt=dst_gt, stat="mode")
    assert out[0, 0] == 1.0  # 2-2 tie -> smallest value


def test_warp_aggregate_crs_pair_matches_brute():
    from gdal_ray import tilemath as tm

    rng = np.random.Generator(np.random.PCG64(9))
    img = rng.integers(0, 99, size=(16, 16)).astype(np.float64)
    src_gt = (10.0, 0.25, 0.0, 50.0, 0.0, -0.25)  # 4° x 4° at (10,46..50)
    dw, dh, dst_gt = suggested_output(16, 16, src_gt, "EPSG:4326", "EPSG:3857")

    def fwd(lon, lat):
        return tm.lonlat_to_meters(np.asarray(lon), np.asarray(lat))

    cells = _brute_cells(img, src_gt, dst_gt, dw, dh, fwd=fwd)
    out, _ = warp_aggregate(img, src_gt, "EPSG:4326", "EPSG:3857",
                            dst_size=(dw, dh), dst_gt=dst_gt, stat="average")
    for (rr, cc), v in cells.items():
        assert abs(out[rr, cc] - sum(v) / len(v)) < 1e-9


def test_warp_aggregate_src_nodata():
    img = np.array([[5.0, 0.0], [0.0, 7.0]])
    src_gt = (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)
    dst_gt = (0.0, 2.0, 0.0, 2.0, 0.0, -2.0)
    out, _ = warp_aggregate(img, src_gt, "EPSG:4326", "EPSG:4326",
                            dst_size=(1, 1), dst_gt=dst_gt, stat="average",
                            src_nodata=0.0)
    assert out[0, 0] == 6.0  # zeros masked out of the average


def test_warp_image_src_nodata_bilinear():
    img = np.array([[10.0, 0.0], [10.0, 0.0]])
    src_gt = (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)
    out, _ = warp_image(img, src_gt, "EPSG:4326", "EPSG:4326",
                        dst_size=(2, 2), dst_gt=src_gt, method="bilinear",
                        src_nodata=0.0, nodata=-1.0)
    # valid column keeps its value (weights renormalized over valid samples)
    assert out[0, 0] == 10.0 and out[1, 0] == 10.0
    # all-nodata support -> dst nodata
    assert out[0, 1] == -1.0 and out[1, 1] == -1.0


def test_warp_image_cutline():
    img = np.full((4, 4), 9.0)
    src_gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    tri = [np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])]
    out, _ = warp_image(img, src_gt, "EPSG:4326", "EPSG:4326",
                        dst_size=(4, 4), dst_gt=src_gt, method="nearest",
                        cutline=tri, nodata=-1.0)
    m = cutline_mask(src_gt, 4, 4, tri)
    assert (out[m] == 9.0).all() and (out[~m] == -1.0).all()
    # pixel-center even-odd: center (0.5, 3.5) inside (0.5+3.5=4 boundary
    # handled by the crossing rule), center (3.5, 3.5) outside
    assert not m[0, 3]
