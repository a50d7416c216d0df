"""Tile rendering + pyramid semantics: mosaic priority (last-on-top),
blank-tile skip, alpha-weighted overview average, checksum stability."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_ray import tilemath as tm
from gdal_ray.codecs import encode
from gdal_ray.stages import render
from gdal_ray.stages.stats import checksum_image


def _img_row(i, color, lon0, lat0, lon1, lat1, w=16, h=16):
    import pyarrow as pa

    img = np.full((h, w, 3), color, dtype=np.uint8)
    return {
        "image_id": f"img-{i:012d}",
        "bytes": encode(img, "png"),
        "w": w,
        "h": h,
        "fmt": "png",
        "lon_min": lon0,
        "lat_min": lat0,
        "lon_max": lon1,
        "lat_max": lat1,
    }


def _table(rows):
    import pyarrow as pa

    cols = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(cols)


def test_contribution_covers_expected_tiles():
    # image spanning most of one z=2 tile → contributions only to tiles its
    # bbox covers
    t = _table([_img_row(1, 100, 10.0, 20.0, 30.0, 40.0)])
    out = render.render_contributions(t, zoom=2, tile_size=16)
    zs = out.column("z").to_numpy()
    assert (zs == 2).all() and len(out) >= 1
    x0, x1, y0, y1 = tm.bbox_to_tile_range_xyz(
        np.float64(10.0), np.float64(20.0), np.float64(30.0), np.float64(40.0), np.int64(2)
    )
    assert set(out.column("x").to_numpy()) <= set(range(int(x0), int(x1) + 1))
    assert set(out.column("y").to_numpy()) <= set(range(int(y0), int(y1) + 1))


def test_mosaic_last_on_top():
    ts = 8
    base = np.full((ts, ts, 3), 10, np.uint8)
    top = np.full((ts, ts, 3), 200, np.uint8)
    full_alpha = np.full((ts, ts), 255, np.uint8)
    half_alpha = np.zeros((ts, ts), np.uint8)
    half_alpha[:, : ts // 2] = 255
    g = pa.table(
        {
            "z": pa.array([3, 3], pa.int64()),
            "x": pa.array([1, 1], pa.int64()),
            "y": pa.array([2, 2], pa.int64()),
            "priority": pa.array([1, 2], pa.int64()),
            "rgb": pa.array([base.tobytes(), top.tobytes()], pa.binary()),
            "alpha": pa.array([full_alpha.tobytes(), half_alpha.tobytes()], pa.binary()),
        }
    )
    out = render._mosaic_group(g, ts)
    canvas = np.frombuffer(out.column("rgb")[0].as_py(), np.uint8).reshape(ts, ts, 3)
    assert (canvas[:, : ts // 2] == 200).all()  # higher priority wins where covered
    assert (canvas[:, ts // 2 :] == 10).all()
    # order reversal of input rows must not change the result (explicit priority)
    out2 = render._mosaic_group(g.take(pa.array([1, 0])), ts)
    assert out.column("rgb")[0].as_py() == out2.column("rgb")[0].as_py()
    assert out.column("checksum")[0].as_py() == checksum_image(canvas)


def test_mosaic_blank_skip():
    ts = 4
    zero_alpha = np.zeros((ts, ts), np.uint8)
    g = pa.table(
        {
            "z": pa.array([3], pa.int64()), "x": pa.array([0], pa.int64()),
            "y": pa.array([0], pa.int64()), "priority": pa.array([1], pa.int64()),
            "rgb": pa.array([np.zeros((ts, ts, 3), np.uint8).tobytes()], pa.binary()),
            "alpha": pa.array([zero_alpha.tobytes()], pa.binary()),
        }
    )
    assert len(render._mosaic_group(g, ts)) == 0


def test_overview_uniform_children():
    ts = 8
    rgb = np.full((ts, ts, 3), 77, np.uint8)
    alpha = np.full((ts, ts), 255, np.uint8)
    g = pa.table(
        {
            "z": pa.array([5] * 4, pa.int64()),
            "x": pa.array([2, 3, 2, 3], pa.int64()),
            "y": pa.array([4, 4, 5, 5], pa.int64()),
            "px": pa.array([1] * 4, pa.int64()),
            "py": pa.array([2] * 4, pa.int64()),
            "rgb": pa.array([rgb.tobytes()] * 4, pa.binary()),
            "alpha": pa.array([alpha.tobytes()] * 4, pa.binary()),
        }
    )
    out = render._overview_group(g, ts)
    parent = np.frombuffer(out.column("rgb")[0].as_py(), np.uint8).reshape(ts, ts, 3)
    assert (parent == 77).all()
    pa_ = np.frombuffer(out.column("alpha")[0].as_py(), np.uint8).reshape(ts, ts)
    assert (pa_ == 255).all()
    assert out.column("z")[0].as_py() == 4
    assert out.column("x")[0].as_py() == 1 and out.column("y")[0].as_py() == 2


def test_overview_partial_children_alpha_weighting():
    ts = 4
    rgb = np.full((ts, ts, 3), 100, np.uint8)
    alpha = np.full((ts, ts), 255, np.uint8)
    # only one child (top-left quadrant) present
    g = pa.table(
        {
            "z": pa.array([5], pa.int64()), "x": pa.array([2], pa.int64()),
            "y": pa.array([4], pa.int64()), "px": pa.array([1], pa.int64()),
            "py": pa.array([2], pa.int64()),
            "rgb": pa.array([rgb.tobytes()], pa.binary()),
            "alpha": pa.array([alpha.tobytes()], pa.binary()),
        }
    )
    out = render._overview_group(g, ts)
    parent = np.frombuffer(out.column("rgb")[0].as_py(), np.uint8).reshape(ts, ts, 3)
    pa_ = np.frombuffer(out.column("alpha")[0].as_py(), np.uint8).reshape(ts, ts)
    h = ts // 2
    assert (parent[:h, :h] == 100).all()  # covered quadrant: full value
    assert (pa_[:h, :h] == 255).all()
    assert (pa_[h:, :] == 0).all() and (pa_[:, h:] == 0).all()  # empty quadrants


def test_pyramid_end_to_end(ray_session):
    import ray.data as rd

    rows = [
        _img_row(1, 50, 10.0, 20.0, 30.0, 40.0),
        _img_row(2, 150, 25.0, 30.0, 45.0, 50.0),
    ]
    ds = rd.from_arrow(_table(rows))
    levels = render.render_pyramid(ds, base_zoom=3, min_zoom=1, tile_size=16)
    base = levels[0].to_pandas()
    assert len(base) >= 1
    assert (base["checksum"] >= 0).all()
    top = levels[-1].to_pandas()
    assert len(top) >= 1
    assert (top["z"] == 1).all()
    # overlap region must have n_src == 2 somewhere at base zoom
    assert base["n_src"].max() == 2


def test_salted_mosaic_equals_single_stage(ray_session):
    import ray.data as rd

    rows = [
        _img_row(i, 30 + i * 40, 10.0 + i * 3, 20.0 + i * 2, 30.0 + i * 3, 40.0 + i * 2)
        for i in range(5)
    ]
    ds = rd.from_arrow(_table(rows))
    plain = render.render_base_tiles(ds, zoom=3, tile_size=16).to_pandas()
    salted = render.render_base_tiles(ds, zoom=3, tile_size=16, salt_bits=1).to_pandas()
    key = ["z", "x", "y"]
    p = plain.sort_values(key).reset_index(drop=True)
    s = salted.sort_values(key).reset_index(drop=True)
    assert len(p) == len(s)
    assert (p["checksum"].to_numpy() == s["checksum"].to_numpy()).all()
    assert (p["n_src"].to_numpy() == s["n_src"].to_numpy()).all()
    for a, b in zip(p["rgb"], s["rgb"]):
        assert a == b


def _quad_group(ts, rng, n_children=4, alpha_mode="mixed"):
    """4-child group with random pixels; alpha per pixel in {0,255}."""
    xs = [2, 3, 2, 3][:n_children]
    ys = [4, 4, 5, 5][:n_children]
    rgbs, alphas = [], []
    for _ in range(n_children):
        rgbs.append(rng.integers(0, 4, (ts, ts, 3)).astype(np.uint8) * 60)
        if alpha_mode == "full":
            alphas.append(np.full((ts, ts), 255, np.uint8))
        else:
            alphas.append((rng.integers(0, 2, (ts, ts)) * 255).astype(np.uint8))
    g = pa.table(
        {
            "z": pa.array([5] * n_children, pa.int64()),
            "x": pa.array(xs, pa.int64()),
            "y": pa.array(ys, pa.int64()),
            "px": pa.array([1] * n_children, pa.int64()),
            "py": pa.array([2] * n_children, pa.int64()),
            "rgb": pa.array([r.tobytes() for r in rgbs], pa.binary()),
            "alpha": pa.array([a.tobytes() for a in alphas], pa.binary()),
        }
    )
    # assemble the naive 2ts×2ts quad
    big = np.zeros((2 * ts, 2 * ts, 3), np.float64)
    ba = np.zeros((2 * ts, 2 * ts), np.float64)
    for i in range(n_children):
        qx, qy = (xs[i] & 1) * ts, (ys[i] & 1) * ts
        big[qy:qy + ts, qx:qx + ts] = rgbs[i]
        ba[qy:qy + ts, qx:qx + ts] = alphas[i] / 255.0
    return g, big, ba


def test_overview_nearest_matches_naive():
    ts = 8
    rng = np.random.default_rng(3)
    g, big, ba = _quad_group(ts, rng)
    out = render._overview_group(g, ts, "nearest")
    got = np.frombuffer(out.column("rgb")[0].as_py(), np.uint8).reshape(ts, ts, 3)
    ga = np.frombuffer(out.column("alpha")[0].as_py(), np.uint8).reshape(ts, ts)
    assert (got == big[::2, ::2].astype(np.uint8)).all()
    assert (ga == (ba[::2, ::2] * 255).astype(np.uint8)).all()


def test_overview_rms_matches_naive():
    ts = 8
    rng = np.random.default_rng(4)
    g, big, ba = _quad_group(ts, rng)
    out = render._overview_group(g, ts, "rms")
    got = np.frombuffer(out.column("rgb")[0].as_py(), np.uint8).reshape(ts, ts, 3)
    for oy in range(ts):
        for ox in range(ts):
            w = ba[2 * oy:2 * oy + 2, 2 * ox:2 * ox + 2]
            v = big[2 * oy:2 * oy + 2, 2 * ox:2 * ox + 2]
            for b in range(3):
                if w.sum() > 0:
                    exp = int(np.clip(np.round(np.sqrt((v[:, :, b] ** 2 * w).sum() / w.sum())), 0, 255))
                else:
                    exp = 0
                assert got[oy, ox, b] == exp, (oy, ox, b)


def test_overview_mode_matches_naive():
    ts = 8
    rng = np.random.default_rng(5)
    g, big, ba = _quad_group(ts, rng)
    out = render._overview_group(g, ts, "mode")
    got = np.frombuffer(out.column("rgb")[0].as_py(), np.uint8).reshape(ts, ts, 3)
    for oy in range(ts):
        for ox in range(ts):
            w = ba[2 * oy:2 * oy + 2, 2 * ox:2 * ox + 2].reshape(-1)
            v = big[2 * oy:2 * oy + 2, 2 * ox:2 * ox + 2].reshape(4, 3)
            for b in range(3):
                if w.sum() == 0:
                    exp = 0
                else:
                    # first max-count valid value in scan order
                    best, bestc = None, -1
                    for i in range(4):
                        if w[i] == 0:
                            continue
                        cnt = sum(1 for j in range(4) if w[j] > 0 and v[j, b] == v[i, b])
                        if cnt > bestc:
                            best, bestc = v[i, b], cnt
                    exp = int(best)
                assert got[oy, ox, b] == exp, (oy, ox, b)


def test_overview_average_unchanged_by_refactor():
    # golden: average method must produce the same result as the historical
    # premultiplied-accumulate implementation
    ts = 8
    rng = np.random.default_rng(6)
    g, big, ba = _quad_group(ts, rng)
    out = render._overview_group(g, ts)
    got = np.frombuffer(out.column("rgb")[0].as_py(), np.uint8).reshape(ts, ts, 3)
    acc = (big * ba[:, :, None]).reshape(ts, 2, ts, 2, 3).sum(axis=(1, 3))
    asum = ba.reshape(ts, 2, ts, 2).sum(axis=(1, 3))
    exp = np.where(asum[:, :, None] > 0,
                   np.round(acc / np.maximum(asum, 1e-12)[:, :, None]), 0)
    assert (got == np.clip(exp, 0, 255).astype(np.uint8)).all()


def test_overview_bad_method_raises():
    ts = 4
    rng = np.random.default_rng(7)
    g, _, _ = _quad_group(ts, rng)
    with pytest.raises(ValueError):
        render._overview_group(g, ts, "lanczos")


def test_overview_gauss_matches_naive():
    ts = 8
    rng = np.random.default_rng(6)
    g, big, ba = _quad_group(ts, rng)
    out = render._overview_group(g, ts, "gauss")
    got = np.frombuffer(out.column("rgb")[0].as_py(), np.uint8).reshape(ts, ts, 3)
    k = np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])
    for oy in range(ts):
        for ox in range(ts):
            acc = np.zeros(3)
            wacc = 0.0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    sy, sx = 2 * oy + dy, 2 * ox + dx
                    if 0 <= sy < 2 * ts and 0 <= sx < 2 * ts and ba[sy, sx] > 0:
                        w = k[dy + 1, dx + 1] * ba[sy, sx]
                        acc += w * big[sy, sx]
                        wacc += w
            exp = (np.clip(np.round(acc / wacc), 0, 255).astype(np.uint8)
                   if wacc > 0 else np.zeros(3, np.uint8))
            assert (got[oy, ox] == exp).all(), (oy, ox)


def test_overview_gauss_constant_preserved():
    ts = 8
    rgb = np.full((2 * ts, 2 * ts, 3), 77, np.uint8)
    g = pa.table(
        {
            "z": pa.array([3] * 4, pa.int64()),
            "x": pa.array([0, 1, 0, 1], pa.int64()),
            "y": pa.array([0, 0, 1, 1], pa.int64()),
            "px": pa.array([0] * 4, pa.int64()),
            "py": pa.array([0] * 4, pa.int64()),
            "rgb": pa.array([rgb[:ts, :ts].tobytes()] * 4, pa.binary()),
            "alpha": pa.array([np.full((ts, ts), 255, np.uint8).tobytes()] * 4,
                              pa.binary()),
        }
    )
    out = render._overview_group(g, ts, "gauss")
    got = np.frombuffer(out.column("rgb")[0].as_py(), np.uint8)
    assert (got == 77).all()


def test_fused_overviews_equal_per_level(ray_session):
    """overview_levels_fused must be byte-identical to chained
    overview_level calls — same reducer, one shuffle instead of n."""
    import ray.data as rd

    rows = [
        _img_row(1, 50, 10.0, 20.0, 30.0, 40.0),
        _img_row(2, 150, 25.0, 30.0, 45.0, 50.0),
        _img_row(3, 220, -60.0, -20.0, -30.0, 10.0),
    ]
    ds = rd.from_arrow(_table(rows))
    base = render.render_base_tiles(ds, zoom=4, tile_size=16).materialize()

    per_level = []
    cur = base
    for _ in range(3):
        cur = render.overview_level(cur, tile_size=16).materialize()
        per_level.append(cur)
    fused = render.overview_levels_fused(base, n_levels=3, tile_size=16)

    for lv_ref, lv_fused in zip(per_level, fused):
        a = lv_ref.to_pandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
        b = lv_fused.to_pandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert len(a) == len(b) and len(a) >= 1
        for col in ["z", "x", "y", "n_src", "checksum"]:
            assert (a[col] == b[col]).all(), col
        assert all(x == y for x, y in zip(a["rgb"], b["rgb"]))
        assert all(x == y for x, y in zip(a["alpha"], b["alpha"]))


def test_pyramid_fuse_span_chunking(ray_session):
    """render_pyramid with a small fuse_span (span chunking for deep
    pyramids) returns the same levels as one big fused span."""
    import ray.data as rd

    rows = [
        _img_row(1, 50, 10.0, 20.0, 30.0, 40.0),
        _img_row(2, 150, 25.0, 30.0, 45.0, 50.0),
    ]
    ds = rd.from_arrow(_table(rows))
    lv_a = render.render_pyramid(ds, base_zoom=4, min_zoom=1, tile_size=16, fuse_span=4)
    lv_b = render.render_pyramid(ds, base_zoom=4, min_zoom=1, tile_size=16, fuse_span=1)
    assert len(lv_a) == len(lv_b) == 4
    for da, db in zip(lv_a, lv_b):
        a = da.to_pandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
        b = db.to_pandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert len(a) == len(b)
        assert (a["checksum"] == b["checksum"]).all()
        assert all(x == y for x, y in zip(a["rgb"], b["rgb"]))


def test_render_pyramid_fused_equals_chained(ray_session):
    """render_pyramid_fused (base mosaic + overviews in ONE shuffle) must
    be byte-identical, level by level, to render_pyramid — including a
    depth that exceeds fuse_span (fallback spans) and n_src/checksum."""
    import ray.data as rd

    rows = [
        _img_row(1, 50, 10.0, 20.0, 30.0, 40.0),
        _img_row(2, 150, 25.0, 30.0, 45.0, 50.0),
        _img_row(3, 220, -60.0, -20.0, -30.0, 10.0),
        _img_row(4, 90, 12.0, 22.0, 28.0, 38.0),   # overlap for priority
    ]
    ds = rd.from_arrow(_table(rows))
    for min_zoom, fuse in ((2, 4), (0, 2)):  # within-span and fallback
        lv_ref = render.render_pyramid(ds, base_zoom=4, min_zoom=min_zoom,
                                       tile_size=16)
        lv_fused = render.render_pyramid_fused(ds, base_zoom=4,
                                               min_zoom=min_zoom,
                                               tile_size=16, fuse_span=fuse)
        assert len(lv_ref) == len(lv_fused) == 4 - min_zoom + 1
        for da, db in zip(lv_ref, lv_fused):
            a = da.to_pandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
            b = db.to_pandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
            assert len(a) == len(b) and len(a) >= 1
            for col in ["z", "x", "y", "n_src", "checksum"]:
                assert (a[col] == b[col]).all(), col
            assert all(x == y for x, y in zip(a["rgb"], b["rgb"]))
            assert all(x == y for x, y in zip(a["alpha"], b["alpha"]))
