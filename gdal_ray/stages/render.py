"""Tile rendering + overview pyramid — the compute half of `gdal raster
tile` / gdal2tiles (reference: apps/gdalalg_raster_tile.cpp GenerateTile
:358-494 and GenerateOverviewTile :502; gdal2tiles.py create_base_tile
:1283 and create_overview_tile :1471; overview reducers gcore/overview.cpp).

Plan (SURVEY.md §2.11 "Ray mapping"):
- base level: each image renders its *contribution* to every XYZ tile its
  footprint covers (inverse-mapped nearest resample into mercator tile
  grid, vectorized per tile) → `groupby((z,x,y))` mosaics contributions
  last-on-top by explicit priority (gdalbuildvrt's input-order rule made
  explicit — never rely on arrival order);
- blank tiles (all-transparent) are dropped, mirroring the blank-tile
  skip (gdalalg_raster_tile.cpp:402-410);
- overview levels: `groupby(parent)` over ≤4 child tiles, alpha-weighted
  2×2 average reduction (overview.cpp average semantics with nodata/alpha
  weighting) — one Dataset stage per level, the groupby is the per-level
  barrier the reference enforces with WaitCompletion (:3033).

Tile pixels cross stages as fixed-size binary columns (tile_size²·3 rgb +
tile_size² alpha) — tile-sized payloads keyed by (z,x,y), exactly the
unit the reference writes to disk; raw source pixels never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray import tilemath as tm
from gdal_ray.codecs import decode_batch
from gdal_ray.stages.stats import checksum_image


def _tile_lonlat_axes(x: int, y: int, zoom: int, ts: int):
    """(lat[ts], lon[ts]) of pixel centers of XYZ tile (x, y) at `zoom` —
    mercator-spaced rows (the gdal2tiles tile grid), west→east cols,
    north→south rows."""
    ty_tms = (2**zoom - 1) - y
    mx0, my0, mx1, my1 = tm.tile_bounds_meters(np.int64(x), np.int64(ty_tms), np.int64(zoom))
    res = (mx1 - mx0) / ts
    mx = mx0 + (np.arange(ts, dtype=np.float64) + 0.5) * res
    my = my1 - (np.arange(ts, dtype=np.float64) + 0.5) * res
    lon, _ = tm.meters_to_lonlat(mx, np.zeros_like(mx))
    _, lat = tm.meters_to_lonlat(np.zeros_like(my), my)
    return lat, lon


def render_contributions(batch: pa.Table, *, zoom: int, tile_size: int = 64,
                         max_tiles_per_image: int = 64) -> pa.Table:
    """image rows → one contribution row per (tile × image): nearest-
    resampled rgb + coverage alpha, with explicit mosaic priority."""
    blobs = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    ids = batch.column("image_id").to_pylist()
    lon0 = batch.column("lon_min").to_numpy()
    lat0 = batch.column("lat_min").to_numpy()
    lon1 = batch.column("lon_max").to_numpy()
    lat1 = batch.column("lat_max").to_numpy()

    out = {"z": [], "x": [], "y": [], "priority": [], "rgb": [],
           "ry0": [], "ry1": [], "rx0": [], "rx1": []}
    zm = np.int64(zoom)
    # batch decode up front: JPEG rows share one pooled vectorized scan
    imgs = decode_batch(blobs, fmts)
    for i in range(len(blobs)):
        x0, x1, y0, y1 = tm.bbox_to_tile_range_xyz(
            np.float64(lon0[i]), np.float64(lat0[i]), np.float64(lon1[i]), np.float64(lat1[i]), zm
        )
        if (x1 - x0 + 1) * (y1 - y0 + 1) > max_tiles_per_image:
            # no-silent-caps: make the drop observable in worker logs
            import logging

            logging.getLogger(__name__).warning(
                "render: dropping image %s — footprint covers %d tiles at z=%d "
                "(max_tiles_per_image=%d)",
                ids[i], int((x1 - x0 + 1) * (y1 - y0 + 1)), zoom, max_tiles_per_image,
            )
            continue
        img = imgs[i]
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=2)
        h, w = img.shape[:2]
        dlon = lon1[i] - lon0[i]
        dlat = lat1[i] - lat0[i]
        prio = np.int64(int(ids[i].rsplit("-", 1)[-1]) if isinstance(ids[i], str) else i)
        for tx in range(int(x0), int(x1) + 1):
            for ty in range(int(y0), int(y1) + 1):
                lat, lon = _tile_lonlat_axes(tx, ty, zoom, tile_size)
                col = np.floor((lon - lon0[i]) / dlon * w).astype(np.int64)
                row = np.floor((lat1[i] - lat) / dlat * h).astype(np.int64)
                vc = (col >= 0) & (col < w)
                vr = (row >= 0) & (row < h)
                if not (vc.any() and vr.any()):
                    continue
                # coverage is always a RECTANGLE (outer(vr, vc)) — ship the
                # covered subrect + 4 ints, not a full-tile mask + zero
                # padding: ~30-45% fewer shuffle bytes per contribution
                ry0, ry1 = int(np.argmax(vr)), int(len(vr) - np.argmax(vr[::-1]))
                rx0, rx1 = int(np.argmax(vc)), int(len(vc) - np.argmax(vc[::-1]))
                rgb = img[
                    np.clip(row[ry0:ry1], 0, h - 1)[:, None],
                    np.clip(col[rx0:rx1], 0, w - 1)[None, :], :,
                ].astype(np.uint8)
                out["z"].append(zoom)
                out["x"].append(tx)
                out["y"].append(ty)
                out["priority"].append(prio)
                out["rgb"].append(np.ascontiguousarray(rgb).tobytes())
                out["ry0"].append(ry0)
                out["ry1"].append(ry1)
                out["rx0"].append(rx0)
                out["rx1"].append(rx1)
    return pa.table(
        {
            "z": pa.array(out["z"], pa.int64()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            "priority": pa.array(out["priority"], pa.int64()),
            "rgb": pa.array(out["rgb"], pa.binary()),
            "ry0": pa.array(out["ry0"], pa.int32()),
            "ry1": pa.array(out["ry1"], pa.int32()),
            "rx0": pa.array(out["rx0"], pa.int32()),
            "rx1": pa.array(out["rx1"], pa.int32()),
        }
    )


def _mosaic_rects_group(g: pa.Table, ts: int) -> pa.Table:
    """Composite RECT contributions (rgb subrect + bounds) last-on-top by
    explicit priority → one full tile (rgb, alpha-mask bytes) — the same
    output schema _mosaic_group emits, so overview/salt stages are
    agnostic to the slimmer contribution wire format."""
    prio = g.column("priority").to_numpy(zero_copy_only=False)
    order = np.argsort(prio, kind="stable")
    rgbs = g.column("rgb").to_pylist()
    ry0 = g.column("ry0").to_numpy(zero_copy_only=False)
    ry1 = g.column("ry1").to_numpy(zero_copy_only=False)
    rx0 = g.column("rx0").to_numpy(zero_copy_only=False)
    rx1 = g.column("rx1").to_numpy(zero_copy_only=False)
    canvas = np.zeros((ts, ts, 3), dtype=np.uint8)
    alpha = np.zeros((ts, ts), dtype=np.uint8)
    for i in order:
        y0, y1, x0, x1 = int(ry0[i]), int(ry1[i]), int(rx0[i]), int(rx1[i])
        rgb = np.frombuffer(rgbs[i], dtype=np.uint8).reshape(y1 - y0, x1 - x0, 3)
        canvas[y0:y1, x0:x1] = rgb
        alpha[y0:y1, x0:x1] = 255
    if not alpha.any():  # unreachable for non-empty rects; kept for safety
        return _empty_tile_table()
    return pa.table(
        {
            "z": pa.array([int(g.column("z")[0].as_py())], pa.int64()),
            "x": pa.array([int(g.column("x")[0].as_py())], pa.int64()),
            "y": pa.array([int(g.column("y")[0].as_py())], pa.int64()),
            "n_src": pa.array([len(g)], pa.int64()),
            "rgb": pa.array([canvas.tobytes()], pa.binary()),
            "alpha": pa.array([alpha.tobytes()], pa.binary()),
            "checksum": pa.array([int(checksum_image(canvas))], pa.int64()),
        }
    )


def _mosaic_group(g: pa.Table, ts: int) -> pa.Table:
    """Composite contributions last-on-top by explicit priority.
    Arrow-native (no pandas round-trip — keeps shuffle blocks free of the
    unhashable pandas schema metadata and its conversion cost)."""
    prio = g.column("priority").to_numpy(zero_copy_only=False)
    order = np.argsort(prio, kind="stable")
    rgbs = g.column("rgb").to_pylist()
    alphas = g.column("alpha").to_pylist()
    canvas = np.zeros((ts, ts, 3), dtype=np.uint8)
    alpha = np.zeros((ts, ts), dtype=np.uint8)
    for i in order:
        rgb = np.frombuffer(rgbs[i], dtype=np.uint8).reshape(ts, ts, 3)
        a = np.frombuffer(alphas[i], dtype=np.uint8).reshape(ts, ts)
        m = a > 0
        canvas[m] = rgb[m]
        alpha[m] = 255
    if not alpha.any():  # blank-tile skip (gdalalg_raster_tile.cpp:402)
        return _empty_tile_table()
    return pa.table(
        {
            "z": pa.array([int(g.column("z")[0].as_py())], pa.int64()),
            "x": pa.array([int(g.column("x")[0].as_py())], pa.int64()),
            "y": pa.array([int(g.column("y")[0].as_py())], pa.int64()),
            "n_src": pa.array([len(g)], pa.int64()),
            "rgb": pa.array([canvas.tobytes()], pa.binary()),
            "alpha": pa.array([alpha.tobytes()], pa.binary()),
            "checksum": pa.array([int(checksum_image(canvas))], pa.int64()),
        }
    )


def _empty_tile_table() -> pa.Table:
    return pa.table(
        {
            "z": pa.nulls(0, pa.int64()),
            "x": pa.nulls(0, pa.int64()),
            "y": pa.nulls(0, pa.int64()),
            "n_src": pa.nulls(0, pa.int64()),
            "rgb": pa.nulls(0, pa.binary()),
            "alpha": pa.nulls(0, pa.binary()),
            "checksum": pa.nulls(0, pa.int64()),
        }
    )


def render_base_tiles(images_ds, *, zoom: int, tile_size: int = 64,
                      salt_bits: int | None = None):
    """images → mosaicked base tiles Dataset (z,x,y,n_src,rgb,alpha,checksum).

    ``salt_bits``: two-stage salted reduce for hot tiles (north rule
    "salted shuffles for hot cells").  Salt = priority >> salt_bits —
    CONTIGUOUS priority ranges, so partial mosaics composite in salt order
    with last-on-top preserved exactly (overlay over ordered ranges is
    associative; a hash salt would interleave priorities and break the
    gdalbuildvrt order rule).  Stage 1 reduces (z,x,y,salt) partials;
    stage 2 merges the ≤2^k partials per tile.  Results are byte-identical
    to the single-stage plan (pytest-verified)."""
    contrib = images_ds.map_batches(
        lambda b: render_contributions(b, zoom=zoom, tile_size=tile_size),
        batch_format="pyarrow",
        batch_size=None,  # follow blocks — keeps task concurrency at num_cpus
    )
    if salt_bits is None:
        # coarse-bucket shuffle (single small-cardinality key) + per-tile
        # sub-grouping inside the task: same per-tile output, ~an order of
        # magnitude less shuffle machinery than a 3-key sample-sort
        return _per_tile_reduce(
            contrib, ["z", "x", "y"], lambda g: _mosaic_rects_group(g, tile_size)
        )

    def add_salt(b: pa.Table) -> pa.Table:
        return b.append_column(
            "salt", pa.array(b.column("priority").to_numpy() >> salt_bits, pa.int64())
        )

    def partial_mosaic(g: pa.Table) -> pa.Table:
        out = _mosaic_rects_group(g, tile_size)
        if len(out) == 0:
            return out.append_column("priority", pa.nulls(0, pa.int64()))
        # partial keeps its salt as the priority for the stage-2 composite
        return out.append_column(
            "priority", pa.array([int(g.column("salt")[0].as_py())], pa.int64())
        )

    salted = contrib.map_batches(add_salt, batch_format="pyarrow")
    partials = salted.groupby(["z", "x", "y", "salt"]).map_groups(
        partial_mosaic, batch_format="pyarrow"
    )

    def final_mosaic(g: pa.Table) -> pa.Table:
        out = _mosaic_group(g, tile_size)
        if len(out):
            n_src = int(np.sum(g.column("n_src").to_numpy(zero_copy_only=False)))
            out = out.set_column(
                out.schema.get_field_index("n_src"), "n_src", pa.array([n_src], pa.int64())
            )
        return out

    return partials.groupby(["z", "x", "y"]).map_groups(final_mosaic, batch_format="pyarrow")


def _per_tile_reduce(ds, keys: list[str], group_fn, num_buckets: int = 64):
    """groupby(keys).map_groups(group_fn) via a hash-bucket shuffle: rows
    bucket by hash(keys)%B (one int64 sort key), each bucket task splits
    its rows into exact key groups with one argsort and runs group_fn per
    group.  Identical outputs, far cheaper shuffle."""

    def bucketize(b: pa.Table) -> pa.Table:
        h = np.zeros(len(b), dtype=np.uint64)
        for k in keys:
            v = b.column(k).to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h ^= (v + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xC2B2AE3D27D4EB4F)
                h ^= h >> np.uint64(29)
        return b.append_column("bucket", pa.array((h % num_buckets).astype(np.int64)))

    def reduce_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        cols = [g.column(k).to_numpy(zero_copy_only=False) for k in keys]
        order = np.lexsort(cols[::-1])
        sorted_keys = np.stack([c[order] for c in cols], axis=1)
        newgrp = np.ones(len(order), dtype=bool)
        if len(order):
            newgrp[1:] = (sorted_keys[1:] != sorted_keys[:-1]).any(axis=1)
        starts = np.nonzero(newgrp)[0]
        ends = np.append(starts[1:], len(order))
        outs = []
        for s, e in zip(starts, ends):
            sub = g.take(pa.array(order[s:e]))
            out = group_fn(sub)
            if len(out):
                outs.append(out)
        if not outs:
            # every group was blank-skipped — emit the group_fn's empty shape
            return group_fn(g.slice(0, 0))
        return pa.concat_tables(outs)

    return ds.map_batches(bucketize, batch_format="pyarrow").groupby("bucket").map_groups(
        reduce_bucket, batch_format="pyarrow"
    )


def _overview_reduce(big: np.ndarray, ba: np.ndarray, ts: int, method: str):
    """2ts×2ts assembled quad (raw rgb `big`, alpha weight `ba` in [0,1]) →
    ts×ts (rgb uint8, alpha uint8) per `method`, mirroring the
    gcore/overview.cpp resampler dispatch (:4223):

    - ``average``: alpha-weighted 2×2 mean (GDALResampleChunk_AverageOrRMS
      average branch, :1787) — nodata/alpha-weighted, round-half-up.
    - ``rms``: alpha-weighted root-mean-square of the window (same
      function's RMS branch — used for terrain/elevation overviews).
    - ``nearest``: top-left pixel of each 2×2 window
      (GDALResampleChunk_Near :158 — floor(dst·ratio) source index).
    - ``mode``: most frequent valid value per band in the window
      (GDALResampleChunk_Mode :2129); ties break to the value first seen
      in row-major scan order, like the reference's first-max-count rule.
    """
    asum = ba.reshape(ts, 2, ts, 2).sum(axis=(1, 3))
    if method == "nearest":
        rgb_out = big[::2, ::2, :].astype(np.uint8)
        alpha_out = np.round(ba[::2, ::2] * 255.0).astype(np.uint8)
        return rgb_out, alpha_out
    if method in ("average", "rms"):
        vals = big * ba[:, :, None]
        if method == "rms":
            vals = big * big * ba[:, :, None]
        acc = vals.reshape(ts, 2, ts, 2, 3).sum(axis=(1, 3))
        with np.errstate(invalid="ignore"):
            mean = acc / np.maximum(asum, 1e-12)[:, :, None]
            if method == "rms":
                mean = np.sqrt(mean)
            rgb_out = np.where(asum[:, :, None] > 0, np.round(mean), 0)
        rgb_out = np.clip(rgb_out, 0, 255).astype(np.uint8)
        alpha_out = np.round(asum / 4.0 * 255.0).astype(np.uint8)
        return rgb_out, alpha_out
    if method == "gauss":
        # GDALResampleChunk_Gauss (gcore/overview.cpp:1842): for a 2×
        # reduction, each dst pixel is the [1 2 1; 2 4 2; 1 2 1]/16-
        # weighted mean of the 3×3 source window centered at (2i, 2j);
        # out-of-window/transparent samples drop out and the remaining
        # weights renormalize (alpha-weighted like the reference's
        # nodata handling).  Window clips at the quad edge exactly as
        # the reference clips at the raster edge.
        kw = np.array([1.0, 2.0, 1.0])
        pad_v = np.zeros((2 * ts + 2, 2 * ts + 2, 3))
        pad_a = np.zeros((2 * ts + 2, 2 * ts + 2))
        pad_v[1:-1, 1:-1] = big * ba[:, :, None]
        pad_a[1:-1, 1:-1] = ba
        acc = np.zeros((ts, ts, 3))
        wacc = np.zeros((ts, ts))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                w = kw[dy + 1] * kw[dx + 1]
                ys = slice(1 + dy, 1 + dy + 2 * ts, 2)
                xs = slice(1 + dx, 1 + dx + 2 * ts, 2)
                acc += w * pad_v[ys, xs]
                wacc += w * pad_a[ys, xs]
        with np.errstate(invalid="ignore"):
            mean = acc / np.maximum(wacc, 1e-12)[:, :, None]
        rgb_out = np.where(wacc[:, :, None] > 0, np.round(mean), 0)
        rgb_out = np.clip(rgb_out, 0, 255).astype(np.uint8)
        alpha_out = np.round(asum / 4.0 * 255.0).astype(np.uint8)
        return rgb_out, alpha_out
    if method == "mode":
        # candidates in row-major window order (0,0),(0,1),(1,0),(1,1)
        q = big.reshape(ts, 2, ts, 2, 3)
        m = (ba.reshape(ts, 2, ts, 2) > 0)
        cand = np.stack([q[:, dy, :, dx, :] for dy in (0, 1) for dx in (0, 1)])  # (4,ts,ts,3)
        valid = np.stack([m[:, dy, :, dx] for dy in (0, 1) for dx in (0, 1)])    # (4,ts,ts)
        # count_i = Σ_j valid_j ∧ (v_j == v_i); invalid candidates count -1
        eq = cand[:, None, ...] == cand[None, ...]                # (4,4,ts,ts,3)
        counts = (eq & valid[None, :, :, :, None]).sum(axis=1)    # (4,ts,ts,3)
        counts = np.where(valid[:, :, :, None], counts, -1)
        # first max-count in scan order: argmax picks the lowest index on ties
        pick = counts.argmax(axis=0)                              # (ts,ts,3)
        rgb_out = np.take_along_axis(cand, pick[None, ...], axis=0)[0].astype(np.uint8)
        any_valid = valid.any(axis=0)
        rgb_out = np.where(any_valid[:, :, None], rgb_out, 0).astype(np.uint8)
        alpha_out = np.where(any_valid, 255, 0).astype(np.uint8)
        return rgb_out, alpha_out
    raise ValueError(f"unknown overview resampler {method!r} "
                     "(supported: average, rms, nearest, mode, gauss)")


def _overview_group(g: pa.Table, ts: int, method: str = "average") -> pa.Table:
    """≤4 children → parent tile via the selected 2×2 reducer
    (overview.cpp resampler dispatch).  Arrow-native."""
    if len(g) == 0:
        # typed empty table — preserves the operator's output schema so Ray
        # never sees a schema-less RefBundle from an all-blank bucket
        return _empty_tile_table()
    big = np.zeros((2 * ts, 2 * ts, 3), dtype=np.float64)
    ba = np.zeros((2 * ts, 2 * ts), dtype=np.float64)
    z = int(g.column("z")[0].as_py())
    px = int(g.column("px")[0].as_py())
    py = int(g.column("py")[0].as_py())
    xs = g.column("x").to_numpy(zero_copy_only=False)
    ys = g.column("y").to_numpy(zero_copy_only=False)
    rgbs = g.column("rgb").to_pylist()
    alphas = g.column("alpha").to_pylist()
    for i in range(len(g)):
        qx = (int(xs[i]) & 1) * ts
        qy = (int(ys[i]) & 1) * ts
        rgb = np.frombuffer(rgbs[i], dtype=np.uint8).reshape(ts, ts, 3).astype(np.float64)
        a = np.frombuffer(alphas[i], dtype=np.uint8).reshape(ts, ts).astype(np.float64) / 255.0
        big[qy : qy + ts, qx : qx + ts, :] = rgb
        ba[qy : qy + ts, qx : qx + ts] = a
    rgb_out, alpha_out = _overview_reduce(big, ba, ts, method)
    return pa.table(
        {
            "z": pa.array([z - 1], pa.int64()),
            "x": pa.array([px], pa.int64()),
            "y": pa.array([py], pa.int64()),
            "n_src": pa.array([len(g)], pa.int64()),
            "rgb": pa.array([rgb_out.tobytes()], pa.binary()),
            "alpha": pa.array([alpha_out.tobytes()], pa.binary()),
            "checksum": pa.array([int(checksum_image(rgb_out))], pa.int64()),
        }
    )


def overview_level(tiles_ds, *, tile_size: int = 64, method: str = "average"):
    """One pyramid step: tiles at level z → tiles at level z-1.  The
    groupby(parent) is the per-level barrier (WaitCompletion :3033).
    ``method`` selects the 2×2 reducer per gcore/overview.cpp:4223
    dispatch: average (default) | rms | nearest | mode | gauss."""
    def key(b: pa.Table) -> pa.Table:
        return b.append_column("px", pa.array(b.column("x").to_numpy() >> 1, pa.int64())) \
                .append_column("py", pa.array(b.column("y").to_numpy() >> 1, pa.int64()))

    keyed = tiles_ds.map_batches(key, batch_format="pyarrow")
    return _per_tile_reduce(
        keyed, ["px", "py"], lambda g: _overview_group(g, tile_size, method)
    )


def _sub_pyramid_levels(cur: pa.Table, n: int, tile_size: int,
                        method: str) -> pa.Table:
    """n pyramid steps over one locality group's tile table — returns the
    concat of the n PARENT levels (input level excluded), byte-identical
    to chained _overview_group reductions."""
    outs = []
    for _ in range(n):
        xs = cur.column("x").to_numpy(zero_copy_only=False)
        ys = cur.column("y").to_numpy(zero_copy_only=False)
        px, py = xs >> 1, ys >> 1
        order = np.lexsort((py, px))
        newg = np.ones(len(order), dtype=bool)
        newg[1:] = (px[order][1:] != px[order][:-1]) | \
            (py[order][1:] != py[order][:-1])
        starts = np.flatnonzero(newg)
        ends = np.append(starts[1:], len(order))
        keyed = cur.append_column("px", pa.array(px, pa.int64())) \
                   .append_column("py", pa.array(py, pa.int64()))
        parents = [
            _overview_group(keyed.take(pa.array(order[s:e])), tile_size, method)
            for s, e in zip(starts, ends)
        ]
        cur = pa.concat_tables(parents)
        outs.append(cur)
    return pa.concat_tables(outs)


def overview_levels_fused(tiles_ds, *, n_levels: int, tile_size: int = 64,
                          method: str = "average"):
    """`n_levels` pyramid steps in ONE shuffle: tiles bucket by their
    level-(z−n) ancestor (x≫n, y≫n), and each group builds its whole
    sub-pyramid locally by calling the identical per-parent reducer
    (_overview_group) level by level — outputs are byte-identical to n
    chained overview_level calls (pytest-pinned) at 1/n the shuffle count.

    Why: each overview level holds 4× fewer tiles than the last, so by
    level 2 a cluster-wide Sort + materialize barrier is pure fixed
    overhead — the per-level plan's wall time stops scaling with CPUs.
    Group sizes are bounded by 4^n child tiles (callers chunk deep
    pyramids into fused spans, render_pyramid's fuse_span)."""
    n = n_levels

    def key(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ax", pa.array(b.column("x").to_numpy() >> n, pa.int64())
        ).append_column("ay", pa.array(b.column("y").to_numpy() >> n, pa.int64()))

    def sub_pyramid(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _empty_tile_table()
        return _sub_pyramid_levels(g.drop_columns(["ax", "ay"]), n,
                                   tile_size, method)

    keyed = tiles_ds.map_batches(key, batch_format="pyarrow")
    combined = _per_tile_reduce(keyed, ["ax", "ay"], sub_pyramid).materialize()
    base_z = None
    for b in combined.iter_batches(batch_format="pyarrow", batch_size=1):
        base_z = int(pc.max(b.column("z")).as_py())
        break
    if base_z is None:  # empty input
        return [combined for _ in range(n)]
    return [combined.filter(expr=f"z == {base_z - i}") for i in range(n)]


def render_pyramid(images_ds, *, base_zoom: int, min_zoom: int, tile_size: int = 64,
                   method: str = "average", fuse_span: int = 4):
    """Full pyramid: list of per-level tile Datasets, base first.

    Overview levels are computed in FUSED spans of ≤`fuse_span` levels —
    one shuffle per span (overview_levels_fused) instead of one per level.
    Each span is materialized before the next starts — the explicit
    barrier of the reference (WaitCompletion :3033), and it keeps level
    z-1 from lazily re-executing the whole base render when both are
    consumed.  What is held is tiles (bounded: 4^z × tile payload), never
    source images; at design scale each span would instead be written
    through the manifest sink and re-read.  fuse_span bounds the local
    group to 4^span child tiles (span 4 ⇒ ≤256 tiles ≈ 3 MB at ts=64)."""
    levels = [render_base_tiles(images_ds, zoom=base_zoom, tile_size=tile_size).materialize()]
    remaining = base_zoom - min_zoom
    while remaining > 0:
        span = min(fuse_span, remaining)
        if span == 1:
            levels.append(
                overview_level(levels[-1], tile_size=tile_size, method=method).materialize()
            )
        else:
            levels.extend(
                overview_levels_fused(
                    levels[-1], n_levels=span, tile_size=tile_size, method=method
                )
            )
        remaining -= span
    return levels


def render_pyramid_fused(images_ds, *, base_zoom: int, min_zoom: int,
                         tile_size: int = 64, method: str = "average",
                         fuse_span: int = 4, split_levels: bool = True):
    """Whole pyramid — base mosaic AND overview levels — in ONE shuffle.

    Contributions key directly by their `min_zoom` ancestor (x≫n, y≫n);
    each ancestor group mosaics its ≤4ⁿ base tiles and builds the whole
    sub-pyramid locally with the very kernels the chained plan uses
    (_mosaic_rects_group per tile, then _sub_pyramid_levels) — outputs
    are byte-identical to render_pyramid (pytest-pinned), at one shuffle
    + one materialize instead of 1 + ⌈n/span⌉ of each.

    Why: at bench scale every extra Ray pass over the (small) tile table
    costs fixed Sort/barrier seconds that no CPU count removes; fusing
    the base reduce with the pyramid removes the second pass entirely.
    Skew bound: a group is one level-`min_zoom` ancestor = 4ⁿ base tiles'
    contributions (n ≤ `fuse_span`; deeper pyramids fall back to
    render_pyramid's spans after the first fused block).  A hot ancestor
    therefore costs 4ⁿ × the base plan's hot-tile group — keep
    `fuse_span` small (default 4 ⇒ ≤256 tiles) or use salt_bits plans
    for pathological hot spots.

    Returns the same `levels` list contract as render_pyramid (base
    first), as filtered views of the single combined Dataset — or, with
    ``split_levels=False``, the combined Dataset itself (all levels, `z`
    column distinguishes; count() is then materialize-metadata-free).
    """
    n = base_zoom - min_zoom
    if n == 0:
        base = render_base_tiles(images_ds, zoom=base_zoom,
                                 tile_size=tile_size).materialize()
        return base if not split_levels else [base]
    if n > fuse_span:
        # first fused block from contributions, remaining spans tile-wise
        levels = render_pyramid_fused(
            images_ds, base_zoom=base_zoom, min_zoom=base_zoom - fuse_span,
            tile_size=tile_size, method=method, fuse_span=fuse_span)
        remaining = n - fuse_span
        while remaining > 0:
            span = min(fuse_span, remaining)
            levels.extend(overview_levels_fused(
                levels[-1], n_levels=span, tile_size=tile_size, method=method))
            remaining -= span
        if not split_levels:
            out = levels[0]
            for lv in levels[1:]:
                out = out.union(lv)
            return out
        return levels

    contrib = images_ds.map_batches(
        lambda b: render_contributions(b, zoom=base_zoom, tile_size=tile_size),
        batch_format="pyarrow",
        batch_size=None,
    )

    def key(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ax", pa.array(b.column("x").to_numpy() >> n, pa.int64())
        ).append_column(
            "ay", pa.array(b.column("y").to_numpy() >> n, pa.int64()))

    def pyramid_group(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _empty_tile_table()
        g = g.drop_columns(["ax", "ay"])
        xs = g.column("x").to_numpy(zero_copy_only=False)
        ys = g.column("y").to_numpy(zero_copy_only=False)
        order = np.lexsort((ys, xs))
        newt = np.ones(len(order), dtype=bool)
        newt[1:] = (xs[order][1:] != xs[order][:-1]) | \
            (ys[order][1:] != ys[order][:-1])
        starts = np.flatnonzero(newt)
        ends = np.append(starts[1:], len(order))
        base = pa.concat_tables([
            _mosaic_rects_group(g.take(pa.array(order[s:e])), tile_size)
            for s, e in zip(starts, ends)
        ])
        if len(base) == 0:   # all-blank ancestor (alpha-skip)
            return _empty_tile_table()
        return pa.concat_tables(
            [base, _sub_pyramid_levels(base, n, tile_size, method)])

    keyed = contrib.map_batches(key, batch_format="pyarrow")
    combined = _per_tile_reduce(keyed, ["ax", "ay"], pyramid_group).materialize()
    if not split_levels:
        return combined
    return [combined.filter(expr=f"z == {base_zoom - i}")
            for i in range(n + 1)]
