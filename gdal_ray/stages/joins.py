"""Distributed join operators beyond hash-equi: as-of join, bbox range
join, and per-group top-N (window rank).

Reference parity: GDAL's only joins are the OGR SQL equi-join
(ogr/ogrsf_frmts/generic/ogr_gensql.cpp) and the spatial filter/layer
algebra family (ogrlayer.cpp:2129,3345) — the as-of and range joins here
are the Ray-Data-native generalizations the north star asks for
(point-sample "nearest lookup" of apps/gdallocationinfo.cpp; tile-index
range join of apps/gdalbuildvrt_lib.cpp / frmts/gti).

Scale notes (100 TB design point):
- as-of join shuffles both sides ONCE by key, then merges each group with
  a numpy searchsorted — no driver materialization, no nested loop.
- the bbox join replicates each box to the quadkey cells it covers and
  dedups multi-cell pairs with the *reference-point rule* (a pair is
  reported only by the cell containing the intersection's min corner), so
  no second dedup shuffle is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray import tilemath as tm


# ---------------------------------------------------------------------------
# as-of join (sorted merge per key group)

def asof_join(left_ds, right_ds, *, key: str, left_ts: str, right_ts: str,
              left_cols: list[str], right_cols: list[str], strict: bool = True,
              right_tie: str | None = None):
    """For each left row, the right row with the greatest ``right_ts`` that
    is < (strict) or <= left_ts, within the same ``key`` group; inner join
    (left rows with no match are dropped).

    Both inputs are shuffled once by ``key`` (groupby); the per-group merge
    is one np.searchsorted over the ts-sorted right side.

    ``right_tie`` names a right column used as a deterministic secondary
    sort key: among right rows sharing the max eligible ``right_ts``, the
    one with the greatest tie value wins (oracle: ORDER BY ts DESC, tie
    DESC LIMIT 1).  Without it, equal timestamps resolve by residual
    shuffle order.
    """
    l_schema = left_ds.schema().base_schema
    r_schema = right_ds.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in left_cols + [key, left_ts]}
    r_types = {c: r_schema.field(c).type for c in right_cols + [right_ts]}

    all_cols = (
        [key, "side"]
        + [f"l_{c}" for c in left_cols] + ["l_ts"]
        + [f"r_{c}" for c in right_cols] + ["r_ts"]
    )

    def tag_left(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {key: b.column(key), "side": pa.array(np.zeros(n, dtype=np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = b.column(c)
        cols["l_ts"] = b.column(left_ts).cast(pa.int64())
        for c in right_cols:
            cols[f"r_{c}"] = pa.nulls(n, r_types[c])
        cols["r_ts"] = pa.nulls(n, pa.int64())
        return pa.table({c: cols[c] for c in all_cols})

    def tag_right(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {key: b.column(key), "side": pa.array(np.ones(n, dtype=np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(n, l_types[c])
        cols["l_ts"] = pa.nulls(n, pa.int64())
        for c in right_cols:
            cols[f"r_{c}"] = b.column(c)
        cols["r_ts"] = b.column(right_ts).cast(pa.int64())
        return pa.table({c: cols[c] for c in all_cols})

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow")
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        # Arrow-native group merge: row selection via take() so int64
        # columns that carried nulls on the other side never get promoted
        # to float64 (the pandas path would NaN-promote them).
        side = g.column("side").to_numpy(zero_copy_only=False)
        l_rows = np.nonzero(side == 0)[0]
        r_rows = np.nonzero(side == 1)[0]
        if len(l_rows) == 0 or len(r_rows) == 0:
            return pa.table(
                {key: pa.nulls(0, l_types[key])}
                | {f"l_{c}": pa.nulls(0, l_types[c]) for c in left_cols}
                | {f"r_{c}": pa.nulls(0, r_types[c]) for c in right_cols}
            )
        r_ts = g.column("r_ts").to_numpy(zero_copy_only=False)[r_rows].astype(np.int64)
        if right_tie is not None:
            tie = g.column(f"r_{right_tie}").to_numpy(zero_copy_only=False)[r_rows]
            order = np.lexsort((tie, r_ts))
        else:
            order = np.argsort(r_ts, kind="mergesort")
        r_rows = r_rows[order]
        r_ts = r_ts[order]
        l_ts = g.column("l_ts").to_numpy(zero_copy_only=False)[l_rows].astype(np.int64)
        idx = np.searchsorted(r_ts, l_ts, side="left" if strict else "right") - 1
        keep = idx >= 0
        l_keep = pa.array(l_rows[keep])
        r_match = pa.array(r_rows[idx[keep]])
        cols = {key: g.column(key).take(l_keep)}
        for c in left_cols:
            cols[f"l_{c}"] = g.column(f"l_{c}").take(l_keep)
        for c in right_cols:
            cols[f"r_{c}"] = g.column(f"r_{c}").take(r_match)
        return pa.table(cols)

    return lt.union(rt).groupby(key).map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-group top-N (ORDER BY ... LIMIT N per key — the window-rank idiom)

def topn_per_group(ds, *, key: str, order_cols: list[str], ascending: list[bool],
                   n: int, rank_col: str = "rank"):
    """row_number() <= n per key group, deterministic total order required
    (pass tie-break columns in order_cols)."""

    import pyarrow.compute as _pc

    keys = [(c, "ascending" if a else "descending")
            for c, a in zip(order_cols, ascending)]

    def pick(g: pa.Table) -> pa.Table:
        idx = _pc.sort_indices(g, sort_keys=keys)[:n]  # Arrow sort is stable
        out = g.take(idx)
        return out.append_column(
            rank_col, pa.array(np.arange(1, len(out) + 1, dtype=np.int64)))

    return ds.groupby(key).map_groups(pick, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# bbox range join (cell-partitioned, reference-point dedup)

def _boxes_to_cells(ids, x0, y0, x1, y1, zoom: int, side: int, a_type, b_type):
    """Replicate each box to every cell its bbox covers; emit tagged rows.
    Each side fills only its own id column (a_id / b_id) so the union's
    schema stays consistent even when the two sides have different id types."""
    tx0, tx1, ty0, ty1 = tm.bbox_to_tile_range_xyz(x0, y0, x1, y1, np.int64(zoom))
    nx = (tx1 - tx0 + 1).astype(np.int64)
    ny = (ty1 - ty0 + 1).astype(np.int64)
    count = nx * ny
    idx = np.repeat(np.arange(len(ids), dtype=np.int64), count)
    starts = np.concatenate([[0], np.cumsum(count)[:-1]])
    ordinal = np.arange(int(count.sum()), dtype=np.int64) - np.repeat(starts, count)
    cx = tx0[idx] + ordinal % nx[idx]
    cy = ty0[idx] + ordinal // nx[idx]
    cell = tm.quadkey_int(cx, cy, np.int64(zoom))
    rep = np.asarray(ids, dtype=object)[idx]
    n = len(idx)
    return pa.table(
        {
            "cell_id": pa.array(cell, pa.int64()),
            "side": pa.array(np.full(n, side, dtype=np.int8)),
            "a_id": pa.array(rep, a_type) if side == 0 else pa.nulls(n, a_type),
            "b_id": pa.array(rep, b_type) if side == 1 else pa.nulls(n, b_type),
            "x0": pa.array(x0[idx], pa.float64()),
            "y0": pa.array(y0[idx], pa.float64()),
            "x1": pa.array(x1[idx], pa.float64()),
            "y1": pa.array(y1[idx], pa.float64()),
        }
    )


def bbox_join(a_ds, b_table: pa.Table, *, zoom: int = 4,
              a_cols=("box_id", "x0", "y0", "x1", "y1"),
              b_cols=("box_id", "x0", "y0", "x1", "y1"),
              emit: str = "ids"):
    """All (a, b) pairs whose bboxes intersect (closed intervals — the bbox
    pre-test of ogrlayer.cpp FilterGeometry).  Left side is a Dataset of
    boxes, right side a small-to-medium Arrow table that is also spread by
    cell (NOT broadcast — this is the shuffle plan; use PIPBroadcastJoin
    style for tiny sides).

    Dedup rule: a pair is emitted only by the cell that contains the
    intersection's min corner (max(ax0,bx0), max(ay0,by0)) — each
    intersecting pair has exactly one such cell, so no global dedup pass.
    """
    import ray.data as rd

    a_id_type = a_ds.schema().base_schema.field(a_cols[0]).type
    b_id_type = b_table.schema.field(b_cols[0]).type

    def tag_a(b: pa.Table) -> pa.Table:
        return _boxes_to_cells(
            b.column(a_cols[0]).to_numpy(zero_copy_only=False),
            *(b.column(c).to_numpy() for c in a_cols[1:]),
            zoom, 0, a_id_type, b_id_type,
        )

    b_cells = _boxes_to_cells(
        b_table.column(b_cols[0]).to_numpy(zero_copy_only=False),
        *(b_table.column(c).to_numpy() for c in b_cols[1:]),
        zoom, 1, a_id_type, b_id_type,
    )

    a_tagged = a_ds.map_batches(tag_a, batch_format="pyarrow")
    b_tagged = rd.from_arrow(b_cells)

    def join_group(g: pa.Table) -> pa.Table:
        # Arrow-native merge (take() row selection) so a_id/b_id keep their
        # declared types — the pandas path promotes null-carrying int64
        # columns to float64.
        side = g.column("side").to_numpy(zero_copy_only=False)
        a_rows = np.nonzero(side == 0)[0]
        b_rows = np.nonzero(side == 1)[0]
        if len(a_rows) == 0 or len(b_rows) == 0:
            cols = {"a_id": pa.nulls(0, a_id_type), "b_id": pa.nulls(0, b_id_type)}
            if emit == "overlay":
                for c in ("inter_w", "inter_h", "inter_area"):
                    cols[c] = pa.nulls(0, pa.float64())
            return pa.table(cols)
        cell = np.int64(g.column("cell_id")[0].as_py())
        x0 = g.column("x0").to_numpy(); y0 = g.column("y0").to_numpy()
        x1 = g.column("x1").to_numpy(); y1 = g.column("y1").to_numpy()
        ax0 = x0[a_rows]; ay0 = y0[a_rows]; ax1 = x1[a_rows]; ay1 = y1[a_rows]
        bx0 = x0[b_rows]; by0 = y0[b_rows]; bx1 = x1[b_rows]; by1 = y1[b_rows]
        zoom_ = np.int64(zoom)
        # full pairwise bbox-overlap mask (cells bound the group sizes)
        ov = (
            (bx0[None, :] <= ax1[:, None]) & (bx1[None, :] >= ax0[:, None])
            & (by0[None, :] <= ay1[:, None]) & (by1[None, :] >= ay0[:, None])
        )
        ai, bj = np.nonzero(ov)
        # reference point = min corner of the intersection bbox; the pair is
        # owned by exactly one cell — the one containing that point
        rx = np.maximum(ax0[ai], bx0[bj])
        ry = np.maximum(ay0[ai], by0[bj])
        tx, ty = tm.lonlat_to_tile_xyz(rx, ry, zoom_)
        own = tm.quadkey_int(tx, ty, zoom_) == cell
        cols = {
            "a_id": g.column("a_id").take(pa.array(a_rows[ai[own]])),
            "b_id": g.column("b_id").take(pa.array(b_rows[bj[own]])),
        }
        if emit == "overlay":
            # layer-algebra Intersection on boxes: exact extent + area
            # (each value is one identically-ordered float expression, so
            # the SQL oracle reproduces it bit-for-bit)
            iw = np.minimum(ax1[ai], bx1[bj]) - np.maximum(ax0[ai], bx0[bj])
            ih = np.minimum(ay1[ai], by1[bj]) - np.maximum(ay0[ai], by0[bj])
            cols["inter_w"] = pa.array(iw[own], pa.float64())
            cols["inter_h"] = pa.array(ih[own], pa.float64())
            cols["inter_area"] = pa.array((iw * ih)[own], pa.float64())
        return pa.table(cols)

    return a_tagged.union(b_tagged).groupby("cell_id").map_groups(
        join_group, batch_format="pyarrow"
    )


def spatial_join(a_ds, b_table: pa.Table, *, predicate: str = "intersects",
                 zoom: int = 4, a_id: str = "a_id", b_id: str = "b_id",
                 a_wkb: str = "wkb", b_wkb: str = "wkb"):
    """Predicate-refined spatial join — OGR's SetSpatialFilter bbox
    pre-test + exact Intersects/... refinement (ogrlayer.cpp
    FilterGeometry → ogrgeometry.cpp predicate), Ray-Data-shaped:

      1. per-batch bbox computation on both sides;
      2. the cell-bucketed bbox_join emits candidate (a, b) id pairs
         (min-corner owner rule — no dedup shuffle) — kept DISTRIBUTED;
      3. the pair stream and A's geometry rows co-partition on a_id
         (one exchange), and each group refines its candidates with the
         exact integer relate kernel (geometry/relate.py) against B's
         broadcast wkbs inside ``map_groups``.

    Contract: B (already a driver-side Arrow table in this signature) is
    broadcast-sized via one ``ray.put`` — driver state is O(|B|).  The
    candidate pair set scales with |A| and never materializes on the
    driver (round-5 fix; previously a driver dict + per-row Python
    refine).  A's geometry shuffles once, keyed by a_id (requires a_id
    unique in a_ds).  predicate ∈ {intersects, touches, overlaps,
    within, contains}.
    """
    import ray

    from gdal_ray.geometry.predicates import ring_bbox
    from gdal_ray.geometry.relate import relate_polygons
    from gdal_ray.geometry.wkb import polygon_rings

    def a_boxes(b: pa.Table) -> pa.Table:
        ids = b.column(a_id).to_pylist()
        rows = {"box_id": [], "x0": [], "y0": [], "x1": [], "y1": []}
        for i, w in zip(ids, b.column(a_wkb).to_pylist()):
            x0, y0, x1, y1 = ring_bbox(polygon_rings(w))
            rows["box_id"].append(i)
            rows["x0"].append(x0)
            rows["y0"].append(y0)
            rows["x1"].append(x1)
            rows["y1"].append(y1)
        return pa.table({
            "box_id": pa.array(rows["box_id"]),
            "x0": pa.array(rows["x0"], pa.float64()),
            "y0": pa.array(rows["y0"], pa.float64()),
            "x1": pa.array(rows["x1"], pa.float64()),
            "y1": pa.array(rows["y1"], pa.float64()),
        })

    b_ids = b_table.column(b_id).to_pylist()
    b_wkbs = b_table.column(b_wkb).to_pylist()
    bb = {"box_id": [], "x0": [], "y0": [], "x1": [], "y1": []}
    for i, w in zip(b_ids, b_wkbs):
        x0, y0, x1, y1 = ring_bbox(polygon_rings(w))
        bb["box_id"].append(i)
        bb["x0"].append(x0)
        bb["y0"].append(y0)
        bb["x1"].append(x1)
        bb["y1"].append(y1)
    b_boxes = pa.table({
        "box_id": pa.array(bb["box_id"]),
        "x0": pa.array(bb["x0"], pa.float64()),
        "y0": pa.array(bb["y0"], pa.float64()),
        "x1": pa.array(bb["x1"], pa.float64()),
        "y1": pa.array(bb["y1"], pa.float64()),
    })

    pairs = bbox_join(
        a_ds.map_batches(a_boxes, batch_format="pyarrow"), b_boxes,
        zoom=zoom, emit="ids")
    bref = ray.put(dict(zip(b_ids, b_wkbs)))  # O(|B|) — the only driver state

    # co-partition the (distributed) pair stream with A's geometry rows on
    # a_id: tag the two streams into one schema, ONE groupby exchange,
    # then each group holds its A wkb plus its candidate b_ids.
    a_id_type = b_table.schema.field(b_id).type  # b ids keep their type
    a_schema = a_ds.schema()  # ray.data Schema: parallel names/types lists
    a_key_type = a_schema.types[a_schema.names.index(a_id)]

    def tag_pairs(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("a_id").cast(a_key_type),
            "cand_b": t.column("b_id").cast(a_id_type),
            "geom": pa.nulls(len(t), pa.binary()),
            "side": pa.array(np.ones(len(t), dtype=np.int8)),
        })

    def tag_geoms(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column(a_id),
            "cand_b": pa.nulls(len(t), a_id_type),
            "geom": t.column(a_wkb).cast(pa.binary()),
            "side": pa.array(np.zeros(len(t), dtype=np.int8)),
        })

    tagged = pairs.map_batches(tag_pairs, batch_format="pyarrow").union(
        a_ds.map_batches(tag_geoms, batch_format="pyarrow"))

    def refine_group(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        geom_rows = np.nonzero(side == 0)[0]
        pair_rows = np.nonzero(side == 1)[0]
        empty = pa.table({a_id: pa.nulls(0, a_key_type),
                          b_id: pa.nulls(0, a_id_type)})
        if len(pair_rows) == 0 or len(geom_rows) == 0:
            return empty  # A row with no bbox candidates (common case)
        w = g.column("geom")[geom_rows[0]].as_py()
        key = g.column("k")[geom_rows[0]]
        bmap_m = ray.get(bref)
        keep = []
        for j in g.column("cand_b").take(pa.array(pair_rows)).to_pylist():
            if relate_polygons(w, bmap_m[j])[predicate]:
                keep.append(j)
        return pa.table({a_id: pa.array([key.as_py()] * len(keep),
                                        a_key_type),
                         b_id: pa.array(keep, a_id_type)})

    return tagged.groupby("k").map_groups(refine_group,
                                          batch_format="pyarrow")
