"""k-nearest-neighbor lookup over a points table.

The reference accelerates scattered-point kNN with a quadtree
(port/cpl_quad_tree.cpp, queried per grid cell in alg/gdalgrid.cpp:260-426,
including the per-quadrant nearest variant).  Our distributed design
(SURVEY.md §2.3): queries are broadcast (`ray.put` once), each
``map_batches`` task computes exact distances from its candidate block to
every query and emits per-batch top-k partials; a final
``groupby(query_id).map_groups`` merges partials into the global top-k.
This is all-reduce-style — no all-to-all shuffle of the points, only
k·n_queries partial rows move.

A cell-bucketed variant (per-cell candidate pruning with ring expansion)
is layered on top for design scale: points are keyed by quadkey cell and
only cells within the query's current search ring are scanned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class KnnPartial:
    """Actor-pool stage: per-batch exact top-k against broadcast queries."""

    def __init__(self, queries_ref=None, queries: np.ndarray | None = None, query_ids=None, k: int = 5):
        import ray

        if queries is None:
            queries, query_ids = ray.get(queries_ref[0])
        self.q = np.asarray(queries, dtype=np.float64)  # (m, 2)
        self.qids = np.asarray(query_ids, dtype=np.int64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column("px").to_numpy()
        py = batch.column("py").to_numpy()
        pid = batch.column("point_id").to_numpy()
        # (m, n) squared distances, vectorized
        dx = self.q[:, 0:1] - px[None, :]
        dy = self.q[:, 1:2] - py[None, :]
        d2 = dx * dx + dy * dy
        k = min(self.k, d2.shape[1])
        # deterministic tie-break: order by (d2, point_id)
        order = np.lexsort((np.broadcast_to(pid, d2.shape), d2), axis=1)[:, :k]
        m = self.q.shape[0]
        qid_out = np.repeat(self.qids, k)
        nid_out = pid[order].reshape(-1)
        d2_out = np.take_along_axis(d2, order, axis=1).reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qid_out, pa.int64()),
                "neighbor_id": pa.array(nid_out.astype(np.int64), pa.int64()),
                "d2": pa.array(d2_out, pa.float64()),
            }
        )


def knn_finalize(k: int):
    """groupby(query_id).map_groups reducer: merge per-batch partials.

    Arrow-native (pandas round-trips re-attach unhashable schema metadata
    and warn per reduce task — see BASELINE notes).
    """

    def fin(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("d2", "ascending"), ("neighbor_id", "ascending")]
        )[:k]
        g = g.take(idx).select(["query_id", "neighbor_id"])
        return g.append_column("rank", pa.array(np.arange(1, len(g) + 1, dtype=np.int64)))

    return fin


def knn_topk(points_ds, queries: np.ndarray, query_ids, k: int = 5, concurrency: int | None = None):
    """points_ds: Dataset with (point_id:int64, px, py) -> Dataset of
    (query_id, neighbor_id, rank)."""
    import ray

    ref = ray.put((np.asarray(queries, dtype=np.float64), np.asarray(query_ids, dtype=np.int64)))
    partial = points_ds.map_batches(
        KnnPartial,
        fn_constructor_kwargs={"queries_ref": [ref], "k": k},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=concurrency or (1, 4),
    )
    return partial.groupby("query_id").map_groups(knn_finalize(k), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cell-bucketed kNN with ring expansion (the design-scale path: per-cell
# candidate pruning mirroring CPLQuadTree search, alg/gdalgrid.cpp:260-426)

def _cell_bounds_deg(zoom: int):
    """bbox (lon0, lat0, lon1, lat1) of every XYZ cell at `zoom` (mercator
    tiles → lat edges vary per row)."""
    from gdal_ray import tilemath as tm

    n = 2**zoom
    xs = np.arange(n, dtype=np.int64)
    out = {}
    for y in range(n):
        lon0, lat0, lon1, lat1 = tm.tile_bounds_lonlat_xyz(xs, np.full(n, y, dtype=np.int64), np.int64(zoom))
        for x in range(n):
            out[(x, y)] = (lon0[x], lat0[x], lon1[x], lat1[x])
    return out


def _bbox_dist2(qx, qy, b):
    dx = np.maximum(np.maximum(b[0] - qx, qx - b[2]), 0.0)
    dy = np.maximum(np.maximum(b[1] - qy, qy - b[3]), 0.0)
    return dx * dx + dy * dy


def _bbox_maxdist2(qx, qy, b):
    dx = np.maximum(np.abs(qx - b[0]), np.abs(qx - b[2]))
    dy = np.maximum(np.abs(qy - b[1]), np.abs(qy - b[3]))
    return dx * dx + dy * dy


def knn_cell_ring(points_ds, queries: np.ndarray, query_ids, k: int = 5, zoom: int = 3):
    """Exact kNN via cell pruning: (1) tiny per-cell count aggregate;
    (2) per query select cells nearest-bbox-first until ≥k candidates, then
    extend by the max-corner bound so the prefix provably contains the true
    top-k; (3) per-cell groupby scans only cells some query selected.

    Equivalent to knn_topk (pytest-verified); scans a vanishing fraction
    of cells at design scale instead of every block.

    Scale bound: the per-cell count directory and the per-query selection
    run driver-side over the 4^zoom cell grid — cheap through zoom≈8
    (65k cells); beyond that the directory itself should become a
    hierarchy (coarse-zoom counts first, refine selected subtrees), which
    is a straightforward extension of the same bbox bounds.  The heavy
    data (points) never leaves the cluster either way.
    """
    import ray
    from ray.data.aggregate import Count

    from gdal_ray import tilemath as tm
    from gdal_ray.stages.pip import points_with_cell

    q = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)

    keyed = points_ds.map_batches(lambda b: points_with_cell(b, zoom=zoom), batch_format="pyarrow")
    counts = {
        int(r["cell_id"]): int(r["n"])
        for r in keyed.groupby("cell_id").aggregate(Count(alias_name="n")).take_all()
    }
    bounds = _cell_bounds_deg(zoom)
    cell_ids = {
        (x, y): int(tm.quadkey_int(np.int64(x), np.int64(y), np.int64(zoom)))
        for (x, y) in bounds
    }

    # per-query cell selection (driver-side over ≤4^zoom cells — tiny)
    selected: dict[int, list[int]] = {}
    for qi in range(len(q)):
        qx, qy = q[qi]
        items = []
        for xy, b in bounds.items():
            cid = cell_ids[xy]
            if counts.get(cid, 0) == 0:
                continue
            items.append((_bbox_dist2(qx, qy, b), _bbox_maxdist2(qx, qy, b), cid))
        items.sort()
        acc, bound = 0, np.inf
        prefix = []
        for mind2, maxd2, cid in items:
            if acc >= k and mind2 > bound:
                break
            prefix.append(cid)
            acc += counts[cid]
            if acc >= k:
                bound = min(bound, max(m2 for _, m2, c in items if c in set(prefix)))
        for cid in prefix:
            selected.setdefault(cid, []).append(qi)

    sel_ref = ray.put((q, qids, selected))

    _empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "d2": pa.array([], pa.float64()),
        }
    )

    def scan(g: pa.Table) -> pa.Table:
        qm, qid_arr, sel = ray.get(sel_ref)
        cell = int(g.column("cell_id")[0].as_py()) if len(g) else -1
        qis = sel.get(cell, [])
        if not qis:
            return _empty
        px = g.column("px").to_numpy().astype(np.float64)
        py = g.column("py").to_numpy().astype(np.float64)
        pid = g.column("point_id").to_numpy()
        sub = qm[qis]
        d2 = (sub[:, 0:1] - px[None, :]) ** 2 + (sub[:, 1:2] - py[None, :]) ** 2
        kk = min(k, d2.shape[1])
        order = np.lexsort((np.broadcast_to(pid, d2.shape), d2), axis=1)[:, :kk]
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qid_arr[qis], kk), pa.int64()),
                "neighbor_id": pa.array(pid[order].reshape(-1).astype(np.int64), pa.int64()),
                "d2": pa.array(np.take_along_axis(d2, order, axis=1).reshape(-1), pa.float64()),
            }
        )

    partial = keyed.groupby("cell_id").map_groups(scan, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(knn_finalize(k), batch_format="pyarrow")
