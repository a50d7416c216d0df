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

def _bbox_dist2(qx, qy, b):
    dx = np.maximum(np.maximum(b[0] - qx, qx - b[2]), 0.0)
    dy = np.maximum(np.maximum(b[1] - qy, qy - b[3]), 0.0)
    return dx * dx + dy * dy


def _bbox_maxdist2(qx, qy, b):
    dx = np.maximum(np.abs(qx - b[0]), np.abs(qx - b[2]))
    dy = np.maximum(np.abs(qy - b[1]), np.abs(qy - b[3]))
    return dx * dx + dy * dy


def knn_cell_ring(points_ds, queries: np.ndarray, query_ids, k: int = 5, zoom: int = 3,
                  coarse_step: int = 4):
    """Exact kNN via hierarchical cell pruning: (1) tiny per-cell count
    aggregate — NON-EMPTY cells only, never the full 4^zoom grid; (2) per
    query, best-first search over a two-level directory (coarse parents at
    ``zoom - coarse_step`` → fine cells) pops cells nearest-bbox-first,
    expanding a coarse node only when its bbox distance is reached, until
    the accumulated candidate count ≥ k and every remaining node's min
    bbox distance exceeds the max-corner bound of the accepted prefix —
    the prefix then provably contains the true top-k; (3) a per-cell
    groupby scans only cells some query selected.

    Equivalent to knn_topk (pytest-verified, incl. zoom 10); driver-side
    work is O(non-empty cells) with coarse pruning (≈4^coarse_step fan-in
    per expanded node), not O(4^zoom) — the round-2 driver-side grid
    enumeration is gone.  The heavy data (points) never leaves the
    cluster either way.
    """
    import heapq

    import ray
    from ray.data.aggregate import Count

    from gdal_ray import tilemath as tm
    from gdal_ray.stages.pip import points_with_cell

    q = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)

    keyed = points_ds.map_batches(lambda b: points_with_cell(b, zoom=zoom), batch_format="pyarrow")
    count_rows = keyed.groupby("cell_id").aggregate(Count(alias_name="n")).take_all()
    cids = np.array([int(r["cell_id"]) for r in count_rows], dtype=np.int64)
    ns = np.array([int(r["n"]) for r in count_rows], dtype=np.int64)
    fx, fy, _ = tm.quadkey_decode(cids)
    flon0, flat0, flon1, flat1 = tm.tile_bounds_lonlat_xyz(fx, fy, np.int64(zoom))
    fbounds = np.stack([flon0, flat0, flon1, flat1], axis=1)  # (F, 4)

    # coarse parents of the non-empty fine cells
    cz = max(zoom - coarse_step, 0)
    shift = zoom - cz
    pxy = (fx >> shift) * (np.int64(1) << np.int64(30)) + (fy >> shift)
    uniq, inv = np.unique(pxy, return_inverse=True)
    cxs = (uniq // (1 << 30)).astype(np.int64)
    cys = (uniq % (1 << 30)).astype(np.int64)
    clon0, clat0, clon1, clat1 = tm.tile_bounds_lonlat_xyz(cxs, cys, np.int64(cz))
    children: list[list[int]] = [[] for _ in range(len(uniq))]
    for j, p in enumerate(inv):
        children[p].append(j)

    # per-query best-first selection over the directory
    selected: dict[int, list[int]] = {}
    for qi in range(len(q)):
        qx, qy = q[qi]
        cmind2 = np.maximum(np.maximum(clon0 - qx, qx - clon1), 0.0) ** 2 + \
                 np.maximum(np.maximum(clat0 - qy, qy - clat1), 0.0) ** 2
        # (mind2, tiebreak, is_fine, idx): parents sort before equal-dist
        # children via tiebreak -1, so fine cells still pop in global
        # mind2 order (parent bbox ⊇ child bbox ⇒ parent mind2 ≤ child's)
        heap = [(float(cmind2[p]), -1, 0, p) for p in range(len(uniq))]
        heapq.heapify(heap)
        acc, bound, prefix_max = 0, np.inf, 0.0
        prefix = []
        while heap:
            mind2, _, is_fine, idx = heapq.heappop(heap)
            if acc >= k and mind2 > bound:
                break
            if not is_fine:
                for j in children[idx]:
                    fm = _bbox_dist2(qx, qy, fbounds[j])
                    heapq.heappush(heap, (float(fm), 0, 1, j))
                continue
            prefix.append(int(cids[idx]))
            acc += int(ns[idx])
            prefix_max = max(prefix_max, float(_bbox_maxdist2(qx, qy, fbounds[idx])))
            if acc >= k:
                bound = min(bound, prefix_max)
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


def knn_s2_ring(points_ds, queries: np.ndarray, query_ids, k: int = 5,
                level: int = 6, coarse_step: int = 3):
    """Exact kNN keyed by S2 cells — the same two-level best-first ring
    expansion as ``knn_cell_ring`` but over the spherical cell scheme the
    north star names, reusing the leaf assignment's int64 key for the
    only shuffle.  Bounds come from the CONSERVATIVE per-cell lat/lon
    AABB (stages/s2.py): box ⊇ cell, so box-min-dist is a valid lower
    bound and box-max-corner a valid upper bound; since a child's
    conservative box need not nest inside its parent's, each child's
    pop key is max(own bound, parent's popped key), which is still a
    valid lower bound (the parent cell contains the child cell) and
    keeps the heap keys monotone so the termination test stays exact.

    Results are identical to knn_topk (same planar (lon, lat) metric and
    (d2, point_id) tie-break) — pytest + the shared brute-force oracle.
    """
    import heapq

    import ray
    from ray.data.aggregate import Count

    from gdal_ray.stages import s2

    q = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)

    keyed = points_ds.map_batches(
        lambda b: s2.assign_cells_batch(b, lon_col="px", lat_col="py",
                                        level=level, out="cell_id"),
        batch_format="pyarrow",
    )
    count_rows = keyed.groupby("cell_id").aggregate(Count(alias_name="n")).take_all()
    cids = np.array([int(r["cell_id"]) for r in count_rows], dtype=np.int64)
    ns = np.array([int(r["n"]) for r in count_rows], dtype=np.int64)
    *fbox, ffull = s2._cell_bbox_conservative(cids)
    fb = np.stack(fbox, axis=1)  # (F, 4) lon0 lon1 lat0 lat1

    cz = max(level - coarse_step, 0)
    par = s2.cell_parent(cids, cz)
    uniq, inv = np.unique(par, return_inverse=True)
    *cbox, cfull = s2._cell_bbox_conservative(uniq)
    cb = np.stack(cbox, axis=1)
    children: list[list[int]] = [[] for _ in range(len(uniq))]
    for j, p in enumerate(inv):
        children[p].append(j)

    def box_mind2(qx, qy, box, full):
        dx = 0.0 if full else max(max(box[0] - qx, qx - box[1]), 0.0)
        dy = max(max(box[2] - qy, qy - box[3]), 0.0)
        return dx * dx + dy * dy

    def box_maxd2(qx, qy, box, full):
        dx = 360.0 if full else max(abs(qx - box[0]), abs(qx - box[1]))
        dy = max(abs(qy - box[2]), abs(qy - box[3]))
        return dx * dx + dy * dy

    selected: dict[int, list[int]] = {}
    for qi in range(len(q)):
        qx, qy = q[qi]
        heap = [(box_mind2(qx, qy, cb[p], cfull[p]), -1, 0, p)
                for p in range(len(uniq))]
        heapq.heapify(heap)
        acc, bound, prefix_max = 0, np.inf, 0.0
        prefix = []
        while heap:
            mind2, _, is_fine, idx = heapq.heappop(heap)
            if acc >= k and mind2 > bound:
                break
            if not is_fine:
                for j in children[idx]:
                    fm = max(box_mind2(qx, qy, fb[j], ffull[j]), mind2)
                    heapq.heappush(heap, (fm, 0, 1, j))
                continue
            prefix.append(int(cids[idx]))
            acc += int(ns[idx])
            prefix_max = max(prefix_max, box_maxd2(qx, qy, fb[idx], ffull[idx]))
            if acc >= k:
                bound = min(bound, prefix_max)
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
