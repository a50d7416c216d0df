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
import pandas as pd
import pyarrow as pa


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
    """groupby(query_id).map_groups reducer: merge per-batch partials."""

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["d2", "neighbor_id"], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

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
    return partial.groupby("query_id").map_groups(knn_finalize(k), batch_format="pandas")
