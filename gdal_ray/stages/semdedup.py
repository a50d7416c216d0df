"""SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): cluster the embedding space
with k-means, then inside each cluster remove all but one member of
every semantic-duplicate group (pairwise cosine ≥ ε), keeping the
member with the LOWEST cosine similarity to the cluster centroid (the
paper's keep rule — "keep the example farthest from the centroid";
ties break to the lowest vec_id).

Ray-Data shape:

- k-means fit/assign reuse :mod:`gdal_ray.stages.cluster` (broadcast
  centroids, O(k·d) driver state).
- The duplicate search is per-cluster: one ``groupby("cluster")``
  exchange, then a vectorized cosine Gram matrix + union-find inside
  each group.  The paper's own premise is that k is chosen so clusters
  are small (they use k ≈ n/200); a cluster's VECTORS must still fit
  one task (the same assumption the reference implementation makes per
  GPU shard).
- Giant-cluster guard (round 5): clusters larger than
  ``max_gram_rows`` no longer materialize the n×n Gram — the pair scan
  runs in (chunk × n) tiles, bounding peak memory at O(chunk·n) while
  producing the IDENTICAL keep-set (same pairs, same union-find, same
  keep rule).  A skewed cluster degrades to more tiles, not an OOM.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.stages.cluster import kmeans_fit


MAX_GRAM_ROWS = 4096  # above this, the Gram is tiled (memory guard)


def _group_keep(vecs: np.ndarray, ids: np.ndarray, cent: np.ndarray,
                eps: float, max_gram_rows: int = MAX_GRAM_ROWS):
    """Within one cluster: union near-dup pairs (cosine >= eps), keep
    per component the member with min cosine-to-centroid (tie: min id).
    Returns boolean keep mask aligned with ids.  Clusters larger than
    ``max_gram_rows`` scan pairs in (chunk x n) tiles — identical
    output, O(chunk*n) peak memory instead of O(n^2)."""
    n = len(ids)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    u = vecs / norms[:, None]
    # union-find over pairs >= eps
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chunk = n if n <= max_gram_rows else max_gram_rows
    for s in range(0, n, chunk):
        tile = u[s:s + chunk] @ u.T  # (chunk, n)
        ii, jj = np.nonzero(tile >= eps)
        ii = ii + s
        upper = jj > ii  # strict upper triangle only, across tiles
        for a, b in zip(ii[upper], jj[upper]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    root = np.array([find(i) for i in range(n)])
    cnorm = np.linalg.norm(cent)
    csim = (u @ cent) / (cnorm if cnorm else 1.0)
    keep = np.zeros(n, dtype=bool)
    for comp in np.unique(root):
        members = np.nonzero(root == comp)[0]
        # min centroid-similarity wins; tie -> lowest vec_id
        best = members[np.lexsort((ids[members], csim[members]))[0]]
        keep[best] = True
    return keep, csim


def semdedup(ds, *, k: int = 8, eps: float = 0.96, iters: int = 10,
             col: str = "embedding", id_col: str = "vec_id"):
    """-> Dataset (vec_id, cluster, centroid_sim, keep) — one row per
    input vector; ``keep == False`` rows are the semantic duplicates a
    curation pipeline drops."""
    cents = kmeans_fit(ds, k=k, iters=iters, col=col, id_col=id_col)

    def attach(b: pa.Table) -> pa.Table:
        # carry the vector through the cluster exchange
        return b.select([id_col, col])

    # one exchange keyed by cluster; vectors travel with their row
    vecs = ds.map_batches(attach, batch_format="pyarrow")
    cents_ref = np.asarray(cents, dtype=np.float64)

    def assign_with_vec(b: pa.Table) -> pa.Table:
        from gdal_ray.stages.cluster import _batch_vectors, _nearest

        v = _batch_vectors(b, col)
        if not len(v):
            return pa.table({id_col: b.column(id_col),
                             "cluster": pa.array([], pa.int32()),
                             col: b.column(col)})
        a, _ = _nearest(v, cents_ref)
        return pa.table({id_col: b.column(id_col),
                         "cluster": pa.array(a.astype(np.int32)),
                         col: b.column(col)})

    tagged = vecs.map_batches(assign_with_vec, batch_format="pyarrow")

    def dedup_group(g: pa.Table) -> pa.Table:
        from gdal_ray.stages.cluster import _batch_vectors

        ids = g.column(id_col).to_numpy()
        v = _batch_vectors(g, col)
        cl = int(g.column("cluster")[0].as_py())
        keep, csim = _group_keep(v, ids, cents_ref[cl], eps)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": pa.array(np.full(len(ids), cl, dtype=np.int32)),
            "centroid_sim": pa.array(csim, pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        })

    return tagged.groupby("cluster").map_groups(dedup_group,
                                                batch_format="pyarrow")
