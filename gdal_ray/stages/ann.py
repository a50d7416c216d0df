"""Approximate-nearest-neighbor search over an embedding column
(`list<float>`), per the training-data extension requirements.

- :func:`brute_topk` — the exact baseline: per-batch numpy matmul against a
  broadcast query matrix + per-batch partial top-k, merged by a tiny
  groupby.  The object store ships the query matrix once per actor, not per
  batch.
- :func:`ivf_topk` — the scale path: a deterministic IVF — coarse
  centroids from a seeded sample, vectors bucketed by nearest centroid
  (one shuffle keyed by bucket), queries probe the `nprobe` nearest
  buckets only.  Recall < 1 by design; exactness is the baseline's job.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = arr.offsets.to_numpy()
    dim = offsets[1] - offsets[0]
    return flat.reshape(len(arr), dim)


class CosinePartial:
    """Actor-pool stage: exact cosine top-k of broadcast queries vs batch.

    With ``probe`` (a (n_queries, n_buckets) bool matrix) and a ``bucket``
    column on the batch, each query only scores vectors living in buckets
    it probes — the per-query IVF probe mask the nprobe semantics require."""

    def __init__(self, queries_ref=None, queries: np.ndarray | None = None, query_ids=None,
                 k: int = 5, probe: np.ndarray | None = None):
        import ray

        if queries is None:
            queries, query_ids, probe = ray.get(queries_ref[0])
        q = np.asarray(queries, dtype=np.float64)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.qids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        self.probe = probe

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _batch_matrix(batch)
        vid = batch.column("vec_id").to_numpy()
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        sims = self.qn @ vn.T  # (m, n)
        if self.probe is not None:
            buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
            sims = np.where(self.probe[:, buckets], sims, -np.inf)
        k = min(self.k, sims.shape[1])
        order = np.lexsort((np.broadcast_to(vid, sims.shape), -sims), axis=1)[:, :k]
        qid_out = np.repeat(self.qids, k)
        nid_out = vid[order].reshape(-1)
        sim_out = np.take_along_axis(sims, order, axis=1).reshape(-1)
        keep = np.isfinite(sim_out)
        return pa.table(
            {
                "query_id": pa.array(qid_out[keep], pa.int64()),
                "neighbor_id": pa.array(nid_out[keep].astype(np.int64), pa.int64()),
                "sim": pa.array(sim_out[keep], pa.float64()),
            }
        )


def topk_finalize(k: int):
    # Arrow-native finalizer (pandas round-trips re-attach unhashable
    # schema metadata and warn per reduce task — see BASELINE notes)
    def fin(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("sim", "descending"), ("neighbor_id", "ascending")]
        )[:k]
        g = g.take(idx).select(["query_id", "neighbor_id"])
        return g.append_column("rank", pa.array(np.arange(1, len(g) + 1, dtype=np.int64)))

    return fin


def brute_topk(embeddings_ds, queries: np.ndarray, query_ids, k: int = 5, concurrency=None,
               probe: np.ndarray | None = None):
    import ray

    ref = ray.put(
        (np.asarray(queries, dtype=np.float64), np.asarray(query_ids, dtype=np.int64), probe)
    )
    partial = embeddings_ds.map_batches(
        CosinePartial,
        fn_constructor_kwargs={"queries_ref": [ref], "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or (1, 4),
    )
    return partial.groupby("query_id").map_groups(topk_finalize(k), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (scale path)

class IvfAssign:
    def __init__(self, centroids_ref=None, centroids: np.ndarray | None = None):
        import ray

        if centroids is None:
            centroids = ray.get(centroids_ref[0])
        c = np.asarray(centroids, dtype=np.float64)
        self.cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _batch_matrix(batch)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        bucket = np.argmax(vn @ self.cn.T, axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))


def ivf_topk(embeddings_ds, queries: np.ndarray, query_ids, k: int = 5, n_centroids: int = 16, nprobe: int = 4):
    """Bucketed ANN: assign vectors to nearest of `n_centroids` seeded
    centroids (first-n in deterministic read order — ds.limit, NO
    distributed sort), then each query scores only vectors in its own
    `nprobe` closest buckets (per-query probe mask, enforced inside
    CosinePartial)."""
    import ray

    from gdal_ray.stages.dedup import embeddings_head_matrix

    cmat = embeddings_head_matrix(embeddings_ds, n_centroids)
    cref = ray.put(cmat)

    assigned = embeddings_ds.map_batches(
        IvfAssign, fn_constructor_kwargs={"centroids_ref": [cref]},
        batch_format="pyarrow", concurrency=(1, 2),
    )
    qn = np.asarray(queries, dtype=np.float64)
    qnorm = qn / np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-300)
    cn = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300)
    probe_order = np.argsort(-(qnorm @ cn.T), axis=1)[:, :nprobe]  # (m, nprobe)
    probe = np.zeros((len(qn), len(cmat)), dtype=bool)
    np.put_along_axis(probe, probe_order, True, axis=1)

    # blocks no query probes never leave the scan
    union_buckets = sorted({int(b) for row in probe_order for b in row})
    filtered = assigned.filter(expr=f"bucket in {union_buckets}")
    return brute_topk(filtered, queries, query_ids, k=k, probe=probe)
