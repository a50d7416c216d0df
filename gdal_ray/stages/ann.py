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
    if len(arr) == 0:  # Ray can deliver empty blocks (e.g. post-filter)
        return np.zeros((0, 0), dtype=np.float64)
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
        if len(v) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
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
        if len(v) == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
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


# ---------------------------------------------------------------------------
# Product quantization (memory-compressed scale path)

def train_pq_codebooks(sample: np.ndarray, m: int = 8, ks: int = 16,
                       iters: int = 10) -> np.ndarray:
    """Per-subspace Lloyd k-means codebooks -> (m, ks, dsub) float64.
    Deterministic: init = the first ks DISTINCT subvectors of the sample
    (so a dataset with <= ks distinct patterns per subspace trains a
    LOSSLESS codebook — the pytest exactness gate)."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.zeros((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub:(j + 1) * dsub]
        uniq, first = np.unique(sub.round(12), axis=0, return_index=True)
        init_idx = np.sort(first)[:ks]
        cent = sub[init_idx].copy()
        if len(cent) < ks:  # pad with repeats of the first row
            cent = np.vstack([cent, np.repeat(cent[:1], ks - len(cent), 0)])
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ks):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        books[j] = cent
    return books


class PqEncode:
    """Actor-pool stage: codebooks broadcast once; encode each vector to
    m uint8 codes (m bytes/vector — 32x smaller than 64-dim float32)."""

    def __init__(self, books_ref=None, books: np.ndarray | None = None):
        import ray

        if books is None:
            books = ray.get(books_ref[0])
        self.books = np.asarray(books, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _batch_matrix(batch)
        m, ks, dsub = self.books.shape
        if len(v) == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "codes": pa.array([], pa.list_(pa.uint8(), m)),
            })
        codes = np.empty((len(v), m), dtype=np.uint8)
        for j in range(m):
            sub = v[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - self.books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "codes": pa.array(list(codes), pa.list_(pa.uint8(), m)),
        })


class PqAdcPartial:
    """ADC scoring: per-query lookup tables LUT[j, c] = <q_j, books[j, c]>
    built once per actor; scoring a batch is a uint8 gather + row sum —
    no float matmul against full vectors (the PQ speed/memory win)."""

    def __init__(self, ref=None, k: int = 5):
        import ray

        queries, query_ids, books = ray.get(ref[0])
        self.qids = np.asarray(query_ids, dtype=np.int64)
        q = np.asarray(queries, dtype=np.float64)
        self.qnorm = np.maximum(np.linalg.norm(q, axis=1), 1e-300)
        m, ks, dsub = books.shape
        self.m = m
        # dot-product LUTs (n_q, m, ks) and code norm contributions (m, ks)
        self.lut = np.einsum("qjd,jkd->qjk",
                             q.reshape(len(q), m, dsub), books)
        self.cnorm2 = (books ** 2).sum(axis=2)  # (m, ks)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # Ray can deliver empty blocks (e.g. post-filter)
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        arr = batch.column("codes")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        codes = arr.values.to_numpy(zero_copy_only=False).reshape(
            len(arr), self.m).astype(np.int64)
        ids = batch.column("vec_id").to_numpy()
        j = np.arange(self.m)
        dots = self.lut[:, j, codes].sum(axis=2)           # (n_q, n_vec)
        xnorm = np.sqrt(np.maximum(self.cnorm2[j, codes].sum(axis=1), 1e-300))
        sims = dots / (self.qnorm[:, None] * xnorm[None, :])
        kk = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q = np.repeat(self.qids, kk)
        out_n = ids[top].ravel()
        out_s = np.take_along_axis(sims, top, axis=1).ravel()
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n.astype(np.int64), pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })


def pq_topk(embeddings_ds, queries: np.ndarray, query_ids, k: int = 5,
            m: int = 8, ks: int = 16, sample_n: int = 256):
    """PQ-compressed approximate cosine top-k: train codebooks on a
    deterministic head sample, encode the corpus to m-byte codes (one
    map_batches — the corpus floats never shuffle), score via ADC lookup
    tables, merge with the same tiny groupby as brute_topk."""
    import ray

    from gdal_ray.stages.dedup import embeddings_head_matrix

    sample = embeddings_head_matrix(embeddings_ds, sample_n)
    books = train_pq_codebooks(sample, m=m, ks=ks)
    bref = ray.put(books)
    codes = embeddings_ds.map_batches(
        PqEncode, fn_constructor_kwargs={"books_ref": [bref]},
        batch_format="pyarrow", concurrency=(1, 4),
    )
    qref = ray.put((np.asarray(queries, dtype=np.float64),
                    np.asarray(query_ids, dtype=np.int64), books))
    partial = codes.map_batches(
        PqAdcPartial, fn_constructor_kwargs={"ref": [qref], "k": k},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    )
    return partial.groupby("query_id").map_groups(
        topk_finalize(k), batch_format="pyarrow")
