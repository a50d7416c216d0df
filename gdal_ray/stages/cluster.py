"""Distributed k-means over an embedding column — the data-curation
clustering step of large training-data pipelines (SemDeDup-style
cluster-then-dedup, domain bucketing).

Shape (SURVEY.md §2.3 / the broadcast-lookup idiom):

- Lloyd iterations keep driver state at O(k·d): centroids are broadcast
  once per iteration via ``ray.put``; each ``map_batches`` task emits k
  PARTIAL rows (count, vector sum) for its batch, and the driver reduces
  k × n_batches tiny rows to the new centroids.  The embedding vectors
  themselves never shuffle and are never materialized on the driver —
  the same 100-TB contract as stages/ann.py's CosinePartial.
- Assignment is a single stateless ``map_batches`` pass with the final
  centroids broadcast.

Determinism: seeds are the k lowest vec_ids; partial sums are float64;
ties in the nearest-centroid argmin break to the lowest cluster index.
No reference analogue (GDAL has no clustering); this is a first-class
LLM-pipeline operator per the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_vectors(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _nearest(v: np.ndarray, cents: np.ndarray):
    """(assign, dist2) by squared euclidean — ||v||² + ||c||² - 2v·c."""
    d2 = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ cents.T) \
        + (cents * cents).sum(axis=1)[None, :]
    a = np.argmin(d2, axis=1)
    return a, np.maximum(d2[np.arange(len(v)), a], 0.0)


def kmeans_fit(ds, *, k: int = 8, iters: int = 10,
               col: str = "embedding", id_col: str = "vec_id") -> np.ndarray:
    """Lloyd's algorithm, distributed: returns (k, d) float64 centroids.
    Seeds = the vectors of the k smallest `id_col` values (deterministic,
    no full sort: per-batch partial bottom-k, driver merges k·n_batches
    candidate rows)."""
    import ray

    def bottomk(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")[:k]
        return b.select([id_col, col]).take(pa.array(order))

    cand = ds.map_batches(bottomk, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: r[id_col])
    cents = np.array([r[col] for r in cand[:k]], dtype=np.float64)
    if len(cents) < k:
        raise ValueError(f"k={k} exceeds dataset size {len(cents)}")

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(b: pa.Table) -> pa.Table:
            import ray as _ray

            c = _ray.get(ref)
            v = _batch_vectors(b, col)
            if not len(v):
                return pa.table({"cluster": pa.array([], pa.int32()),
                                 "n": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(pa.float64()))})
            a, _ = _nearest(v, c)
            kk, d = c.shape
            cnt = np.bincount(a, minlength=kk)
            s = np.zeros((kk, d))
            np.add.at(s, a, v)
            return pa.table({
                "cluster": pa.array(np.arange(kk, dtype=np.int32)),
                "n": pa.array(cnt.astype(np.int64)),
                "vsum": pa.array(list(s), pa.list_(pa.float64())),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        cnt = np.zeros(k, dtype=np.int64)
        s = np.zeros_like(cents)
        for r in rows:
            cnt[r["cluster"]] += r["n"]
            s[r["cluster"]] += np.asarray(r["vsum"])
        nz = cnt > 0
        cents = np.where(nz[:, None], s / np.maximum(cnt, 1)[:, None], cents)
    return cents


def kmeans_assign(ds, cents: np.ndarray, *, col: str = "embedding",
                  id_col: str = "vec_id"):
    """-> Dataset (id_col, cluster:int32, dist2:float64) — one stateless
    pass, centroids broadcast in the closure (O(k·d) per task)."""
    c = np.asarray(cents, dtype=np.float64)

    def assign(b: pa.Table) -> pa.Table:
        v = _batch_vectors(b, col)
        if not len(v):
            return pa.table({id_col: b.column(id_col),
                             "cluster": pa.array([], pa.int32()),
                             "dist2": pa.array([], pa.float64())})
        a, d2 = _nearest(v, c)
        return pa.table({id_col: b.column(id_col),
                         "cluster": pa.array(a.astype(np.int32)),
                         "dist2": pa.array(d2)})

    return ds.map_batches(assign, batch_format="pyarrow")
