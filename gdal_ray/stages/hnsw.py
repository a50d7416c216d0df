"""HNSW approximate-nearest-neighbor graphs (Malkov & Yashunin 2016 —
public algorithm) over an embedding column, completing the ANN menu next
to :mod:`gdal_ray.stages.ann`'s brute / IVF / PQ paths.

Distributed shape (the IVF-HNSW sharding pattern every planet-scale ANN
service uses): vectors are hash-sharded by ``vec_id`` (ONE shuffle keyed
by a single int64 — the same "one partitioning key" idiom as the rest of
the engine), each shard builds its own HNSW graph INSIDE the
``groupby("shard").map_groups`` task where its vectors already live (no
second pass, no graph shuffle), the query matrix is broadcast once via
``ray.put`` and read zero-copy per task, and each shard emits per-query
candidate top-k rows merged by the same tiny ``groupby("query_id")``
finalizer as ``brute_topk``.  At 10^12 vectors the per-shard graph is the
only state that must fit one worker (M·n_shard int32 edges, tunable via
``n_shards``); corpus floats never leave their shard.

Determinism: the level assignment uses a splitmix64 hash of the vector id
(not an RNG), insertion order is sorted ``vec_id``, and every heap tie
breaks on (distance, id) — two builds of the same shard produce identical
graphs and identical search results, which is what makes the recall and
equality pytests meaningful.

Construction is inherently sequential per shard (each insert searches the
graph built so far — the published algorithm), so the insert loop is
Python over rows *of index construction only*; distance evaluations
inside it are vectorized numpy gathers over neighbor lists, and the whole
build runs inside one map_groups task per shard, not on the driver.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pyarrow as pa

from gdal_ray.stages.ann import _batch_matrix, topk_finalize

_MAX_LEVEL = 24


def _splitmix64(x: np.ndarray | int) -> np.ndarray | int:
    """splitmix64 finalizer (public domain constant set) — id -> hash."""
    x = np.uint64(x) if np.isscalar(x) else x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _level_for_id(vid: int, m_l: float) -> int:
    """Deterministic HNSW level: floor(-ln(U) * mL) with U derived from a
    splitmix64 hash of the id (the paper draws U~Uniform(0,1]; hashing the
    id gives the same marginal distribution and reproducible builds)."""
    h = int(_splitmix64(np.uint64(vid & 0xFFFFFFFFFFFFFFFF)))
    u = ((h >> 11) + 1) / float((1 << 53) + 1)  # in (0, 1]
    return min(int(-math.log(u) * m_l), _MAX_LEVEL)


class HnswGraph:
    """Single-shard deterministic HNSW over unit-normalized vectors
    (cosine similarity == inner product).  ``M`` neighbors per node on
    upper layers, ``2M`` on layer 0, ``ef_construction`` beam width."""

    def __init__(self, M: int = 8, ef_construction: int = 64):
        self.M = int(M)
        self.Mmax0 = 2 * int(M)
        self.efc = int(ef_construction)
        self.m_l = 1.0 / math.log(self.M)
        self.vecs: np.ndarray | None = None  # (n, d) normalized
        self.ids: np.ndarray | None = None
        self.adj: list[dict[int, list[int]]] = []  # per level: node -> nbrs
        self.entry: int | None = None
        self.max_level = -1

    # -- internals --------------------------------------------------------

    def _search_layer(self, qv: np.ndarray, eps: list[int], ef: int,
                      lc: int) -> list[tuple[float, int]]:
        """Beam search on one layer; returns (dist, node) ascending, where
        dist = -<qv, v> (smaller = more similar).  Ties break on node."""
        adj = self.adj[lc]
        vecs = self.vecs
        dists = {e: float(-(vecs[e] @ qv)) for e in eps}
        cand = sorted((d, e) for e, d in dists.items())
        res = [(-d, e) for d, e in cand]
        heapq.heapify(res)
        visited = set(eps)
        while cand:
            d, c = heapq.heappop(cand)
            if res and d > -res[0][0] and len(res) >= ef:
                break
            nbrs = [n for n in adj.get(c, ()) if n not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            nd = -(vecs[np.asarray(nbrs)] @ qv)
            for n, dn in zip(nbrs, nd):
                dn = float(dn)
                if len(res) < ef or dn < -res[0][0]:
                    heapq.heappush(cand, (dn, n))
                    heapq.heappush(res, (-dn, n))
                    if len(res) > ef:
                        heapq.heappop(res)
        return sorted((-md, e) for md, e in res)

    def _greedy(self, qv: np.ndarray, ep: int, lc: int) -> int:
        """Greedy 1-NN descent step on layer `lc` (upper-layer routing)."""
        vecs = self.vecs
        cur, cur_d = ep, float(-(vecs[ep] @ qv))
        improved = True
        while improved:
            improved = False
            nbrs = self.adj[lc].get(cur, ())
            if not nbrs:
                break
            arr = np.asarray(nbrs)
            nd = -(vecs[arr] @ qv)
            j = int(np.lexsort((arr, nd))[0])
            if float(nd[j]) < cur_d:
                cur, cur_d = int(arr[j]), float(nd[j])
                improved = True
        return cur

    def _shrink(self, lc: int, node: int, cap: int) -> None:
        lst = self.adj[lc][node]
        if len(lst) <= cap:
            return
        arr = np.asarray(lst)
        d = -(self.vecs[arr] @ self.vecs[node])
        order = np.lexsort((arr, d))[:cap]
        self.adj[lc][node] = [int(x) for x in arr[order]]

    # -- build / search ---------------------------------------------------

    def build(self, vecs: np.ndarray, ids: np.ndarray) -> "HnswGraph":
        """Insert all vectors in the given order (callers pass sorted id
        order for reproducibility).  Vectors are unit-normalized here."""
        v = np.asarray(vecs, dtype=np.float64)
        self.vecs = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        self.ids = np.asarray(ids, dtype=np.int64)
        for i in range(len(self.ids)):
            self._insert(i)
        return self

    def _insert(self, i: int) -> None:
        qv = self.vecs[i]
        level = _level_for_id(int(self.ids[i]), self.m_l)
        while len(self.adj) <= level:
            self.adj.append({})
        for lc in range(level + 1):
            self.adj[lc][i] = []
        if self.entry is None:
            self.entry, self.max_level = i, level
            return
        ep = self.entry
        for lc in range(self.max_level, level, -1):
            ep = self._greedy(qv, ep, lc)
        eps = [ep]
        for lc in range(min(level, self.max_level), -1, -1):
            cand = self._search_layer(qv, eps, self.efc, lc)
            cap = self.Mmax0 if lc == 0 else self.M
            sel = [n for _, n in cand[: self.M]]
            self.adj[lc][i] = list(sel)
            for n in sel:
                self.adj[lc][n].append(i)
                self._shrink(lc, n, cap)
            eps = [n for _, n in cand]
        if level > self.max_level:
            self.entry, self.max_level = i, level

    def search(self, query: np.ndarray, k: int, ef: int = 64):
        """Top-k (ids, sims) for one query vector, sims descending with
        (sim desc, id asc) tie order — the engine's ANN output contract."""
        if self.entry is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        q = np.asarray(query, dtype=np.float64)
        qv = q / max(float(np.linalg.norm(q)), 1e-300)
        ep = self.entry
        for lc in range(self.max_level, 0, -1):
            ep = self._greedy(qv, ep, lc)
        cand = self._search_layer(qv, [ep], max(ef, k), 0)
        pairs = [(d, int(self.ids[n])) for d, n in cand]
        pairs.sort(key=lambda t: (t[0], t[1]))
        pairs = pairs[:k]
        ids = np.array([p[1] for p in pairs], dtype=np.int64)
        sims = np.array([-p[0] for p in pairs], dtype=np.float64)
        return ids, sims


def hnsw_topk(embeddings_ds, queries: np.ndarray, query_ids, k: int = 5,
              n_shards: int = 4, M: int = 8, ef_construction: int = 64,
              ef_search: int = 64):
    """Sharded HNSW cosine top-k: hash-shard by vec_id, build one graph
    per shard inside map_groups, search broadcast queries per shard,
    merge shard candidates with the same tiny groupby as brute_topk."""
    import ray

    q = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)
    qref = ray.put((q, qids))

    def assign(b: pa.Table) -> pa.Table:
        vid = b.column("vec_id").to_numpy().astype(np.uint64)
        shard = (_splitmix64(vid) % np.uint64(n_shards)).astype(np.int64)
        return b.append_column("shard", pa.array(shard))

    def per_shard(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        order = pa.compute.sort_indices(g.column("vec_id"))
        g = g.take(order)
        vecs = _batch_matrix(g)
        ids = g.column("vec_id").to_numpy()
        graph = HnswGraph(M=M, ef_construction=ef_construction).build(vecs, ids)
        qm, qi = ray.get(qref)
        out_q, out_n, out_s = [], [], []
        for row in range(len(qi)):
            nid, sim = graph.search(qm[row], k, ef=ef_search)
            out_q.append(np.full(len(nid), qi[row], dtype=np.int64))
            out_n.append(nid)
            out_s.append(sim)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q else [], pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n) if out_n else [], pa.int64()),
            "sim": pa.array(np.concatenate(out_s) if out_s else [], pa.float64()),
        })

    sharded = embeddings_ds.map_batches(assign, batch_format="pyarrow")
    cands = sharded.groupby("shard").map_groups(per_shard, batch_format="pyarrow")
    return cands.groupby("query_id").map_groups(topk_finalize(k), batch_format="pyarrow")
