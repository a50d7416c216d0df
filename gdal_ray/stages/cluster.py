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
import pyarrow.compute as pc


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


# ---- DBSCAN (Ester et al. 1996) over 2-D points ---------------------------
#
# Distributed shape: eps-grid bucketing replicates each point to its 3x3
# neighbor cells (ghosts), per-cell vectorized pair generation with an
# owner rule (pair emitted only from the cell OWNING its smaller id) so
# every eps-pair appears exactly once; degrees and the core set come from
# one small endpoint aggregate; cluster labels are the engine's
# pointer-jumping connected components over core-core edges; border
# points attach to the MIN label among their core neighbors via two
# union-tag exchanges.  Deterministic by construction (min-id labels) —
# no partitioning sensitivity.  Reference shape: the grid variant in
# scikit-learn / ELKI; the SQL twin is a recursive transitive closure.


def dbscan(points_ds, *, eps: float, min_pts: int,
           id_col: str = "point_id", x_col: str = "px", y_col: str = "py"):
    """-> Dataset(point_id, label, is_core): label = min core id of the
    cluster, -1 for noise; border points take the min label among their
    core eps-neighbors (deterministic tie rule)."""
    import ray.data as rd

    from gdal_ray.stages.agg import grouped_aggregate
    from gdal_ray.stages.dedup import connected_components

    eps2 = eps * eps

    def scatter(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy().astype(np.int64)
        px = b.column(x_col).to_numpy().astype(np.float64)
        py = b.column(y_col).to_numpy().astype(np.float64)
        cx = np.floor(px / eps).astype(np.int64)
        cy = np.floor(py / eps).astype(np.int64)
        out = {"cell": [], "pid": [], "px": [], "py": [], "owned": []}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                out["cell"].append((cx + dx) * 1_000_003 + (cy + dy))
                out["pid"].append(ids)
                out["px"].append(px)
                out["py"].append(py)
                out["owned"].append(
                    np.full(len(ids), dx == 0 and dy == 0, bool))
        return pa.table({
            "cell": pa.array(np.concatenate(out["cell"]), pa.int64()),
            "pid": pa.array(np.concatenate(out["pid"]), pa.int64()),
            "px": pa.array(np.concatenate(out["px"]), pa.float64()),
            "py": pa.array(np.concatenate(out["py"]), pa.float64()),
            "owned": pa.array(np.concatenate(out["owned"]), pa.bool_()),
        })

    def pair_group(g: pa.Table) -> pa.Table:
        ids = g.column("pid").to_numpy()
        px = g.column("px").to_numpy()
        py = g.column("py").to_numpy()
        owned = g.column("owned").to_numpy(zero_copy_only=False)
        oi = np.where(owned)[0]
        if len(oi) == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        dx = px[oi][:, None] - px[None, :]
        dy = py[oi][:, None] - py[None, :]
        d2 = dx * dx + dy * dy
        hit = (d2 <= eps2) & (ids[oi][:, None] < ids[None, :])
        ai, bi = np.nonzero(hit)
        return pa.table({"doc_a": pa.array(ids[oi][ai], pa.int64()),
                         "doc_b": pa.array(ids[bi], pa.int64())})

    pairs = (points_ds.map_batches(scatter, batch_format="pyarrow")
             .groupby("cell").map_groups(pair_group,
                                         batch_format="pyarrow")
             ).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy()
        c = b.column("doc_b").to_numpy()
        return pa.table({"pid": pa.array(np.concatenate([a, c]), pa.int64())})

    deg = grouped_aggregate(
        pairs.map_batches(endpoints, batch_format="pyarrow"),
        keys=["pid"], aggs=[("pid", "count", "n_nb")])

    # core flag joins back onto pairs via two union-tag exchanges
    core = deg.filter(expr=f"n_nb >= {min_pts - 1}")

    def tag_core(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("pid"),
                         "other": pa.array(np.full(len(b), -1), pa.int64()),
                         "t": pa.array(np.zeros(len(b), np.int64))})

    def tag_pairs(which: str):
        other_col = "doc_b" if which == "doc_a" else "doc_a"

        def f(b: pa.Table) -> pa.Table:
            return pa.table({"key": b.column(which),
                             "other": b.column(other_col),
                             "t": pa.array(np.ones(len(b), np.int64))})
        return f

    def attach(g: pa.Table) -> pa.Table:
        t = g.column("t").to_numpy()
        is_core = bool((t == 0).any())
        other = g.column("other").to_numpy()[t == 1]
        key = g.column("key")[0].as_py()
        return pa.table({
            "a": pa.array(np.full(len(other), key), pa.int64()),
            "b": pa.array(other, pa.int64()),
            "a_core": pa.array(np.full(len(other), is_core), pa.bool_()),
        })

    half = []
    for side in ("doc_a", "doc_b"):
        tagged = core.map_batches(tag_core, batch_format="pyarrow").union(
            pairs.map_batches(tag_pairs(side), batch_format="pyarrow"))
        half.append(tagged.groupby("key").map_groups(
            attach, batch_format="pyarrow"))
    # directed rows (a -> b) with a_core flag, both directions present
    directed = half[0].union(half[1]).materialize()

    # core-core edges -> connected components
    core_nodes = core.map_batches(
        lambda b: pa.table({"doc_id": b.column("pid")}),
        batch_format="pyarrow")
    # a_core on (a->b); need b core too: group by b against core tag again
    def tag_dir(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("b"), "other": b.column("a"),
                         "oc": b.column("a_core"),
                         "t": pa.array(np.ones(len(b), np.int64))})

    def attach2(g: pa.Table) -> pa.Table:
        t = g.column("t").to_numpy()
        is_core = bool((t == 0).any())
        sel = t == 1
        return pa.table({
            "doc_a": pa.array(g.column("other").to_numpy()[sel], pa.int64()),
            "doc_b": pa.array(np.full(int(sel.sum()),
                                      g.column("key")[0].as_py()), pa.int64()),
            "a_core": pa.array(g.column("oc").to_numpy(
                zero_copy_only=False)[sel], pa.bool_()),
            "b_core": pa.array(np.full(int(sel.sum()), is_core), pa.bool_()),
        })

    full = (core.map_batches(tag_core, batch_format="pyarrow")
            .map_batches(lambda b: pa.table(
                {"key": b.column("key"), "other": b.column("other"),
                 "oc": pa.array(np.zeros(len(b), bool)),
                 "t": b.column("t")}), batch_format="pyarrow")
            .union(directed.map_batches(tag_dir, batch_format="pyarrow"))
            .groupby("key").map_groups(attach2, batch_format="pyarrow")
            ).materialize()

    cc_edges = full.filter(expr="a_core == True and b_core == True") \
                   .select_columns(["doc_a", "doc_b"])
    labels = connected_components(cc_edges, core_nodes)  # (doc_id, label)

    # border points: non-core 'a' with core neighbor 'b' -> min label(b)
    def tag_label(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("doc_id"),
                         "other": b.column("label"),
                         "t": pa.array(np.zeros(len(b), np.int64))})

    def tag_border(b: pa.Table) -> pa.Table:
        # rows a->b with a NON-core, b core: keyed by b
        sel_t = b.filter(pc.and_(pc.invert(b.column("a_core")),
                                 b.column("b_core")))
        return pa.table({"key": sel_t.column("doc_b"),
                         "other": sel_t.column("doc_a"),
                         "t": pa.array(np.ones(len(sel_t), np.int64))})

    def attach_label(g: pa.Table) -> pa.Table:
        t = g.column("t").to_numpy()
        lab = g.column("other").to_numpy()[t == 0]
        if len(lab) == 0:
            return pa.table({"pid": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        borders = g.column("other").to_numpy()[t == 1]
        return pa.table({
            "pid": pa.array(borders, pa.int64()),
            "label": pa.array(np.full(len(borders), int(lab[0])), pa.int64()),
        })

    border = grouped_aggregate(
        labels.map_batches(tag_label, batch_format="pyarrow")
        .union(full.map_batches(tag_border, batch_format="pyarrow"))
        .groupby("key").map_groups(attach_label, batch_format="pyarrow"),
        keys=["pid"], aggs=[("label", "min", "label")])

    # assemble: cores (label), borders (min label), rest noise (-1)
    def tag_final(t_val: int, key: str, val: str | None):
        def f(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table({
                "pid": b.column(key),
                "lab": (b.column(val) if val
                        else pa.array(np.full(n, -1), pa.int64())),
                "t": pa.array(np.full(n, t_val), pa.int64()),
            })
        return f

    allpts = points_ds.map_batches(
        lambda b: pa.table({"pid": b.column(id_col)}),
        batch_format="pyarrow")
    un = (labels.map_batches(
              lambda b: pa.table({"pid": b.column("doc_id"),
                                  "lab": b.column("label"),
                                  "t": pa.array(np.zeros(len(b), np.int64))}),
              batch_format="pyarrow")
          .union(border.map_batches(tag_final(1, "pid", "label"),
                                    batch_format="pyarrow"))
          .union(allpts.map_batches(tag_final(2, "pid", None),
                                    batch_format="pyarrow")))

    def resolve(g: pa.Table) -> pa.Table:
        t = g.column("t").to_numpy()
        lab = g.column("lab").to_numpy()
        pid = int(g.column("pid")[0].as_py())
        order = np.argsort(t, kind="stable")
        return pa.table({
            "point_id": pa.array([pid], pa.int64()),
            "label": pa.array([int(lab[order[0]])], pa.int64()),
            "is_core": pa.array([int(t.min() == 0)], pa.int64()),
        })

    return un.groupby("pid").map_groups(resolve, batch_format="pyarrow")
