"""Exact distributed quantiles (PERCENTILE_DISC) over ray.data.Dataset.

The reference computes exact per-band medians only via full statistics
(gcore/gdalrasterband.cpp ComputeStatistics + GetHistogram two-pass
min/max → histogram idiom); SQL engines do it with a full sort.  At
100 TB a sort for one scalar is the wrong shape, so this module uses the
classic distributed selection algorithm (the same histogram-refinement
idea as GDAL's GetDefaultHistogram median path, generalized to grouped
quantiles):

  pass 0  grouped min/max/count            (one hash-bucket aggregate)
  pass 1  per-group fixed-width histogram  (map_batches partial counts →
          one aggregate over (group, bucket); B=4096 buckets/group)
  pass 2  rows of only the TARGET buckets leave the cluster (expected
          n/B rows per group per quantile), exact rank selection driver-
          side on that tiny set.

Nothing else materializes; the value column is visited twice, streaming.
PERCENTILE_DISC(q): the smallest value whose cumulative position reaches
ceil(q*n) (1-based ascending, DuckDB/ANSI WITHIN GROUP semantics); q=0
returns the minimum.  Nulls are dropped (ANSI).  Bucket ids are computed
by the identical float expression in pass 1 and pass 2, so edge rows land
consistently.

Contract: the number of groups is small enough for a driver-side plan
table (one row per group — the same contract as any grouped result you
look at), and each (group, target-bucket) slice fits on the driver
(expected n_group/4096 rows).  Constant groups (hi == lo) short-circuit
to the constant without pulling any rows; a single duplicated value
dominating the target bucket degrades pass 2 to that value's row count —
add a refinement pass before raising num_buckets if that ever bites.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.stages.agg import grouped_aggregate

_B = 4096  # histogram buckets per group per refinement pass


def _collect(ds) -> pa.Table:
    """Gather a small Dataset driver-side, dropping the typed-empty blocks
    the hash-bucket aggregate emits for empty buckets."""
    import ray

    tbls = [t for t in ray.get(ds.to_arrow_refs())
            if t.num_columns and len(t)]
    if not tbls:
        raise ValueError("empty input")
    return pa.concat_tables(tbls)


def _group_index(batch: pa.Table, by: list[str], keys: pa.Table):
    """int32[n] index of each row's group in the keys table (-1 = unseen
    group — impossible after pass 0 but kept as a guard)."""
    if len(by) == 1:
        return pc.index_in(batch.column(by[0]),
                           value_set=keys.column(by[0]).combine_chunks())
    # composite key: dictionary-encode a canonical string join
    def canon(tbl):
        parts = [pc.cast(tbl.column(c), pa.string()) for c in by]
        return pc.binary_join_element_wise(*parts, "\x1f")

    return pc.index_in(canon(batch), value_set=canon(keys).combine_chunks())


def exact_group_quantiles(ds, col: str, qs: list[float], by: list[str],
                          *, num_buckets: int = _B):
    """Exact PERCENTILE_DISC(qs) of `col` per group `by`.

    Returns a pyarrow Table with columns by... + p{q} for each q (float64,
    quantile written as e.g. p50 for 0.5 / p99 for 0.99).
    """
    import ray

    names = [f"p{int(round(q * 100))}" for q in qs]

    def add_val(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column(col), pa.float64())
        return b.select(by).append_column("__v", v).filter(
            pc.is_valid(v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                        else v))

    vds = ds.map_batches(add_val, batch_format="pyarrow")

    # ---- pass 0: per-group extent + count ------------------------------
    ext = grouped_aggregate(
        vds, by, [("__v", "min", "__lo"), ("__v", "max", "__hi"),
                  ("__v", "count", "__n")],
    )
    keys = _collect(ext)
    ngroups = len(keys)
    if ngroups == 0:
        cols = {c: pa.array([], pa.float64()) for c in by}
        for nm in names:
            cols[nm] = pa.array([], pa.float64())
        return pa.table(cols)
    lo = np.asarray(keys.column("__lo").to_numpy(zero_copy_only=False),
                    dtype=np.float64)
    hi = np.asarray(keys.column("__hi").to_numpy(zero_copy_only=False),
                    dtype=np.float64)
    n = np.asarray(keys.column("__n").to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    width = np.where(hi > lo, (hi - lo) / num_buckets, 1.0)
    key_tbl = keys.select(by)
    plan_ref = ray.put((key_tbl, lo, width))

    def bucket_of(vals: np.ndarray, gidx: np.ndarray,
                  lo_a: np.ndarray, w_a: np.ndarray) -> np.ndarray:
        b = np.floor((vals - lo_a[gidx]) / w_a[gidx]).astype(np.int64)
        return np.clip(b, 0, num_buckets - 1)

    # ---- pass 1: per-group histogram -----------------------------------
    def hist(b: pa.Table) -> pa.Table:
        k_tbl, lo_a, w_a = ray.get(plan_ref)
        gidx = np.asarray(_group_index(b, by, k_tbl), dtype=np.int64)
        vals = np.asarray(b.column("__v").to_numpy(zero_copy_only=False))
        bk = bucket_of(vals, gidx, lo_a, w_a)
        flat = gidx * num_buckets + bk
        uniq, cnt = np.unique(flat, return_counts=True)
        out = {c: k_tbl.column(c).take(pa.array(uniq // num_buckets))
               for c in by}
        out["__bk"] = pa.array(uniq % num_buckets)
        out["__c"] = pa.array(cnt.astype(np.int64))
        return pa.table(out)

    htbl = _collect(grouped_aggregate(
        vds.map_batches(hist, batch_format="pyarrow"),
        by + ["__bk"], [("__c", "sum", "__c")],
    ))

    hg = np.asarray(_group_index(htbl, by, key_tbl), dtype=np.int64)
    hb = np.asarray(htbl.column("__bk").to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    hc = np.asarray(htbl.column("__c").to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    counts = np.zeros((ngroups, num_buckets), dtype=np.int64)
    counts[hg, hb] = hc
    cum = np.cumsum(counts, axis=1)  # inclusive

    # ranks (1-based): PERCENTILE_DISC(q) = value at ceil(q*n), min for q=0
    out_vals = np.full((ngroups, len(qs)), np.nan)
    targets: dict[int, list[tuple[int, int, int]]] = {}  # g -> [(qi, bucket, rank_in_bucket)]
    for g in range(ngroups):
        if n[g] and hi[g] <= lo[g]:  # constant group: answer known, no pull
            out_vals[g, :] = lo[g]
            continue
        for qi, q in enumerate(qs):
            r = max(1, int(math.ceil(q * n[g]))) if n[g] else 0
            if r == 0:
                continue
            bkt = int(np.searchsorted(cum[g], r))
            before = int(cum[g][bkt - 1]) if bkt else 0
            targets.setdefault(g, []).append((qi, bkt, r - before))

    if not targets:  # every group was constant — nothing to pull
        cols = {c: key_tbl.column(c) for c in by}
        for qi, nm in enumerate(names):
            cols[nm] = pa.array(out_vals[:, qi])
        return pa.table(cols)

    want = np.zeros((ngroups, num_buckets), dtype=bool)
    for g, lst in targets.items():
        for _, bkt, _ in lst:
            want[g, bkt] = True
    want_ref = ray.put(want)

    # ---- pass 2: pull only target-bucket rows --------------------------
    def pick(b: pa.Table) -> pa.Table:
        k_tbl, lo_a, w_a = ray.get(plan_ref)
        w_mask = ray.get(want_ref)
        gidx = np.asarray(_group_index(b, by, k_tbl), dtype=np.int64)
        vals = np.asarray(b.column("__v").to_numpy(zero_copy_only=False))
        bk = bucket_of(vals, gidx, lo_a, w_a)
        sel = w_mask[gidx, bk]
        return pa.table({
            "__g": pa.array(gidx[sel]),
            "__bk": pa.array(bk[sel]),
            "__v": pa.array(vals[sel]),
        })

    rows = _collect(vds.map_batches(pick, batch_format="pyarrow"))
    rg = np.asarray(rows.column("__g").to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    rb = np.asarray(rows.column("__bk").to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    rv = np.asarray(rows.column("__v").to_numpy(zero_copy_only=False))

    order = np.lexsort((rv, rb, rg))
    rg, rb, rv = rg[order], rb[order], rv[order]
    # segment starts per (group, bucket)
    for g, lst in targets.items():
        for qi, bkt, off in lst:
            seg = rv[(rg == g) & (rb == bkt)]
            out_vals[g, qi] = seg[off - 1]

    cols = {c: key_tbl.column(c) for c in by}
    for qi, nm in enumerate(names):
        cols[nm] = pa.array(out_vals[:, qi])
    return pa.table(cols)
