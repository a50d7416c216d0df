"""Time-series smoothing over event streams: exponentially weighted
moving average (EWMA), the telemetry/metrics smoothing primitive.

EWMA is the linear recurrence y_t = (1-α)·y_{t-1} + α·x_t (pandas
ewm(adjust=False) semantics; y_0 = x_0).  A recurrence looks inherently
serial, but it composes: each row carries an affine map (m, a) meaning
y ↦ m·y + a with m = 1-α, a = α·x (segment starts reset to m = 0,
a = x), and affine maps compose associatively —
(m2,a2)∘(m1,a1) = (m1·m2, a2 + m2·a1).  An inclusive prefix scan by
doubling (the _running_extreme idiom, stages/window.py) therefore
computes every y_t in ⌈log2 n⌉ fully vectorized passes with
per-partition resets — no per-row or per-group Python.

Distribution shape: one bucketed shuffle by the partition keys (the
window_apply plan), vectorized scan per bucket."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.stages.window import _numeric, _segment_arrays, _stable_hash64


def _affine_scan(m: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Inclusive prefix composition of affine maps by doubling:
    returns the accumulated addend (the EWMA value when the chain head
    has m = 0)."""
    n = len(m)
    m = m.copy()
    a = a.copy()
    shift = 1
    idx = np.arange(n)
    while shift < n:
        sel = idx >= shift
        prev_m = m[idx[sel] - shift]
        prev_a = a[idx[sel] - shift]
        a[sel] = a[sel] + m[sel] * prev_a
        m[sel] = m[sel] * prev_m
        shift *= 2
    return a


def ewma_in_table(gs: pa.Table, *, value: str, alpha: float,
                  partition: list[str], order: list[str],
                  out: str = "ewma") -> pa.Table:
    """EWMA column for a table already sorted by partition + order keys
    (the per-bucket kernel)."""
    n = len(gs)
    part_change, _pc_, seg_start, _sid, _ssi = _segment_arrays(
        gs, partition, order)
    vals, valid = _numeric(gs.column(value))
    m = np.full(n, 1.0 - alpha)
    a = alpha * np.where(valid, vals, 0.0)
    starts = np.zeros(n, dtype=bool)
    if n:
        starts[np.flatnonzero(part_change)] = True
    m[starts] = 0.0
    a[starts] = np.where(valid, vals, 0.0)[starts]
    y = _affine_scan(m, a)
    res = pc.if_else(pa.array(valid), pa.array(y),
                     pa.scalar(None, pa.float64()))
    return gs.append_column(out, res)


def ewma(ds, *, value: str, alpha: float, partition: list[str],
         order: list[str], out: str = "ewma", num_buckets: int = 32):
    """Distributed EWMA: one bucketed shuffle by the partition keys,
    then the vectorized affine scan per bucket."""
    sort_keys = [(c, "ascending") for c in partition + order]

    def bucket_fn(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        gs = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        return ewma_in_table(gs, value=value, alpha=alpha,
                             partition=partition, order=order,
                             out=out).drop_columns(["__eb"])

    def add_bucket(b: pa.Table) -> pa.Table:
        h = np.zeros(len(b), dtype=np.uint64)
        for c in partition:
            col = b.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if pa.types.is_integer(col.type):
                v = np.asarray(pc.fill_null(col, 0)).astype(np.uint64)
                hv = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            else:
                hv = _stable_hash64(pc.cast(col, pa.string()))
            h = h * np.uint64(1099511628211) + hv
        return b.append_column(
            "__eb", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__eb")
              .map_groups(bucket_fn, batch_format="pyarrow"))
