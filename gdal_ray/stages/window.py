"""Distributed SQL window functions over ray.data.Dataset.

The reference's SQLite dialect evaluates window functions via sqlite3's
window machinery (ogr/ogrsf_frmts/sqlite/ogrsqliteexecutesql.cpp routes
full SQL to sqlite); the swq dialect has none.  This module is the
Ray-Data-native equivalent for the ANSI subset:

    fn(...) OVER (PARTITION BY p1[, ...] [ORDER BY o1 [DESC][, ...]])

Execution shape (one shuffle per distinct OVER clause):
  1. add ``__wbucket = hash(partition keys) % num_buckets`` per batch —
     many partitions share a bucket, so the per-group Python-call cost of
     ``map_groups`` amortizes over whole buckets, not per partition key;
  2. ``groupby("__wbucket").map_groups(bucket_fn)`` — inside a bucket the
     computation is fully vectorized: one Arrow sort by
     (partition, order) keys, numpy segment boundaries, cumulative /
     reduceat kernels per function.  No per-row or per-partition Python.

Frame semantics match ANSI / DuckDB defaults: with ORDER BY, aggregates
run over RANGE UNBOUNDED PRECEDING .. CURRENT ROW **including peers**
(rows equal on all ORDER BY keys see the same running value); without
ORDER BY they cover the whole partition.  RANK/DENSE_RANK use the same
peer groups.  Running SUM/COUNT/AVG are cumsum-based; running MIN/MAX
use an exact prefix-scan by doubling over peer groups (_running_extreme).  An empty PARTITION BY is one global partition — that is a
single-bucket sort by construction (documented scale hazard, same as any
global window).

Null ordering: Arrow's sort places nulls last for either direction;
queries ordering on nullable keys should fill them first (the oracle
queries use non-null TPC-H keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (fn, needs_arg): supported window functions
_RANKERS = {"ROW_NUMBER", "RANK", "DENSE_RANK", "PERCENT_RANK", "CUME_DIST"}
_RUNNING = {"SUM", "COUNT", "AVG", "MIN", "MAX"}
_SHIFTERS = {"LAG", "LEAD"}
_POSITIONAL = {"NTILE", "FIRST_VALUE", "LAST_VALUE"}
WINDOW_FNS = _RANKERS | _RUNNING | _SHIFTERS | _POSITIONAL


def _adjacent_change(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """bool[n] — True where row i differs from row i-1 (True at 0).
    Dictionary-encode first so the comparison is integer-typed for any
    input type; nulls encode to a sentinel code so null==null holds."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    out = np.ones(n, dtype=bool)
    if n <= 1:
        return out
    if not pa.types.is_dictionary(arr.type):
        arr = pc.dictionary_encode(arr)
    codes = arr.indices.to_numpy(zero_copy_only=False)
    codes = np.where(np.asarray(arr.indices.is_null()), -1, codes)
    out[1:] = codes[1:] != codes[:-1]
    return out


def _segment_arrays(gs: pa.Table, partition: list[str], order: list[str]):
    """(part_change, peer_change, seg_start, seg_id, seg_starts_idx) for a
    table already sorted by partition + order keys."""
    n = len(gs)
    part_change = np.zeros(n, dtype=bool)  # no PARTITION BY: one segment
    if n:
        part_change[0] = True
    for c in partition:
        part_change |= _adjacent_change(gs.column(c))
    peer_change = part_change.copy()
    for c in order:
        peer_change |= _adjacent_change(gs.column(c))
    idx = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(part_change, idx, 0))
    seg_id = np.cumsum(part_change) - 1
    seg_starts_idx = np.flatnonzero(part_change)
    return part_change, peer_change, seg_start, seg_id, seg_starts_idx


def _numeric(col, *, fill=0.0) -> tuple[np.ndarray, np.ndarray]:
    """(float64 values with nulls filled, bool valid-mask)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    valid = ~np.asarray(arr.is_null())
    vals = np.asarray(pc.cast(pc.fill_null(arr, fill), pa.float64()))
    return vals, valid


def _shift_within_segment(gs, name, k, seg_start, seg_end, *, lead=False):
    """LAG/LEAD(col, k): value k rows back/forward inside the partition,
    NULL past the edge — Arrow take + if_else, works for any column type."""
    n = len(gs)
    idx = np.arange(n, dtype=np.int64)
    src = idx + k if lead else idx - k
    valid = (src <= seg_end) if lead else (src >= seg_start)
    col = gs.column(name)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    taken = col.take(pa.array(np.clip(src, 0, n - 1)))
    return pc.if_else(pa.array(valid), taken, pa.scalar(None, col.type))


def _compute_window_columns(gs: pa.Table, partition, order, specs) -> pa.Table:
    """Append one column per spec to gs (already sorted).  specs:
    (out_name, fn, arg_col_or_None, offset)."""
    n = len(gs)
    part_change, peer_change, seg_start, seg_id, seg_starts_idx = \
        _segment_arrays(gs, partition, [c for c, _ in order])
    idx = np.arange(n, dtype=np.int64)
    seg_ends_idx = np.flatnonzero(np.append(part_change[1:], True)) \
        if n else np.empty(0, dtype=np.int64)
    seg_end = seg_ends_idx[seg_id] if n else idx
    peer_id = np.cumsum(peer_change) - 1
    peer_ends_idx = np.flatnonzero(np.append(peer_change[1:], True)) \
        if n else np.empty(0, dtype=np.int64)
    peer_end = peer_ends_idx[peer_id] if n else idx

    for spec in specs:
        out_name, fn, arg, offset = spec[:4]
        frame = spec[4] if len(spec) > 4 else None
        if frame is not None and fn in _RUNNING:
            if fn == "COUNT" and arg is None:
                vals, valid = np.ones(n), np.ones(n, dtype=bool)
            else:
                vals, valid = _numeric(gs.column(arg))
            if frame[0] == "range":
                okey, _ = _numeric(gs.column(order[0][0]))
                res = _range_frame(fn, vals, valid, okey, frame[1],
                                   seg_start, seg_id, peer_end, idx)
            else:
                nfoll = frame[2] if len(frame) > 2 else 0
                if nfoll == 0:
                    res = _rows_frame(fn, vals, valid, frame[1],
                                      seg_start, idx)
                else:
                    res = _rows_frame_following(
                        fn, vals, valid, frame[1], nfoll,
                        seg_start, seg_end, idx)
            gs = gs.append_column(out_name, res)
            continue
        if fn == "ROW_NUMBER":
            res = pa.array(idx - seg_start + 1)
        elif fn == "RANK":
            peer_start = np.maximum.accumulate(np.where(peer_change, idx, 0))
            res = pa.array(peer_start - seg_start + 1)
        elif fn == "DENSE_RANK":
            cp = np.cumsum(peer_change)
            res = pa.array(cp - cp[seg_start] + 1)
        elif fn == "PERCENT_RANK":
            # (rank - 1) / (partition rows - 1); 0 for single-row groups
            peer_start = np.maximum.accumulate(np.where(peer_change, idx, 0))
            rank = (peer_start - seg_start + 1).astype(np.float64)
            cnt = (seg_end - seg_start + 1).astype(np.float64)
            res = pa.array(np.where(cnt > 1, (rank - 1) / np.maximum(cnt - 1, 1), 0.0))
        elif fn == "CUME_DIST":
            # rows with value <= current (peer-inclusive) / partition rows
            cnt = (seg_end - seg_start + 1).astype(np.float64)
            res = pa.array((peer_end - seg_start + 1) / cnt)
        elif fn in _SHIFTERS:
            res = _shift_within_segment(gs, arg, offset, seg_start, seg_end,
                                        lead=(fn == "LEAD"))
        elif fn == "NTILE":
            # ANSI NTILE(n): split the partition into n tiles, the first
            # (count % n) tiles one row larger — offset carries n
            rn0 = idx - seg_start
            cnt = seg_end - seg_start + 1
            nt = int(offset)
            q_, r_ = cnt // nt, cnt % nt
            big = q_ + 1                 # size of the first r_ tiles
            cut = big * r_               # rows covered by the big tiles
            in_big = rn0 < cut
            small = np.where(q_ > 0,
                             (rn0 - cut) // np.maximum(q_, 1) + r_ + 1, 0)
            res = pa.array(np.where(in_big, rn0 // np.maximum(big, 1) + 1,
                                    small).astype(np.int64))
        elif fn == "FIRST_VALUE":
            # default frame starts at the partition head for any ORDER BY
            col = gs.column(arg)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            res = col.take(pa.array(seg_start))
        elif fn == "LAST_VALUE":
            # ANSI default frame RANGE ... CURRENT ROW is peer-inclusive:
            # the frame ends at the LAST PEER row (DuckDB semantics)
            col = gs.column(arg)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            res = col.take(pa.array(peer_end))
        elif fn in _RUNNING:
            if fn == "COUNT" and arg is None:
                vals, valid = np.ones(n), np.ones(n, dtype=bool)
            else:
                vals, valid = _numeric(gs.column(arg))
            if not order:  # whole-partition aggregate
                if n == 0:
                    res = pa.array(np.empty(0), pa.float64())
                elif fn in ("MIN", "MAX"):
                    red = (np.minimum if fn == "MIN" else np.maximum)
                    fill = np.inf if fn == "MIN" else -np.inf
                    tot = red.reduceat(np.where(valid, vals, fill),
                                       seg_starts_idx)[seg_id]
                    cnt = np.add.reduceat(valid.astype(np.float64),
                                          seg_starts_idx)[seg_id]
                    res = pa.array(np.where(cnt > 0, tot, np.nan))
                    res = pc.if_else(pa.array(cnt > 0), res,
                                     pa.scalar(None, pa.float64()))
                else:
                    s = np.add.reduceat(np.where(valid, vals, 0.0),
                                        seg_starts_idx)[seg_id]
                    c = np.add.reduceat(valid.astype(np.float64),
                                        seg_starts_idx)[seg_id]
                    res = _finish_sca(fn, s, c)
            else:  # running, peer-inclusive (RANGE ... CURRENT ROW)
                if fn in ("MIN", "MAX"):
                    ccnt = np.cumsum(valid.astype(np.float64))
                    cnt_base = ccnt[seg_start] - valid[seg_start]
                    run_cnt = ccnt[peer_end] - cnt_base
                    ext = _running_extreme(vals, valid, fn,
                                           peer_change, seg_id)
                    res = pc.if_else(pa.array(run_cnt > 0),
                                     pa.array(ext[peer_id] if n else ext),
                                     pa.scalar(None, pa.float64()))
                    gs = gs.append_column(out_name, res)
                    continue
                csum = np.cumsum(np.where(valid, vals, 0.0))
                ccnt = np.cumsum(valid.astype(np.float64))
                sum_base = csum[seg_start] - np.where(valid, vals, 0.0)[seg_start]
                cnt_base = ccnt[seg_start] - valid[seg_start]
                res = _finish_sca(fn, csum[peer_end] - sum_base,
                                  ccnt[peer_end] - cnt_base)
        else:
            raise NotImplementedError(f"window function {fn}")
        gs = gs.append_column(out_name, res)
    return gs


def _sliding_extreme(v: np.ndarray, w: int, red) -> np.ndarray:
    """out[i] = red(v[i-w+1 : i+1]) for i >= w-1 (head entries are filled
    with the unclamped partial reduce — callers mask them).  The classic
    O(n) block decomposition: prefix reduce within w-blocks + suffix
    reduce within w-blocks; window [i-w+1, i] spans at most two blocks."""
    n = len(v)
    if n == 0:
        return v.copy()
    npad = (-n) % w
    fill = np.inf if red is np.minimum else -np.inf
    vp = np.concatenate([v, np.full(npad, fill)]).reshape(-1, w)
    prefix = red.accumulate(vp, axis=1).ravel()
    suffix = red.accumulate(vp[:, ::-1], axis=1)[:, ::-1].ravel()
    out = prefix.copy()
    i = np.arange(w - 1, n)
    out[i] = red(suffix[i - w + 1], prefix[i])
    return out[:n]


def _range_reduce(v: np.ndarray, lo: np.ndarray, hi: np.ndarray, red):
    """out[i] = red(v[lo[i] : hi[i]+1]) for variable ranges — sparse
    table (doubling) built once: O(n log n) build, O(1) per query,
    fully vectorized.  Requires lo <= hi."""
    n = len(v)
    if n == 0:
        return v.copy()
    nlev = max(1, int(np.floor(np.log2(max(n, 1)))) + 1)
    table = [v]
    span = 1
    for _ in range(nlev - 1):
        prev = table[-1]
        nxt = prev.copy()
        if span < n:
            nxt[:n - span] = red(prev[:n - span], prev[span:])
        table.append(nxt)
        span *= 2
    length = hi - lo + 1
    k = np.zeros(n, dtype=np.int64)
    big = length > 1
    k[big] = np.floor(np.log2(length[big])).astype(np.int64)
    pow2 = (1 << k)
    stacked = np.stack(table)  # (nlev, n)
    left = stacked[k, lo]
    right = stacked[k, hi - pow2 + 1]
    return red(left, right)


def _range_frame(fn: str, vals: np.ndarray, valid: np.ndarray,
                 okey: np.ndarray, k: float, seg_start: np.ndarray,
                 seg_id: np.ndarray, peer_end: np.ndarray,
                 idx: np.ndarray):
    """RANGE BETWEEN k PRECEDING AND CURRENT ROW over one ascending
    numeric ORDER BY key: frame = rows with key in [cur-k, cur],
    peer-inclusive at both ends (ANSI / DuckDB).  lo via one global
    searchsorted over segment-offset-adjusted keys; SUM/COUNT/AVG via
    prefix sums, MIN/MAX via the sparse-table range reduce."""
    n = len(vals)
    if n == 0:
        return pa.array(np.empty(0), pa.float64())
    # make keys globally nondecreasing: offset each segment far enough
    # that cur-k can never reach the previous segment's adjusted range
    span = (np.nanmax(okey) - np.nanmin(okey) if n else 0.0) + abs(k) + 1.0
    adj = okey + seg_id * span
    lo = np.searchsorted(adj, adj - k, side="left")
    lo = np.maximum(lo, seg_start)
    hi = peer_end
    if fn in ("SUM", "COUNT", "AVG"):
        csum = np.concatenate([[0.0], np.cumsum(np.where(valid, vals, 0.0))])
        ccnt = np.concatenate([[0.0], np.cumsum(valid.astype(np.float64))])
        return _finish_sca(fn, csum[hi + 1] - csum[lo], ccnt[hi + 1] - ccnt[lo])
    red = np.minimum if fn == "MIN" else np.maximum
    fill = np.inf if fn == "MIN" else -np.inf
    vf = np.where(valid, vals, fill)
    res = _range_reduce(vf, lo, hi, red)
    ccnt = np.concatenate([[0.0], np.cumsum(valid.astype(np.float64))])
    c = ccnt[hi + 1] - ccnt[lo]
    return pc.if_else(pa.array(c > 0), pa.array(res),
                      pa.scalar(None, pa.float64()))


def _rows_frame_following(fn: str, vals: np.ndarray, valid: np.ndarray,
                          nprec: int | None, nfoll: int | None,
                          seg_start: np.ndarray, seg_end: np.ndarray,
                          idx: np.ndarray):
    """ROWS BETWEEN a PRECEDING|CURRENT ROW AND b|UNBOUNDED FOLLOWING:
    general variable-bound moving window, per-partition clamped.
    SUM/COUNT/AVG via prefix sums; MIN/MAX via the sparse-table range
    reduce (O(n log n) build, O(1) per row)."""
    n = len(vals)
    lo = seg_start if nprec is None else np.maximum(idx - nprec, seg_start)
    hi = seg_end if nfoll is None else np.minimum(idx + nfoll, seg_end)
    if fn in ("SUM", "COUNT", "AVG"):
        csum = np.concatenate([[0.0], np.cumsum(np.where(valid, vals, 0.0))])
        ccnt = np.concatenate([[0.0], np.cumsum(valid.astype(np.float64))])
        return _finish_sca(fn, csum[hi + 1] - csum[lo],
                           ccnt[hi + 1] - ccnt[lo])
    red = np.minimum if fn == "MIN" else np.maximum
    fill = np.inf if fn == "MIN" else -np.inf
    vf = np.where(valid, vals, fill)
    res = _range_reduce(vf, lo, hi, red)
    ccnt = np.concatenate([[0.0], np.cumsum(valid.astype(np.float64))])
    c = ccnt[hi + 1] - ccnt[lo]
    return pc.if_else(pa.array(c > 0), pa.array(res),
                      pa.scalar(None, pa.float64()))


def _rows_frame(fn: str, vals: np.ndarray, valid: np.ndarray,
                nprec: int | None, seg_start: np.ndarray,
                idx: np.ndarray):
    """ROWS BETWEEN nprec PRECEDING AND CURRENT ROW (None = UNBOUNDED):
    row-granular moving aggregate with per-partition clamping, fully
    vectorized.  SUM/COUNT/AVG via cumsum differences; MIN/MAX via the
    block-decomposed sliding reduce, with the partition head (short
    windows) served by a cumulative reduce from the segment start."""
    n = len(vals)
    lo = seg_start if nprec is None else np.maximum(idx - nprec, seg_start)
    if fn in ("SUM", "COUNT", "AVG"):
        csum = np.concatenate([[0.0], np.cumsum(np.where(valid, vals, 0.0))])
        ccnt = np.concatenate([[0.0], np.cumsum(valid.astype(np.float64))])
        s = csum[idx + 1] - csum[lo]
        c = ccnt[idx + 1] - ccnt[lo]
        return _finish_sca(fn, s, c)
    red = np.minimum if fn == "MIN" else np.maximum
    fill = np.inf if fn == "MIN" else -np.inf
    vf = np.where(valid, vals, fill)
    if nprec is None:
        # unbounded: cumulative reduce reset per segment, row granularity
        ext = _running_extreme(vf, valid, fn,
                               np.ones(n, dtype=bool), np.cumsum(
                                   np.asarray(idx == seg_start)) - 1)
        res = ext
    else:
        w = nprec + 1
        full = _sliding_extreme(vf, w, red)
        # head rows (window clipped by the segment start): cumulative
        # reduce from seg_start, also via the doubling scan
        headv = _running_extreme(vf, valid, fn,
                                 np.ones(n, dtype=bool), np.cumsum(
                                     np.asarray(idx == seg_start)) - 1)
        res = np.where(idx - lo + 1 < w, headv, full)
        # a full window may still include a prior segment when the sliding
        # reduce ignored boundaries — but lo clamps to seg_start, so any
        # row with idx - seg_start + 1 < w takes the head path; rows on
        # the full path have their whole window inside the segment.
    ccnt = np.concatenate([[0.0], np.cumsum(valid.astype(np.float64))])
    c = ccnt[idx + 1] - ccnt[lo]
    out = pa.array(res)
    return pc.if_else(pa.array(c > 0), out, pa.scalar(None, pa.float64()))


def _running_extreme(vals, valid, fn, peer_change, seg_id) -> np.ndarray:
    """Running MIN/MAX over peer groups with per-segment reset, exact and
    fully vectorized: one reduceat per peer group, then a prefix-scan by
    doubling (log2(max groups-per-segment) passes) — min/max are
    idempotent so overlapping doubling windows are harmless, and no
    arithmetic lifting is needed (results stay bit-exact)."""
    starts = np.flatnonzero(peer_change)
    ngroups = len(starts)
    if ngroups == 0:
        return np.empty(0)
    red = np.minimum if fn == "MIN" else np.maximum
    fill = np.inf if fn == "MIN" else -np.inf
    out = red.reduceat(np.where(valid, vals, fill), starts)
    gidx = np.arange(ngroups, dtype=np.int64)
    new_seg = np.ones(ngroups, dtype=bool)
    new_seg[1:] = seg_id[starts][1:] != seg_id[starts][:-1]
    seg_first = np.maximum.accumulate(np.where(new_seg, gidx, 0))
    shift = 1
    while shift < ngroups:
        prev = out.copy()
        sel = gidx - shift >= seg_first
        if not sel.any():
            break
        out[sel] = red(out[sel], prev[gidx[sel] - shift])
        shift *= 2
    return out


def _finish_sca(fn: str, s: np.ndarray, c: np.ndarray):
    if fn == "COUNT":
        return pa.array(c.astype(np.int64))
    if fn == "AVG":
        out = pa.array(np.divide(s, c, out=np.full_like(s, np.nan),
                                 where=c > 0))
        return pc.if_else(pa.array(c > 0), out, pa.scalar(None, pa.float64()))
    out = pa.array(s)  # SUM
    return pc.if_else(pa.array(c > 0), out, pa.scalar(None, pa.float64()))


def window_apply(ds, *, partition: list[str], order: list[tuple[str, bool]],
                 specs: list[tuple[str, str, str | None, int]],
                 num_buckets: int = 32):
    """Add window-function columns for ONE OVER clause.

    partition: key column names ([] = one global partition — single-bucket
    sort, use only for small results).  order: [(col, desc)].  specs:
    (out_name, fn, arg_col_or_None, offset) — fn in WINDOW_FNS; offset is
    the LAG/LEAD distance (ignored otherwise).  Rows are returned in
    within-bucket sorted order; overall order is not defined (apply the
    query's ORDER BY after, as SQL requires anyway)."""
    sort_keys = [(c, "ascending") for c in partition] + \
                [(c, "descending" if d else "ascending") for c, d in order]

    def bucket_fn(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        gs = g.take(pc.sort_indices(g, sort_keys=sort_keys)) if sort_keys else g
        return _compute_window_columns(
            gs, partition, order, specs).drop_columns(["__wbucket"])

    if partition:
        def add_bucket(b: pa.Table) -> pa.Table:
            # hash VALUES (process-stable), never dictionary codes
            # (codes are batch-local and would split partitions)
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
                "__wbucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))
    else:
        def add_bucket(b: pa.Table) -> pa.Table:
            return b.append_column(
                "__wbucket", pa.array(np.zeros(len(b), dtype=np.int64)))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__wbucket")
              .map_groups(bucket_fn, batch_format="pyarrow"))


def _stable_hash64(sv: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Process-stable FNV-1a over each value's utf-8 bytes, vectorized over
    the Arrow string buffers (no per-row Python hashing)."""
    arr = sv.combine_chunks() if isinstance(sv, pa.ChunkedArray) else sv
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8) \
        if arr.buffers()[2] is not None else np.empty(0, dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                         count=n + 1 + arr.offset)[arr.offset:]
    out = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    lens = offs[1:] - offs[:-1]
    maxlen = int(lens.max()) if n else 0
    prime = np.uint64(1099511628211)
    for j in range(maxlen):  # loop over byte POSITION, not rows
        sel = lens > j
        b = buf[offs[:-1][sel] + j].astype(np.uint64)
        out[sel] = (out[sel] ^ b) * prime
    # nulls hash to the seed; fine (they partition together)
    return out
