"""Property-based tests (hypothesis) for the round-4b kernels: ROWS/RANGE
window frames, sliding/range extremes, set operations, HLL merge,
quantile selection — each against a brute-force reference on random
inputs."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from gdal_ray.stages.window import (_range_reduce, _rows_frame,
                                    _sliding_extreme)

SMALL_FLOATS = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                         width=32)


@settings(max_examples=120, deadline=None)
@given(st.lists(SMALL_FLOATS, min_size=1, max_size=80),
       st.integers(min_value=1, max_value=12))
def test_sliding_extreme_matches_brute(vals, w):
    v = np.asarray(vals, dtype=np.float64)
    got = _sliding_extreme(v, w, np.minimum)
    for i in range(w - 1, len(v)):
        assert got[i] == v[i - w + 1:i + 1].min()
    got = _sliding_extreme(v, w, np.maximum)
    for i in range(w - 1, len(v)):
        assert got[i] == v[i - w + 1:i + 1].max()


@settings(max_examples=100, deadline=None)
@given(st.lists(SMALL_FLOATS, min_size=1, max_size=60),
       st.integers(min_value=0, max_value=10),
       st.integers(min_value=1, max_value=5),
       st.sampled_from(["SUM", "MIN", "MAX", "COUNT", "AVG"]))
def test_rows_frame_matches_brute(vals, nprec, nseg, fn):
    v = np.asarray(vals, dtype=np.float64)
    n = len(v)
    # random-ish segment structure: nseg segments of near-equal length
    bounds = np.linspace(0, n, nseg + 1).astype(int)
    seg_start = np.zeros(n, dtype=np.int64)
    for a, b in zip(bounds[:-1], bounds[1:]):
        seg_start[a:b] = a
    idx = np.arange(n, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    res = _rows_frame(fn, v, valid, nprec, seg_start, idx)
    res = np.asarray(res.to_numpy(zero_copy_only=False), dtype=np.float64)
    for i in range(n):
        lo = max(i - nprec, seg_start[i])
        win = v[lo:i + 1]
        want = {"SUM": win.sum(), "MIN": win.min(), "MAX": win.max(),
                "COUNT": float(len(win)), "AVG": win.mean()}[fn]
        assert np.isclose(res[i], want, rtol=1e-9), (i, fn)


@settings(max_examples=100, deadline=None)
@given(st.lists(SMALL_FLOATS, min_size=1, max_size=60),
       st.integers(min_value=0, max_value=59),
       st.integers(min_value=0, max_value=59))
def test_range_reduce_matches_brute(vals, a, b):
    v = np.asarray(vals, dtype=np.float64)
    n = len(v)
    lo = np.minimum(np.full(n, a % n), np.arange(n))
    hi = np.maximum(lo, np.minimum(np.full(n, b % n), n - 1))
    lo = np.minimum(lo, hi)
    for red in (np.minimum, np.maximum):
        got = _range_reduce(v, lo, hi, red)
        for i in range(n):
            want = v[lo[i]:hi[i] + 1].min() if red is np.minimum \
                else v[lo[i]:hi[i] + 1].max()
            assert got[i] == want


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=0,
                max_size=60),
       st.lists(st.integers(min_value=0, max_value=30), min_size=0,
                max_size=60))
def test_setop_semantics_vs_python_sets(a_vals, b_vals):
    """The distributed set-op plan's indicator-count filter, replayed on a
    single table, must equal Python set algebra."""
    import collections

    ca = collections.Counter(a_vals)
    cb = collections.Counter(b_vals)
    keys = set(ca) | set(cb)
    union_d = keys
    inter_d = {k for k in keys if ca[k] > 0 and cb[k] > 0}
    except_d = {k for k in keys if ca[k] > 0 and cb[k] == 0}
    # mirror _execute_setop's filter math
    got_union = {k for k in keys if ca[k] + cb[k] > 0}
    got_inter = {k for k in keys if ca[k] > 0 and cb[k] > 0}
    got_except = {k for k in keys if ca[k] > 0 and cb[k] == 0}
    assert got_union == union_d
    assert got_inter == inter_d
    assert got_except == except_d


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
                max_size=400),
       st.integers(min_value=1, max_value=5))
def test_hll_partition_invariance(vals, nparts):
    from gdal_ray.stages.sketch import hll_estimate, hll_merge, hll_partial

    arr = pa.array(vals)
    whole = hll_merge([hll_partial(arr)])
    chunks = np.array_split(np.asarray(vals, dtype=np.int64), nparts)
    parts = hll_merge([hll_partial(pa.array(c)) for c in chunks if len(c)])
    np.testing.assert_array_equal(whole, parts)
    est = hll_estimate(whole)
    true = len(set(vals))
    assert abs(est - true) <= max(3.0, 0.1 * true)


@settings(max_examples=30, deadline=None)
@given(st.lists(SMALL_FLOATS, min_size=2, max_size=200),
       st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0]))
def test_quantile_selection_rank_math(vals, q):
    """The rank/bucket arithmetic of exact_group_quantiles, replayed
    in-process: PERCENTILE_DISC(q) == sorted[ceil(q*n)-1] (min for 0)."""
    import math

    v = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(v)
    r = max(1, int(math.ceil(q * n)))
    want = v[r - 1]
    # histogram-selection replay with a tiny bucket count to stress the
    # bucket walk
    B = 7
    lo, hi = v.min(), v.max()
    width = (hi - lo) / B if hi > lo else 1.0
    bk = np.clip(np.floor((v - lo) / width).astype(int), 0, B - 1)
    counts = np.bincount(bk, minlength=B)
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, r))
    before = int(cum[b - 1]) if b else 0
    seg = np.sort(v[bk == b])
    assert seg[r - before - 1] == want
