"""EXACTSUBSTR dedup (stages/exactsubstr.py) vs a brute-force oracle —
Lee et al. 2022 semantics: spans whose length-L windows each occur >= 2
times anywhere in the corpus (self-repeats included)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages.exactsubstr import (
    cut_spans,
    duplicate_spans,
    duplicated_starts,
)


def _brute_spans(texts: dict[int, str], L: int):
    """Naive reference: true string-equality window counting + merge."""
    from collections import Counter

    wins = Counter()
    for t in texts.values():
        for i in range(len(t) - L + 1):
            wins[t[i:i + L]] += 1
    spans = {}
    for did, t in sorted(texts.items()):
        starts = [i for i in range(len(t) - L + 1)
                  if wins[t[i:i + L]] >= 2]
        merged = []  # [start, end, n_windows, last_start]
        for i in starts:
            if merged and i - merged[-1][3] <= L:
                merged[-1][1] = i + L
                merged[-1][2] += 1
                merged[-1][3] = i
            else:
                merged.append([i, i + L, 1, i])
        spans[did] = [(s, e, n) for s, e, n, _ in merged]
    return spans


DOCS = {
    0: "the quick brown fox jumps over the lazy dog again and again ok",
    1: "zzz the quick brown fox jumps over the lazy dog zzz",
    2: "completely unrelated content with no repeats whatsoever here!",
    3: "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",      # self-repeating run
    4: "prefix the quick brown fox suffix",   # shares a shorter overlap
}


@pytest.mark.parametrize("L", [8, 15])
def test_spans_match_bruteforce(ray_session, L):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(DOCS), pa.int64()),
        "text": pa.array(list(DOCS.values()), pa.string()),
    }))
    got = duplicate_spans(ds, L=L, num_buckets=4).to_pandas()
    exp = _brute_spans(DOCS, L)
    for did, spans in exp.items():
        rows = got[got.doc_id == did].sort_values("start")
        assert len(rows) == len(spans), (did, spans, rows)
        for (s, e, n), r in zip(spans, rows.itertuples()):
            assert (r.start, r.end, r.n_windows) == (s, e, n)
    assert len(got) == sum(len(v) for v in exp.values())


def test_duplicated_starts_bruteforce(ray_session):
    L = 10
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(DOCS), pa.int64()),
        "text": pa.array(list(DOCS.values()), pa.string()),
    }))
    got = duplicated_starts(ds, L=L, num_buckets=4).to_pandas()
    from collections import Counter

    wins = Counter()
    for t in DOCS.values():
        for i in range(len(t) - L + 1):
            wins[t[i:i + L]] += 1
    exp = {(d, i) for d, t in DOCS.items()
           for i in range(len(t) - L + 1) if wins[t[i:i + L]] >= 2}
    assert set(zip(got.doc_id, got.pos)) == exp


def test_cut_spans_removes_exactly(ray_session):
    L = 10
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(DOCS), pa.int64()),
        "text": pa.array(list(DOCS.values()), pa.string()),
    }))
    spans = duplicate_spans(ds, L=L, num_buckets=4)
    out = cut_spans(ds, spans, num_buckets=4).to_pandas() \
        .set_index("doc_id").sort_index()
    exp = _brute_spans(DOCS, L)
    for did, t in DOCS.items():
        kept, prev = [], 0
        for s, e, _ in exp[did]:
            kept.append(t[prev:s])
            prev = e
        kept.append(t[prev:])
        assert out.loc[did, "text"] == "".join(kept)
        assert out.loc[did, "n_cut"] == len(exp[did])
        assert out.loc[did, "cut_bytes"] == sum(e - s for s, e, _ in exp[did])
    # doc 2 has no duplicates: untouched
    assert out.loc[2, "text"] == DOCS[2]
    assert out.loc[2, "n_cut"] == 0


def test_short_docs_skipped(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["tiny", "also tiny"], pa.string()),
    }))
    assert duplicate_spans(ds, L=25, num_buckets=2).count() == 0


def test_hot_window_skew(ray_session):
    """A boilerplate line repeated across thousands of docs lands every
    occurrence in one hash bucket — the skew case.  The bucket pays one
    lexsort (no pairwise work), so this must stay fast and exact."""
    import time

    boiler = "subscribe to our newsletter for daily updates! "
    docs = {i: f"doc {i} intro. {boiler} unique tail {i * 7919}"
            for i in range(2000)}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    }))
    t0 = time.time()
    spans = duplicate_spans(ds, L=20, num_buckets=8).to_pandas()
    dt = time.time() - t0
    # every doc contains the boilerplate -> at least one span each
    assert spans["doc_id"].nunique() == 2000
    # spans cover the boilerplate (its windows repeat 2000x)
    row0 = spans[spans.doc_id == 0].iloc[0]
    assert row0.end - row0.start >= len(boiler) - 1
    assert dt < 60, f"skew path too slow: {dt:.1f}s"
