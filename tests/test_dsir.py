"""DSIR importance weights (stages/dsir.py) vs a single-process
reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages.dsir import (
    _P,
    build_vocab,
    dsir_logweight,
    dsir_scores,
)

TARGET = {0: "clean prose about science topics",
          97: "more clean prose about science"}
RAW = {1: "clean prose about science topics exactly",
       2: "spam spam buy now click here",
       3: "prose about science"}


def _ds(d):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(d), pa.int64()),
        "text": pa.array(list(d.values()), pa.string()),
    }))


def _reference(k):
    vocab = sorted({w for t in {**TARGET, **RAW}.values()
                    for w in t.split()})
    idx = {t: i for i, t in enumerate(vocab)}

    def buckets(text):
        toks = text.split()
        return [(idx[a] * _P + idx[b]) % k
                for a, b in zip(toks, toks[1:])]

    from collections import Counter

    tcnt = Counter(b for t in TARGET.values() for b in buckets(t))
    rcnt = Counter(b for t in RAW.values() for b in buckets(t))
    out = {}
    for did, t in RAW.items():
        bs = buckets(t)
        out[did] = (len(bs), sum(tcnt[b] for b in bs),
                    sum(rcnt[b] for b in bs))
    return out


def test_scores_match_reference(ray_session):
    k = 512
    got = dsir_scores(_ds(TARGET), _ds(RAW), k=k).to_pandas() \
        .set_index("doc_id").sort_index()
    exp = _reference(k)
    for did, (nf, st, sr) in exp.items():
        assert got.loc[did, "n_feat"] == nf
        assert got.loc[did, "sum_t"] == st
        assert got.loc[did, "sum_r"] == sr


def test_logweight_orders_domains(ray_session):
    k = 512
    got = dsir_scores(_ds(TARGET), _ds(RAW), k=k).to_pandas() \
        .set_index("doc_id").sort_index()
    n_t = sum(len(t.split()) - 1 for t in TARGET.values())
    n_r = sum(len(t.split()) - 1 for t in RAW.values())
    w = dsir_logweight(got["n_feat"].to_numpy(),
                       got["sum_t"].to_numpy(),
                       got["sum_r"].to_numpy(),
                       n_target=n_t, n_raw=n_r, k=k)
    per = w / got["n_feat"].to_numpy()
    # the target-like doc must outrank the spam doc
    assert per[got.index.get_loc(1)] > per[got.index.get_loc(2)]


def test_vocab_is_sorted_distinct(ray_session):
    v = build_vocab(_ds(TARGET).union(_ds(RAW)))
    assert v == sorted(set(v))
    assert "spam" in v and "science" in v
