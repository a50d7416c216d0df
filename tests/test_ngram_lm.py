"""n-gram LM training/scoring (stages/ngram_lm.py) vs a single-process
reference — the CCNet perplexity-filter shape."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages.ngram_lm import (
    score_ngrams,
    score_ngrams_logprob,
    train_ngram_counts,
)

TARGET = {
    0: "the cat sat on the mat",
    1: "the cat ran on the mat",
}
CORPUS = {
    10: "the cat sat on a log",          # shares 'the cat sat'
    11: "completely different words entirely here",
    12: "the cat sat on the mat again",  # near-copy of target
}


def _counts(texts, n):
    from collections import Counter

    g, c = Counter(), Counter()
    for t in texts.values():
        toks = t.split()
        for i in range(len(toks) - n + 1):
            g[" ".join(toks[i:i + n])] += 1
            c[" ".join(toks[i:i + n - 1])] += 1
    return g, c


def _ds(d):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(d), pa.int64()),
        "text": pa.array(list(d.values()), pa.string()),
    }))


def test_train_counts_exact(ray_session):
    grams, ctxs, vocab = train_ngram_counts(_ds(TARGET), n=3)
    g_exp, c_exp = _counts(TARGET, 3)
    g_got = {r["gram"]: r["c"] for r in grams.take_all()}
    c_got = {r["ctx"]: r["c"] for r in ctxs.take_all()}
    assert g_got == dict(g_exp)
    assert c_got == dict(c_exp)
    assert vocab == len({w for t in TARGET.values() for w in t.split()})


def test_score_integer_sums(ray_session):
    grams, ctxs, _ = train_ngram_counts(_ds(TARGET), n=3)
    out = score_ngrams(_ds(CORPUS), grams, ctxs, n=3).to_pandas() \
        .set_index("doc_id").sort_index()
    g_exp, c_exp = _counts(TARGET, 3)
    for did, t in CORPUS.items():
        toks = t.split()
        trigs = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        ctxs2 = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 2)]
        assert out.loc[did, "n_grams"] == len(trigs)
        assert out.loc[did, "n_hit"] == sum(g in g_exp for g in trigs)
        assert out.loc[did, "sum_c"] == sum(g_exp.get(g, 0) for g in trigs)
        assert out.loc[did, "sum_ctx"] == sum(c_exp.get(c, 0)
                                              for c in ctxs2)
    # the near-copy scores strictly more hits than the unrelated doc
    assert out.loc[12, "n_hit"] > out.loc[11, "n_hit"] == 0


def test_logprob_matches_reference(ray_session):
    grams, ctxs, vocab = train_ngram_counts(_ds(TARGET), n=3)
    out = score_ngrams_logprob(_ds(CORPUS), grams, ctxs, vocab=vocab,
                               n=3, alpha=0.5).to_pandas() \
        .set_index("doc_id").sort_index()
    g_exp, c_exp = _counts(TARGET, 3)
    for did, t in CORPUS.items():
        toks = t.split()
        lp = 0.0
        for i in range(len(toks) - 2):
            g = " ".join(toks[i:i + 3])
            cx = " ".join(toks[i:i + 2])
            lp += np.log((g_exp.get(g, 0) + 0.5)
                         / (c_exp.get(cx, 0) + 0.5 * vocab))
        assert out.loc[did, "logprob"] == pytest.approx(lp, rel=1e-12)
    # in-domain near-copy scores higher than the unrelated doc
    per = out["logprob"] / out["n_grams"]
    assert per.loc[12] > per.loc[11]
