"""DSIR importance weights (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): score every raw-corpus
document by how target-domain-like its hashed n-gram feature counts
are, weight = Σ_f c_f(doc)·(ln p̂_target(f) − ln p̂_raw(f)) over hashed
feature buckets.

Feature hashing is made ORACLE-EXACT by bucketing through a
deterministic vocabulary id instead of a string hash: token id = dense
lexicographic rank over the distinct tokens of the whole corpus, bigram
bucket = (id₁·1000003 + id₂) mod K — the same arithmetic a SQL oracle
can run via ROW_NUMBER() OVER (ORDER BY token).

Ray-Data shape:

- The vocabulary is built distributed (grouped_aggregate over unigrams)
  and broadcast once per actor via ``ray.put`` (the bm25/decontaminate
  idiom — vocab is |V| strings, not the corpus).
- Bucket count tables for the target and raw distributions are
  datasets (grouped_aggregate by bucket) — never driver dicts.
- Per-doc scoring attaches both counts with the union-tag bucket-keyed
  exchange (stages/ngram_lm._attach_counts) and reduces per doc; the
  integer sums (n_feat, Σc_f·t_f, Σc_f·r_f) hash exactly against
  DuckDB; the α-smoothed log weight is a per-row float finisher kept
  out of the oracle (libm).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.stages.agg import grouped_aggregate
from gdal_ray.stages.ngram_lm import _attach_counts

_P = 1000003


def build_vocab(docs, *, col: str = "text"):
    """-> sorted list of distinct tokens (the dense-id table).  The
    distinct set is computed distributed; only |V| strings reach the
    driver for the broadcast."""
    def uni(b: pa.Table) -> pa.Table:
        toks = set()
        for t in b.column(col).to_pylist():
            toks.update(x for x in t.split() if x)
        return pa.table({"token": pa.array(sorted(toks), pa.string()),
                         "one": pa.array(np.ones(len(toks), np.int64))})

    dist = grouped_aggregate(docs.map_batches(uni, batch_format="pyarrow"),
                             ["token"], [("one", "sum", "c")])
    return sorted(r["token"] for r in dist.take_all())


def bucket_rows(docs, vocab_ref, *, k: int, col: str = "text",
                id_col: str = "doc_id"):
    """-> Dataset (doc_id, b): one row per bigram position, bucket id
    via the broadcast vocab (tokens outside the vocab are impossible by
    construction when the vocab covers the corpus)."""
    import ray

    class Bucketer:
        def __init__(self):
            v = ray.get(vocab_ref) if hasattr(vocab_ref, "hex") \
                else vocab_ref
            self.idx = {t: i for i, t in enumerate(v)}

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, buckets = [], []
            for d, t in zip(b.column(id_col).to_pylist(),
                            b.column(col).to_pylist()):
                toks = [x for x in t.split() if x]
                tids = np.array([self.idx[x] for x in toks],
                                dtype=np.int64)
                if len(tids) >= 2:
                    bb = (tids[:-1] * _P + tids[1:]) % k
                    ids.append(np.full(len(bb), d, dtype=np.int64))
                    buckets.append(bb)
            if not ids:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())})
            return pa.table({"doc_id": pa.array(np.concatenate(ids)),
                             "b": pa.array(np.concatenate(buckets))})

    return docs.map_batches(Bucketer, concurrency=(1, 4),
                            batch_format="pyarrow")


def _bucket_counts(rows):
    def ones(b: pa.Table) -> pa.Table:
        return b.append_column("one",
                               pa.array(np.ones(len(b), dtype=np.int64)))

    return grouped_aggregate(
        rows.map_batches(ones, batch_format="pyarrow")
            .select_columns(["b", "one"]),
        ["b"], [("one", "sum", "c")])


def dsir_scores(target_docs, raw_docs, *, k: int = 8192,
                col: str = "text", id_col: str = "doc_id",
                vocab: list | None = None):
    """-> per-raw-doc Dataset (doc_id, n_feat, sum_t, sum_r): exact
    integer sums of the target / raw bucket counts over the doc's
    features.  ``vocab`` defaults to the distinct tokens of
    target ∪ raw."""
    import ray

    if vocab is None:
        vocab = build_vocab(target_docs.union(raw_docs), col=col)
    vref = ray.put(vocab)

    t_rows = bucket_rows(target_docs, vref, k=k, col=col, id_col=id_col)
    r_rows = bucket_rows(raw_docs, vref, k=k, col=col, id_col=id_col)
    t_counts = _bucket_counts(t_rows)
    r_counts = _bucket_counts(r_rows)

    score_rows = r_rows
    base = [("doc_id", pa.int64()), ("b", pa.int64())]
    with_t = _attach_counts(score_rows, t_counts, key="b", out="t",
                            row_schema=base)
    with_r = _attach_counts(with_t, r_counts, key="b", out="r",
                            row_schema=base + [("t", pa.int64())])

    def partials(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
            "t": b.column("t"),
            "r": b.column("r"),
        })

    return grouped_aggregate(
        with_r.map_batches(partials, batch_format="pyarrow"),
        ["doc_id"],
        [("one", "sum", "n_feat"), ("t", "sum", "sum_t"),
         ("r", "sum", "sum_r")])


def dsir_logweight(n_feat: np.ndarray, sum_t: np.ndarray,
                   sum_r: np.ndarray, *, n_target: int, n_raw: int,
                   k: int, alpha: float = 1.0) -> np.ndarray:
    """Mean-feature approximation of the DSIR log importance weight
    from the per-doc integer sums: uses the doc-average bucket counts
    t̄ = sum_t/n_feat, r̄ = sum_r/n_feat in the α-smoothed ratio
    ln((t̄+α)/(N_t+αK)) − ln((r̄+α)/(N_r+αK)) · n_feat.  Driver-side
    float (one row per doc); the exact per-feature sum is available by
    scoring before the reduce."""
    n_feat = np.asarray(n_feat, dtype=np.float64)
    tbar = np.asarray(sum_t, dtype=np.float64) / np.maximum(n_feat, 1)
    rbar = np.asarray(sum_r, dtype=np.float64) / np.maximum(n_feat, 1)
    lt = np.log((tbar + alpha) / (n_target + alpha * k))
    lr = np.log((rbar + alpha) / (n_raw + alpha * k))
    return (lt - lr) * n_feat
