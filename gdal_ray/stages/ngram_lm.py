"""Count-based word n-gram language model: distributed training
(exact n-gram + context counts) and corpus scoring — the CCNet-style
perplexity-filter shape (Wenzek et al. 2020 filter quality by LM score;
KenLM's role played by an add-α smoothed n-gram model, which is the
published baseline the 100-TB pipeline would swap for a real LM).

Ray-Data shape (all exchanges carry (string-key, small-int) rows):

- **Train**: target-domain docs -> per-position gram rows ->
  ``grouped_aggregate`` by gram (and by the (n−1)-word context).  The
  model IS a distributed dataset — never a driver-side dict, so a
  100-TB target corpus trains without materializing anything bigger
  than k hash buckets.
- **Score**: corpus docs -> (doc_id, gram, ctx) rows; count attachment
  is two union-tag exchanges (LM rows ∪ score rows grouped by key —
  the broadcast-free join that works when the model outgrows memory);
  final per-doc reduce is one ``grouped_aggregate``.
- :func:`logprob` turns the per-doc integer sums into the add-α score
  driver-side (one row per doc by then).

Unseen grams hit the α-floor (c = 0), unseen contexts likewise — the
standard add-α estimate p = (c + α) / (cc + α·V).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.stages.agg import grouped_aggregate


def _gram_rows(ds, *, n: int, col: str = "text", id_col: str = "doc_id",
               with_ctx: bool = False):
    def positions(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(col).to_pylist()
        out = {"doc_id": [], "gram": []}
        if with_ctx:
            out["ctx"] = []
        for d, t in zip(ids, texts):
            toks = [x for x in t.split() if x]
            for i in range(len(toks) - n + 1):
                out["doc_id"].append(d)
                out["gram"].append(" ".join(toks[i:i + n]))
                if with_ctx:
                    out["ctx"].append(" ".join(toks[i:i + n - 1]))
        cols = {"doc_id": pa.array(out["doc_id"], pa.int64()),
                "gram": pa.array(out["gram"], pa.string())}
        if with_ctx:
            cols["ctx"] = pa.array(out["ctx"], pa.string())
        return pa.table(cols)

    return ds.map_batches(positions, batch_format="pyarrow")


def train_ngram_counts(docs, *, n: int = 3, col: str = "text",
                       id_col: str = "doc_id"):
    """-> (gram_counts, ctx_counts, vocab_size): two count datasets
    (gram/ctx, c:int64) and the distinct-unigram count (one int)."""
    rows = _gram_rows(docs, n=n, col=col, id_col=id_col, with_ctx=True)

    def ones(b: pa.Table) -> pa.Table:
        return b.append_column("one",
                               pa.array(np.ones(len(b), dtype=np.int64)))

    rows = rows.map_batches(ones, batch_format="pyarrow")
    gram_counts = grouped_aggregate(rows.select_columns(["gram", "one"]),
                                    ["gram"], [("one", "sum", "c")])
    ctx_counts = grouped_aggregate(rows.select_columns(["ctx", "one"]),
                                   ["ctx"], [("one", "sum", "c")])
    uni = _gram_rows(docs, n=1, col=col, id_col=id_col)
    vocab = grouped_aggregate(
        uni.map_batches(ones, batch_format="pyarrow")
           .select_columns(["gram", "one"]),
        ["gram"], [("one", "sum", "c")]).count()
    return gram_counts, ctx_counts, int(vocab)


def _attach_counts(score_rows, counts, *, key: str, out: str,
                   row_schema: list[tuple[str, pa.DataType]],
                   num_buckets: int = 64):
    """Union-tag join: count rows (key, c) ∪ score rows hash-bucketed by
    key; inside each bucket ONE vectorized ``pc.index_in`` maps every
    score row to its count (0 when unseen) — num_buckets Python calls
    total, not one per distinct key.  ``row_schema`` lists the score-row
    columns (name, type) in order so Dataset.union lines up.  At scale,
    size ``num_buckets`` so a bucket (≈ rows / num_buckets) fits one
    task's heap."""
    import pyarrow.compute as pc

    from gdal_ray.stages.agg import _bucket_of

    def tag_counts(b: pa.Table) -> pa.Table:
        cols = {}
        for name, ty in row_schema:
            cols[name] = (b.column(key) if name == key
                          else pa.nulls(len(b), ty))
        cols["__c"] = b.column("c").cast(pa.int64())
        t = pa.table(cols)
        return t.append_column(
            "__bucket", pa.array(_bucket_of(t, [key], num_buckets)))

    def tag_scores(b: pa.Table) -> pa.Table:
        cols = {name: b.column(name) for name, _ in row_schema}
        cols["__c"] = pa.nulls(len(b), pa.int64())
        t = pa.table(cols)
        return t.append_column(
            "__bucket", pa.array(_bucket_of(t, [key], num_buckets)))

    def reattach(g: pa.Table) -> pa.Table:
        is_score = pc.is_null(g.column("__c")).to_numpy(
            zero_copy_only=False)
        lm = g.filter(pa.array(~is_score))
        sc = g.filter(pa.array(is_score)).drop_columns(["__c", "__bucket"])
        if len(sc) == 0:
            return sc.append_column(out, pa.array([], pa.int64()))
        if len(lm) == 0:
            return sc.append_column(
                out, pa.array(np.zeros(len(sc), dtype=np.int64)))
        idx = pc.fill_null(
            pc.index_in(sc.column(key).combine_chunks(),
                        value_set=lm.column(key).combine_chunks()),
            -1).to_numpy(zero_copy_only=False).astype(np.int64)
        cvals = lm.column("__c").to_numpy(zero_copy_only=False)
        got = np.where(idx >= 0, cvals[np.clip(idx, 0, None)], 0)
        return sc.append_column(out, pa.array(got.astype(np.int64)))

    both = (counts.map_batches(tag_counts, batch_format="pyarrow")
                  .union(score_rows.map_batches(tag_scores,
                                                batch_format="pyarrow")))
    return (both.groupby("__bucket")
                .map_groups(reattach, batch_format="pyarrow"))


def score_ngrams(docs, gram_counts, ctx_counts, *, n: int = 3,
                 col: str = "text", id_col: str = "doc_id"):
    """-> per-doc integer sums (doc_id, n_grams, n_hit, sum_c, sum_ctx):
    everything needed for the add-α log score, all exact integers."""
    rows = _gram_rows(docs, n=n, col=col, id_col=id_col, with_ctx=True)
    base = [("doc_id", pa.int64()), ("gram", pa.string()),
            ("ctx", pa.string())]
    with_c = _attach_counts(rows, gram_counts, key="gram", out="c",
                            row_schema=base)
    with_cc = _attach_counts(with_c, ctx_counts, key="ctx", out="cc",
                             row_schema=base + [("c", pa.int64())])

    def partials(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy()
        return pa.table({
            "doc_id": b.column("doc_id"),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
            "hit": pa.array((c > 0).astype(np.int64)),
            "c": b.column("c"),
            "cc": b.column("cc"),
        })

    return grouped_aggregate(
        with_cc.map_batches(partials, batch_format="pyarrow"),
        ["doc_id"],
        [("one", "sum", "n_grams"), ("hit", "sum", "n_hit"),
         ("c", "sum", "sum_c"), ("cc", "sum", "sum_ctx")])


def score_ngrams_logprob(docs, gram_counts, ctx_counts, *, vocab: int,
                         n: int = 3, alpha: float = 1.0,
                         col: str = "text", id_col: str = "doc_id"):
    """-> (doc_id, n_grams, logprob): Σ ln((c+α)/(cc+α·V)) per doc —
    the CCNet-style filter score (lower = more out-of-domain).  Float
    log-space, so rows-only (libm sums can't hash across engines);
    the integer path :func:`score_ngrams` is the oracle twin."""
    rows = _gram_rows(docs, n=n, col=col, id_col=id_col, with_ctx=True)
    base = [("doc_id", pa.int64()), ("gram", pa.string()),
            ("ctx", pa.string())]
    with_c = _attach_counts(rows, gram_counts, key="gram", out="c",
                            row_schema=base)
    with_cc = _attach_counts(with_c, ctx_counts, key="ctx", out="cc",
                             row_schema=base + [("c", pa.int64())])

    def partials(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy().astype(np.float64)
        cc = b.column("cc").to_numpy().astype(np.float64)
        lp = np.log((c + alpha) / (cc + alpha * vocab))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
            "lp": pa.array(lp, pa.float64()),
        })

    return grouped_aggregate(
        with_cc.map_batches(partials, batch_format="pyarrow"),
        ["doc_id"],
        [("one", "sum", "n_grams"), ("lp", "sum", "logprob")])
