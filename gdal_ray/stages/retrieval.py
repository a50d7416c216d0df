"""Text-retrieval primitives over a document table: term frequencies,
document frequencies, TF-IDF / BM25 scoring, inverted index.

The operator family a training-data pipeline uses for corpus statistics,
quality weighting and retrieval-based filtering.  Tokenization is the
engine's standard whitespace-run split (`split_pattern_regex(text,'\\s+')`
— the DuckDB oracle twin is `regexp_split_to_array(text, '\\s+')`), the
same contract as stages/bpe.word_counts.

Scale design (100 TB corpus):
- `doc_term_rows` is a pure per-batch map (each document row is whole, so
  per-doc term counts are final inside the batch — no shuffle).
- document frequencies reduce through the engine's hash-bucket
  `grouped_aggregate` (only (term, 1) pairs shuffle).
- the (term -> df) side is vocabulary-sized — orders of magnitude smaller
  than the corpus — so for bounded vocabularies scoring BROADCASTS it
  (`ray.put` once, read per actor) instead of shuffling the corpus
  through a join.  Open-vocabulary web text (10^8+ terms at 100 TB)
  routes through the gram-keyed JOIN path instead (round 5, the
  ngram_lm.py count-attachment pattern): tf rows and df rows
  co-partition on term in ONE groupby exchange and scores attach inside
  ``map_groups`` — no driver or broadcast state at any vocabulary size.
  ``path="auto"`` picks by measured vocabulary size
  (VOCAB_BROADCAST_MAX); both paths produce bit-identical scores
  (element-wise IEEE ops, order-free).
- all float scores are single-expression IEEE arithmetic on integer
  inputs, evaluated in the same operation order as the SQL oracle —
  bit-stable across engines (no `ln`, whose libm rounding differs).

Reference parity: the reference engine has no retrieval module; this
family is part of the LLM-data-pipeline surface (SURVEY.md §2 additions,
like stages/dedup.py and stages/text.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.stages.agg import grouped_aggregate

_SPLIT_RE = r"\s+"
BM25_K1 = 1.2
BM25_B = 0.75


def doc_term_rows(ds, *, col: str = "text", id_col: str = "doc_id"):
    """documents -> (doc_id, term, tf, dl) rows.  One map_batches, no
    shuffle: every document is a single input row, so its term counts and
    length are complete within the batch."""

    def per_batch(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b.column(col), _SPLIT_RE)
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        ids = pc.take(b.column(id_col), parent)
        keep = pc.not_equal(flat, "")
        t = pa.table({"doc_id": pc.cast(ids.filter(keep), pa.int64()),
                      "term": flat.filter(keep)})
        tf = t.group_by(["doc_id", "term"]).aggregate([("term", "count")])
        dl = t.group_by(["doc_id"]).aggregate([("term", "count")])
        pos = pc.index_in(tf.column("doc_id"), value_set=dl.column("doc_id"))
        return pa.table({
            "doc_id": tf.column("doc_id"),
            "term": tf.column("term"),
            "tf": pc.cast(tf.column("term_count"), pa.int64()),
            "dl": pc.cast(pc.take(dl.column("term_count"), pos), pa.int64()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def document_frequency(tf_rows, *, num_buckets: int = 16):
    """(doc_id, term, tf, dl) rows -> (term, df) via hash-bucket reduce."""
    ones = tf_rows.map_batches(
        lambda b: pa.table({"term": b.column("term"),
                            "one": pa.array(np.ones(len(b), dtype=np.int64))}),
        batch_format="pyarrow")
    return grouped_aggregate(ones, ["term"], [("one", "sum", "df")],
                             num_buckets=num_buckets)


VOCAB_BROADCAST_MAX = 2_000_000  # terms; larger vocabularies take the
#                                  gram-keyed join path automatically


def _df_map(df_ds) -> dict:
    """Materialize a (term, df) Dataset into the vocabulary-sized
    driver map.  Driver-side state is O(vocabulary), not O(corpus) —
    only valid on the broadcast path (vocab <= VOCAB_BROADCAST_MAX)."""
    import ray
    parts = [ray.get(r) for r in df_ds.to_arrow_refs()]
    tbl = pa.concat_tables([p for p in parts if p.num_rows])
    return dict(zip(tbl.column("term").to_pylist(),
                    tbl.column("df").to_pylist()))


class _ScoreDocs:
    """Actor-pool scoring stage: the (term -> df) map is shipped ONCE per
    actor via ray.put (broadcast), then applied per batch vectorized."""

    def __init__(self, df_ref, n_docs: int, avgdl: float | None,
                 mode: str, min_tf: int):
        import ray
        dfm = ray.get(df_ref)
        # vectorized lookup arrays (built once per actor): index_in
        # against the term vocabulary, then take
        self.terms = pa.array(list(dfm.keys()), pa.string())
        self.dfs = np.fromiter(dfm.values(), dtype=np.int64,
                               count=len(dfm))
        self.n = n_docs
        self.avgdl = avgdl
        self.mode = mode
        self.min_tf = min_tf

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.min_tf > 1:
            b = b.filter(pc.greater_equal(b.column("tf"), self.min_tf))
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        pos = pc.index_in(b.column("term"), value_set=self.terms)
        df = self.dfs[pos.to_numpy(zero_copy_only=False)]
        tf = b.column("tf").to_numpy().astype(np.int64)
        dl = b.column("dl").to_numpy().astype(np.float64)
        score = _score_expr(tf, df, dl, self.n, self.avgdl, self.mode)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "term": b.column("term"),
            "tf": pa.array(tf, pa.int64()),
            "df": pa.array(df, pa.int64()),
            "score": pa.array(score, pa.float64()),
        })


def _score_expr(tf: np.ndarray, df: np.ndarray, dl: np.ndarray,
                n_docs: int, avgdl: float, mode: str) -> np.ndarray:
    """The shared scoring kernel — element-wise IEEE ops in one fixed
    order, so broadcast and join paths (and the SQL oracle) agree
    bit-for-bit."""
    if mode == "tfidf":
        # score = (tf * N) / df — one IEEE division on exact ints
        return (tf * n_docs).astype(np.float64) / df
    idf = (n_docs - df + 0.5) / (df + 0.5)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
    return idf * ((tf * (BM25_K1 + 1.0)) / denom)


def _scored(ds, *, mode: str, min_tf: int, col="text", id_col="doc_id",
            path: str = "auto"):
    """path: 'broadcast' (vocab-sized ray.put map, bounded vocab),
    'join' (gram-keyed co-partition, any vocab size), or 'auto'
    (measured vocabulary size decides)."""
    import ray

    tf_rows = doc_term_rows(ds, col=col, id_col=id_col)
    # corpus totals from the df/tf reduction, not a driver scan
    stats = grouped_aggregate(
        tf_rows.map_batches(
            lambda b: pa.table({
                "k": pa.array(np.zeros(len(b), dtype=np.int64)),
                "tf": b.column("tf"),
                "d": b.column("doc_id")}),
            batch_format="pyarrow"),
        ["k"], [("tf", "sum", "total_tokens")]).take_all()
    total_tokens = int(stats[0]["total_tokens"]) if stats else 0
    n_docs = ds.count()
    avgdl = float(total_tokens) / n_docs if n_docs else 1.0
    df_ds = document_frequency(tf_rows)
    if path == "auto":
        path = "broadcast" if df_ds.count() <= VOCAB_BROADCAST_MAX \
            else "join"
    if path == "broadcast":
        df_ref = ray.put(_df_map(df_ds))
        return tf_rows.map_batches(
            _ScoreDocs,
            fn_constructor_args=(df_ref, n_docs, avgdl, mode, min_tf),
            concurrency=(1, 4), batch_format="pyarrow")
    # open-vocab join path (the ngram_lm._attach_counts pattern): df rows
    # and tf rows hash-bucket by term — 64 coarse buckets, ONE vectorized
    # index_in per bucket, no per-term Python and no driver/broadcast
    # vocabulary state at any vocab size
    from gdal_ray.stages.ngram_lm import _attach_counts

    def tag_tf(b: pa.Table) -> pa.Table:
        if min_tf > 1:
            b = b.filter(pc.greater_equal(b.column("tf"), min_tf))
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "term": b.column("term"),
            "tf": pc.cast(b.column("tf"), pa.int64()),
            "dl": pc.cast(b.column("dl"), pa.int64()),
        })

    df_c = df_ds.map_batches(
        lambda b: pa.table({"term": b.column("term"),
                            "c": pc.cast(b.column("df"), pa.int64())}),
        batch_format="pyarrow")
    rows = _attach_counts(
        tf_rows.map_batches(tag_tf, batch_format="pyarrow"), df_c,
        key="term", out="df",
        row_schema=[("doc_id", pa.int64()), ("term", pa.string()),
                    ("tf", pa.int64()), ("dl", pa.int64())])

    def score_batch(b: pa.Table) -> pa.Table:
        tf = b.column("tf").to_numpy().astype(np.int64)
        dl = b.column("dl").to_numpy().astype(np.float64)
        df = b.column("df").to_numpy().astype(np.int64)
        score = _score_expr(tf, df, dl, n_docs, avgdl, mode)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "term": b.column("term"),
            "tf": pa.array(tf, pa.int64()),
            "df": pa.array(df, pa.int64()),
            "score": pa.array(score, pa.float64()),
        })

    return rows.map_batches(score_batch, batch_format="pyarrow")


def tfidf_scores(ds, *, min_tf: int = 3, col="text", id_col="doc_id",
                 path: str = "auto"):
    """(doc_id, term, tf, df, score) with score = tf·N/df (the idf ratio
    without the log — a single exact division, cross-engine bit-stable).
    ``path``: 'auto' | 'broadcast' | 'join' (open-vocab, no driver
    vocabulary state)."""
    return _scored(ds, mode="tfidf", min_tf=min_tf, col=col,
                   id_col=id_col, path=path)


def bm25_scores(ds, *, min_tf: int = 3, col="text", id_col="doc_id",
                path: str = "auto"):
    """(doc_id, term, tf, df, score) with the BM25 kernel
    idf_ratio · tf(k1+1)/(tf + k1(1-b+b·dl/avgdl)), k1=1.2, b=0.75,
    idf_ratio = (N-df+0.5)/(df+0.5) (log-free for bit-stability).
    ``path`` as in :func:`tfidf_scores`."""
    return _scored(ds, mode="bm25", min_tf=min_tf, col=col,
                   id_col=id_col, path=path)


def bm25_topk(ds, query_terms: list[str], k: int = 20, *,
              col="text", id_col="doc_id"):
    """Query-time BM25 document ranking: per-(doc,term) BM25 scores for
    the query terms, micro-unit integer quantization (floor(score·1e6) —
    a single deterministic IEEE op), exact integer per-doc sum through
    the hash-bucket aggregate (float summation order never matters), and
    a (score desc, doc_id) top-k.  Returns (doc_id, n_terms, score_u)."""
    scored = _scored(ds, mode="bm25", min_tf=1, col=col, id_col=id_col)
    qset = pa.array(sorted(set(query_terms)), pa.string())

    def to_units(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("term"), value_set=qset))
        s = np.floor(b.column("score").to_numpy(zero_copy_only=False)
                     * 1000000.0).astype(np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
            "s": pa.array(s, pa.int64()),
        })

    ranked = grouped_aggregate(
        scored.map_batches(to_units, batch_format="pyarrow"),
        ["doc_id"], [("one", "sum", "n_terms"), ("s", "sum", "score_u")])

    def neg(b: pa.Table) -> pa.Table:
        return b.append_column(
            "neg_score", pc.multiply(b.column("score_u"), pa.scalar(-1)))

    return (ranked.map_batches(neg, batch_format="pyarrow")
            .sort(["neg_score", "doc_id"]).limit(k)
            .drop_columns(["neg_score"]))


def repetition_stats(ds, *, col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition/quality statistics (the Gopher-rule
    family, Rae et al. 2021 §A1.1): token count, distinct-token count,
    duplicate-token fraction (1 - distinct/total) and top-token fraction
    (max tf / total).  Pure per-batch map over (doc_id, term, tf) rows —
    a document never spans batches, so every statistic is final locally;
    no shuffle.  Fractions are single IEEE divisions on exact integers
    (bit-stable vs the SQL oracle)."""

    tf_rows = doc_term_rows(ds, col=col, id_col=id_col)

    def per_batch(b: pa.Table) -> pa.Table:
        g = b.group_by(["doc_id"]).aggregate(
            [("tf", "sum"), ("tf", "count"), ("tf", "max"), ("dl", "max")])
        total = g.column("tf_sum").to_numpy().astype(np.int64)
        ndist = g.column("tf_count").to_numpy().astype(np.int64)
        top = g.column("tf_max").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": g.column("doc_id"),
            "n_tokens": pa.array(total, pa.int64()),
            "n_distinct": pa.array(ndist, pa.int64()),
            "dup_frac": pa.array(
                1.0 - ndist.astype(np.float64) / total, pa.float64()),
            "top_frac": pa.array(
                top.astype(np.float64) / total, pa.float64()),
        })

    return tf_rows.map_batches(per_batch, batch_format="pyarrow")


def _doc_ngrams(text: str, n: int) -> set:
    toks = [t for t in text.split() if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


class _ContaminationCheck:
    """Actor-pool stage: the benchmark n-gram set ships ONCE per actor
    (ray.put broadcast); each batch counts distinct overlapping n-grams
    per document."""

    def __init__(self, bench_ref, n: int, exclude_mod: int | None):
        import ray
        self.bench = ray.get(bench_ref)
        self.n = n
        self.exclude_mod = exclude_mod

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_ids, out_hits = [], []
        for d, t in zip(ids, texts):
            if self.exclude_mod is not None and d % self.exclude_mod == 0:
                continue
            hits = len(_doc_ngrams(t, self.n) & self.bench)
            if hits:
                out_ids.append(d)
                out_hits.append(hits)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "n_hits": pa.array(out_hits, pa.int64())})


def decontaminate(ds, bench_ds, *, n: int = 5, exclude_mod: int | None = None,
                  col: str = "text", id_col: str = "doc_id"):
    """Train/benchmark n-gram decontamination (the GPT-3 appendix-C
    method, Brown et al. 2020: flag training documents sharing any
    word n-gram with an evaluation set).  The benchmark side — small by
    nature — collapses to a distinct n-gram set on the driver and
    BROADCASTS via ray.put; the corpus side streams through an actor
    pool, never shuffling.  Returns (doc_id, n_hits) for flagged docs."""
    import ray

    bench = set()
    for batch in bench_ds.iter_batches(batch_format="pyarrow"):
        for t in batch.column(col).to_pylist():
            bench |= _doc_ngrams(t, n)
    bench_ref = ray.put(frozenset(bench))
    return ds.map_batches(
        _ContaminationCheck,
        fn_constructor_args=(bench_ref, n, exclude_mod),
        concurrency=(1, 4), batch_format="pyarrow")


def dup_ngram_fraction(ds, *, n: int = 5, col: str = "text",
                       id_col: str = "doc_id"):
    """Cross-document substring-duplication signal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for each
    document, the fraction of its word n-gram POSITIONS whose n-gram
    also appears in at least one other document.

    Plan: per-position (doc_id, gram) rows (per-batch flat map) ->
    groupby(gram) computing each gram's distinct-doc count and tagging
    every position row -> hash-bucket reduce by doc.  Two exchanges,
    both over (hashable-key, small-payload) rows — the corpus text never
    moves twice.  At 100-TB scale the gram key would be a 128-bit hash
    instead of the string (collision odds negligible); strings are kept
    here for oracle exactness."""

    def positions(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(col).to_pylist()
        out_ids, out_grams = [], []
        for d, t in zip(ids, texts):
            toks = [x for x in t.split() if x]
            for i in range(len(toks) - n + 1):
                out_ids.append(d)
                out_grams.append(" ".join(toks[i:i + n]))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "gram": pa.array(out_grams, pa.string())})

    rows = ds.map_batches(positions, batch_format="pyarrow")

    def tag(g: pa.Table) -> pa.Table:
        docs = g.column("doc_id")
        df = len(set(docs.to_pylist()))
        dup = 1 if df > 1 else 0
        k = len(g)
        return pa.table({
            "doc_id": docs,
            "one": pa.array(np.ones(k, dtype=np.int64)),
            "dup": pa.array(np.full(k, dup, dtype=np.int64)),
        })

    tagged = rows.groupby("gram").map_groups(tag, batch_format="pyarrow")
    agg = grouped_aggregate(tagged, ["doc_id"],
                            [("one", "sum", "n_grams"),
                             ("dup", "sum", "n_dup")])

    def finish(b: pa.Table) -> pa.Table:
        ng = b.column("n_grams").to_numpy().astype(np.int64)
        nd = b.column("n_dup").to_numpy().astype(np.int64)
        return b.append_column(
            "dup_ngram_frac",
            pa.array(nd.astype(np.float64) / ng, pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def winnow_fingerprints(ds, *, k: int = 3, w: int = 4,
                        col: str = "text", id_col: str = "doc_id"):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003, the MOSS scheme): per document, take the word k-grams, slide a
    window of w consecutive grams, and keep the minimum of each FULL
    window — a position-robust fingerprint set whose size adapts to
    document length.  Selection order here is lexicographic on the gram
    string (hash-free, so the DuckDB oracle is bit-exact); production
    would order by a 64-bit gram hash — identical plan shape.

    Pure per-batch map (documents are whole rows): no shuffle.  Returns
    distinct (doc_id, fp) rows."""

    def per_batch(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(col).to_pylist()
        out_ids, out_fps = [], []
        for d, t in zip(ids, texts):
            toks = [x for x in t.split() if x]
            grams = [" ".join(toks[i:i + k])
                     for i in range(len(toks) - k + 1)]
            fps = {min(grams[i:i + w])
                   for i in range(len(grams) - w + 1)}
            for fp in fps:
                out_ids.append(d)
                out_fps.append(fp)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "fp": pa.array(out_fps, pa.string())})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def inverted_index(ds, *, col="text", id_col="doc_id"):
    """(term, df, postings): the sorted comma-joined doc-id posting list
    per term.  Groups are vocabulary-sized — one shuffle by term."""

    tf_rows = doc_term_rows(ds, col=col, id_col=id_col)

    def build(g: pa.Table) -> pa.Table:
        ids = sorted(g.column("doc_id").to_pylist())
        return pa.table({
            "term": pa.array([g.column("term")[0].as_py()], pa.string()),
            "df": pa.array([len(ids)], pa.int64()),
            "postings": pa.array([",".join(str(i) for i in ids)], pa.string()),
        })

    return tf_rows.groupby("term").map_groups(build, batch_format="pyarrow")
