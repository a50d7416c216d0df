"""BPE training (stages/bpe.py): distributed word counts vs DuckDB, merge
loop vs a naive reference, distributed encode vs local encode."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.bpe import (BpeEncoder, bpe_encode_word, bpe_train,
                                 bpe_train_distributed, word_counts)

SF_DIR = "/root/testdata/sf0.001"


def _naive_bpe(word_freqs, num_merges):
    """Straight-from-the-paper reference (Sennrich et al. 2016 fig. 1)."""
    vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items() if w}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = \
                    pairs.get((sym[i], sym[i + 1]), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        new_vocab = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and (sym[i], sym[i + 1]) == best):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
        merges.append(best)
    return merges


def test_merge_loop_vs_reference():
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "low-key": 1}
    assert bpe_train(wf, 12) == _naive_bpe(wf, 12)


def test_word_counts_vs_duckdb(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet")
    got = {r["word"]: r["n"] for r in word_counts(ds).take_all()}
    con = duckdb.connect()
    want = con.execute(
        f"SELECT w AS word, COUNT(*) AS n FROM (SELECT unnest("
        f"regexp_split_to_array(text, '\\s+')) AS w FROM "
        f"'{SF_DIR}/documents.parquet') WHERE w <> '' GROUP BY w").df()
    want = dict(zip(want["word"], want["n"]))
    assert got == want


def test_distributed_train_equals_local(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet").repartition(5)
    merges_d = bpe_train_distributed(ds, num_merges=40)

    import pyarrow.parquet as pq
    texts = pq.read_table(f"{SF_DIR}/documents.parquet") \
        .column("text").to_pylist()
    wf = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    assert merges_d == bpe_train(wf, 40)


def test_encode_roundtrip_and_distributed(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet")
    merges = bpe_train_distributed(ds, num_merges=30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # encode preserves the characters (concat of tokens == word + </w>)
    for w in ("the", "synthetic", "tokenizer", "a"):
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks) == w + "</w>"
    rows = ds.map_batches(
        BpeEncoder, fn_constructor_args=(merges,),
        concurrency=(1, 2), batch_size=64,
        batch_format="pyarrow").take_all()
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet")
    texts = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("text").to_pylist()))
    for r in rows[:50]:
        words = [w for w in texts[r["doc_id"]].split() if w]
        assert r["n_words"] == len(words)
        want = sum(len(bpe_encode_word(w, ranks)) for w in words)
        assert r["n_tokens"] == want
    # more merges -> never more tokens
    merges2 = bpe_train_distributed(ds, num_merges=60)
    ranks2 = {tuple(p): i for i, p in enumerate(merges2)}
    for w in ("synthetic", "tokenizer", "document"):
        assert len(bpe_encode_word(w, ranks2)) <= len(bpe_encode_word(w, ranks))
