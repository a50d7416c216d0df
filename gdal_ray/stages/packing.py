"""GPT-style sequence packing: concatenate documents (doc_id order, one
EOS token appended per document) into a single token stream and cut it
into fixed-capacity training sequences.

This is the standard pretraining packing described in public training
pipelines (GPT-2/3 §2.1, The Pile tooling): documents are concatenated
with an end-of-text separator and the stream is chunked into
context-length blocks, so a document may span a sequence boundary.  The
engine op computes each document's global token offset and sequence span
WITHOUT materializing tokens — the plan a packing writer executes.

Core primitive: a distributed exclusive prefix-sum (`global_offsets`)
over a keyed value column.

Scale shape (100 TB): the prefix-sum runs over the tiny (doc_id, n_tok)
projection (16 B/row), never the text.  Docs are range-bucketed by key
(``bucket = key // bucket_rows``); per-bucket totals are one hash-bucket
aggregate whose result — O(n_rows / bucket_rows) rows — is the ONLY
driver-side materialization (a cumsum over bucket totals, broadcast back
inside the group finalizer via closure capture).  Intra-bucket offsets
are a vectorized argsort+cumsum per group.  No global sort of the data,
no driver pass over rows, no shuffle of document text.

Reference parity: GDAL has no packing op (this is a training-data
extension per the build brief); the token count definition is shared
with stages/text.py token_stats_batch, whose whitespace-run semantics
are oracle-pinned against DuckDB's regexp_split_to_array(trim(text),
'\\s+') (queries.SQL_TOKEN_STATS, driver-green since round 2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.stages import text as text_stage
from gdal_ray.stages.agg import grouped_aggregate


def token_counts(ds, *, col: str = "text", eos: int = 1):
    """(doc_id, n_tok) — whitespace-run token count per document plus
    `eos` separator tokens (GPT packing appends one <|endoftext|>)."""

    def counts(b: pa.Table) -> pa.Table:
        if col != "text":
            b = b.rename_columns(
                ["text" if n == col else n for n in b.schema.names])
        s = text_stage.token_stats_batch(b)
        n = s.column("n_tokens").to_numpy(zero_copy_only=False) + int(eos)
        return pa.table({
            "doc_id": s.column("doc_id"),
            "n_tok": pa.array(n.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow")


def global_offsets(ds, *, key: str = "doc_id", val: str = "n_tok",
                   bucket_rows: int = 65536):
    """Distributed EXCLUSIVE prefix sum of `val` in `key` order.

    Returns the input rows plus ``tok_off`` = sum of `val` over all rows
    with a strictly smaller `key`.  Keys must be unique integers (dense
    ids give balanced buckets; sparse ids only unbalance bucket sizes,
    not correctness).

    Two passes over the (key, val) projection:
      1. bucket totals: hash-bucket aggregate → O(max_key/bucket_rows)
         rows to the driver, cumsum → per-bucket base offsets (captured
         by the finalizer closure; at 10^12 rows and bucket_rows=2^20
         that is ~10^6 int64 pairs — megabytes, broadcast once per task
         via Ray's closure serialization).
      2. per-bucket exclusive cumsum (argsort over the group, vectorized)
         + the bucket's base.
    """

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column(key).to_numpy(zero_copy_only=False)
        return b.append_column(
            "pfx_bucket", pa.array((k // bucket_rows).astype(np.int64)))

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow")

    totals = grouped_aggregate(
        keyed, ["pfx_bucket"], [(val, "sum", "tok_sum")], num_buckets=16
    ).take_all()  # O(n/bucket_rows) rows — the documented driver state
    buckets = np.array([r["pfx_bucket"] for r in totals], dtype=np.int64)
    sums = np.array([r["tok_sum"] for r in totals], dtype=np.int64)
    order = np.argsort(buckets)
    buckets, sums = buckets[order], sums[order]
    bases = np.concatenate([[0], np.cumsum(sums)[:-1]])
    base_of = dict(zip(buckets.tolist(), bases.tolist()))

    def scan_group(g: pa.Table) -> pa.Table:
        k = g.column(key).to_numpy(zero_copy_only=False)
        v = g.column(val).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        excl = np.zeros(len(k), dtype=np.int64)
        excl[order] = np.concatenate([[0], np.cumsum(v[order])[:-1]])
        base = base_of[int(k[0]) // bucket_rows]
        g = g.drop_columns(["pfx_bucket"])
        return g.append_column("tok_off", pa.array(excl + base, pa.int64()))

    return keyed.groupby("pfx_bucket").map_groups(scan_group, batch_format="pyarrow")


def pack_spans(ds, *, capacity: int = 1024, val: str = "n_tok",
               off: str = "tok_off"):
    """Sequence span per row from its global offset: first_seq / last_seq
    / n_seqs under fixed-capacity chunking (pure vectorized map)."""

    def spans(b: pa.Table) -> pa.Table:
        o = b.column(off).to_numpy(zero_copy_only=False)
        n = b.column(val).to_numpy(zero_copy_only=False)
        first = o // capacity
        last = (o + n - 1) // capacity
        b = b.append_column("first_seq", pa.array(first.astype(np.int64)))
        b = b.append_column("last_seq", pa.array(last.astype(np.int64)))
        return b.append_column(
            "n_seqs", pa.array((last - first + 1).astype(np.int64)))

    return ds.map_batches(spans, batch_format="pyarrow")


def pack_plan(docs_ds, *, capacity: int = 1024, col: str = "text",
              eos: int = 1, bucket_rows: int = 65536):
    """documents → (doc_id, n_tok, tok_off, first_seq, last_seq, n_seqs)."""
    return pack_spans(
        global_offsets(token_counts(docs_ds, col=col, eos=eos),
                       bucket_rows=bucket_rows),
        capacity=capacity)


# ---------------------------------------------------------------------------
# materializer (test-scale reference semantics)

def materialize_packed(texts: list[str], *, capacity: int,
                       vocab: int = 65536, eos_id: int = 0) -> np.ndarray:
    """Naive single-process reference: tokenize (deterministic hash of
    each whitespace token mod vocab, 0 reserved for EOS), concatenate
    with EOS after every doc, chunk into full `capacity` blocks (the
    ragged tail is dropped, as GPT-style packing does).  Used by tests to
    pin the distributed plan's offsets against real token placement."""
    import zlib

    ids: list[int] = []
    for t in texts:
        ids.extend(1 + (zlib.crc32(w.encode()) % (vocab - 1))
                   for w in t.split())
        ids.extend([eos_id] * 1)
    n_full = len(ids) // capacity
    return np.asarray(ids[: n_full * capacity],
                      dtype=np.uint16).reshape(n_full, capacity)


# ---------------------------------------------------------------------------
# distributed assembly of packed sequences

def _tokenize_words(text: str, vocab: int = 65536) -> list[int]:
    """Deterministic stand-in tokenizer (crc32 of each whitespace token,
    0 reserved for EOS) — matches materialize_packed.  A production BPE
    tokenizer (stages/bpe.BpeEncoder) slots in here unchanged: the
    assembly below only needs per-doc token id lists."""
    import zlib

    return [1 + (zlib.crc32(w.encode()) % (vocab - 1)) for w in text.split()]


def assemble_sequences(docs_ds, *, capacity: int = 512, vocab: int = 65536,
                       bucket_rows: int = 65536, emit_tokens: bool = False):
    """Materialize GPT-style packed sequences: tokenize each doc, place
    its tokens at its global offset, cut into full `capacity` blocks.

    Stages: (1) token counts + global offsets WITH the text carried
    through (one corpus shuffle — inherent: every token must reach its
    sequence owner); (2) flat_map each doc into per-sequence fragments
    (seq_id, pos, token slice); (3) groupby(seq_id) assembly — fragments
    of one sequence land in one task, are placed by position, and only
    COMPLETELY FILLED sequences are emitted (the ragged tail is dropped,
    matching materialize_packed).  Returns per-sequence stats
    (seq_id, n_frags, n_eos) plus the packed `tokens` list column when
    `emit_tokens=True`.

    Scale shape: fragment payloads are token ids (2 B each), bounded by
    capacity per row; the groupby shuffles exactly the training corpus
    once, keyed by dense seq_id (no skew — every sequence is the same
    size by construction)."""

    def counts_keep_text(b: pa.Table) -> pa.Table:
        s = text_stage.token_stats_batch(b)
        n = s.column("n_tokens").to_numpy(zero_copy_only=False) + 1
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": b.column("text"),
            "n_tok": pa.array(n.astype(np.int64), pa.int64()),
        })

    offs = global_offsets(
        docs_ds.map_batches(counts_keep_text, batch_format="pyarrow"),
        bucket_rows=bucket_rows)

    def fragments(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        offv = b.column("tok_off").to_pylist()
        seq_ids, poss, toks = [], [], []
        for did, text, off in zip(ids, texts, offv):
            t = _tokenize_words(text, vocab) + [0]
            for k in range(off // capacity, (off + len(t) - 1) // capacity + 1):
                lo = max(0, k * capacity - off)
                hi = min(len(t), (k + 1) * capacity - off)
                seq_ids.append(k)
                poss.append(off + lo - k * capacity)
                toks.append(t[lo:hi])
        return pa.table({
            "seq_id": pa.array(seq_ids, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "frag": pa.array(toks, pa.list_(pa.int32())),
        })

    frags = offs.map_batches(fragments, batch_format="pyarrow")

    def assemble(g: pa.Table) -> pa.Table:
        seq = int(g.column("seq_id")[0].as_py())
        buf = np.full(capacity, -1, dtype=np.int32)
        n = 0
        for pos, frag in zip(g.column("pos").to_pylist(),
                             g.column("frag").to_pylist()):
            buf[pos:pos + len(frag)] = frag
            n += len(frag)
        if n < capacity:      # ragged tail — dropped like the reference
            return pa.table({
                "seq_id": pa.array([], pa.int64()),
                "n_frags": pa.array([], pa.int64()),
                "n_eos": pa.array([], pa.int64()),
            } | ({"tokens": pa.array([], pa.list_(pa.int32()))}
                 if emit_tokens else {}))
        out = {
            "seq_id": pa.array([seq], pa.int64()),
            "n_frags": pa.array([len(g)], pa.int64()),
            "n_eos": pa.array([int((buf == 0).sum())], pa.int64()),
        }
        if emit_tokens:
            out["tokens"] = pa.array([buf.tolist()], pa.list_(pa.int32()))
        return pa.table(out)

    return frags.groupby("seq_id").map_groups(assemble, batch_format="pyarrow")


def write_token_shards(seq_ds, out_dir: str, *, shard_seqs: int = 1024,
                       lineage: str = "", resume: bool = True):
    """Packed sequences (seq_id, tokens) → WebDataset tar shards of
    uint16-little-endian `.bin` members (`{seq_id:012d}.bin`), shard =
    seq_id // shard_seqs so shards are contiguous in curriculum order.
    Same atomic + lineage-sidecar resume protocol as
    state/tarsink.write_wds_shards; one writer task per shard."""
    import json
    import os

    from gdal_ray.state import tarsink

    os.makedirs(out_dir, exist_ok=True)

    def add_shard(b: pa.Table) -> pa.Table:
        s = b.column("seq_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "shard", pa.array((s // shard_seqs).astype(np.int64)))

    def write_group(g: pa.Table) -> pa.Table:
        shard = int(g.column("shard")[0].as_py())
        path = os.path.join(out_dir, f"tokens-{shard:05d}.tar")
        side = path + ".json"
        if resume and os.path.exists(side):
            meta = json.load(open(side))
            if meta.get("lineage") == lineage and os.path.exists(path):
                return pa.table({
                    "shard": pa.array([shard], pa.int64()),
                    "n_seqs": pa.array([meta["n_seqs"]], pa.int64()),
                    "tar_bytes": pa.array([meta["tar_bytes"]], pa.int64()),
                })
        seqs = g.column("seq_id").to_numpy(zero_copy_only=False)
        toks = g.column("tokens").to_pylist()
        order = np.argsort(seqs, kind="stable")
        members = [(f"{int(seqs[i]):012d}.bin",
                    np.asarray(toks[i], dtype="<u2").tobytes())
                   for i in order]
        nbytes = tarsink.write_tar(path, members)
        with open(side + ".tmp", "w") as f:
            json.dump({"lineage": lineage, "n_seqs": len(members),
                       "tar_bytes": nbytes}, f)
        os.replace(side + ".tmp", side)
        return pa.table({
            "shard": pa.array([shard], pa.int64()),
            "n_seqs": pa.array([len(members)], pa.int64()),
            "tar_bytes": pa.array([nbytes], pa.int64()),
        })

    return (seq_ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard").map_groups(write_group, batch_format="pyarrow"))
