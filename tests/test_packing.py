"""Sequence packing (stages/packing.py): the distributed prefix-sum plan
must agree with naive single-process concat-and-chunk token placement."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import packing


def _corpus(n=57):
    rng = np.random.RandomState(7)
    texts = []
    for i in range(n):
        if i % 13 == 5:
            texts.append("")            # empty doc → 1 token (EOS)
        elif i % 13 == 9:
            texts.append("   \t \n ")   # whitespace-only → 1 token
        else:
            k = int(rng.randint(1, 40))
            texts.append(" ".join(f"w{i}x{j}" for j in range(k)))
    return texts


def test_pack_plan_matches_naive_placement(ray_session):
    import ray.data as rd
    import zlib

    texts = _corpus()
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    cap = 16
    plan = (packing.pack_plan(ds, capacity=cap, bucket_rows=8)
            .sort("doc_id").take_all())
    assert [r["doc_id"] for r in plan] == ids

    # naive stream: per-doc token ids + EOS, in doc_id order
    stream = []
    naive_off = []
    for t in texts:
        naive_off.append(len(stream))
        stream.extend(1 + (zlib.crc32(w.encode()) % 65535) for w in t.split())
        stream.append(0)

    for r, t, off in zip(plan, texts, naive_off):
        n_tok = len(t.split()) + 1
        assert r["n_tok"] == n_tok
        assert r["tok_off"] == off
        assert r["first_seq"] == off // cap
        assert r["last_seq"] == (off + n_tok - 1) // cap
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
        # the doc's first real token sits at exactly tok_off in the stream
        if t.split():
            tok0 = 1 + (zlib.crc32(t.split()[0].encode()) % 65535)
            assert stream[off] == tok0
        else:
            assert stream[off] == 0  # EOS-only doc

    # materializer agrees with the chunked naive stream
    packed = packing.materialize_packed(texts, capacity=cap)
    n_full = len(stream) // cap
    assert packed.shape == (n_full, cap)
    assert packed.tolist() == [stream[i * cap:(i + 1) * cap]
                               for i in range(n_full)]


def test_global_offsets_sparse_keys_and_bucket_edges(ray_session):
    import ray.data as rd

    # sparse, shuffled keys spanning many tiny buckets (bucket_rows=4)
    keys = np.array([0, 3, 4, 5, 17, 18, 40, 41, 42, 99, 100, 101],
                    dtype=np.int64)
    vals = np.array([5, 1, 7, 2, 3, 11, 1, 1, 9, 4, 6, 2], dtype=np.int64)
    perm = np.random.RandomState(3).permutation(len(keys))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(keys[perm]), "n_tok": pa.array(vals[perm]),
    })).repartition(5)
    out = packing.global_offsets(ds, bucket_rows=4).sort("doc_id").take_all()
    expect = np.concatenate([[0], np.cumsum(vals)[:-1]])
    assert [r["doc_id"] for r in out] == keys.tolist()
    assert [r["tok_off"] for r in out] == expect.tolist()


def test_pack_spans_boundary_math(ray_session):
    # a doc ending exactly at a capacity boundary stays in one sequence
    tbl = pa.table({"n_tok": pa.array([16, 16, 1], pa.int64()),
                    "tok_off": pa.array([0, 16, 32], pa.int64())})
    import ray.data as rd
    out = (packing.pack_spans(rd.from_arrow(tbl), capacity=16)
           .take_all())
    assert [(r["first_seq"], r["last_seq"], r["n_seqs"]) for r in out] == [
        (0, 0, 1), (1, 1, 1), (2, 2, 1)]


def test_assemble_sequences_matches_naive(ray_session):
    import ray.data as rd

    texts = _corpus(40)
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)})).repartition(4)
    cap = 32
    out = (packing.assemble_sequences(ds, capacity=cap, bucket_rows=8,
                                      emit_tokens=True)
           .sort("seq_id").take_all())
    naive = packing.materialize_packed(texts, capacity=cap)
    assert [r["seq_id"] for r in out] == list(range(naive.shape[0]))
    for r in out:
        row = naive[r["seq_id"]]
        assert r["tokens"] == row.astype(np.int32).tolist()
        assert r["n_eos"] == int((row == 0).sum())
    # fragment counts: docs overlapping each sequence window
    offs, pos = [], 0
    for t in texts:
        offs.append((pos, len(t.split()) + 1))
        pos += len(t.split()) + 1
    for r in out:
        k = r["seq_id"]
        want = sum(1 for o, n in offs if o < (k + 1) * cap and o + n > k * cap)
        assert r["n_frags"] == want


def test_write_token_shards_roundtrip(ray_session):
    import os
    import tempfile

    import ray.data as rd

    from gdal_ray.state import tarsink

    texts = _corpus(40)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(3)
    cap = 32
    seqs = packing.assemble_sequences(ds, capacity=cap, bucket_rows=8,
                                      emit_tokens=True)
    out = tempfile.mkdtemp(prefix="tok_shards_")
    stats = packing.write_token_shards(
        seqs, out, shard_seqs=4, lineage="t1").sort("shard").take_all()
    naive = packing.materialize_packed(texts, capacity=cap)
    assert sum(r["n_seqs"] for r in stats) == naive.shape[0]
    got = {}
    for r in stats:
        path = os.path.join(out, f"tokens-{r['shard']:05d}.tar")
        assert os.path.getsize(path) == r["tar_bytes"]
        for name, data in tarsink.read_tar(path):
            sid = int(name.split(".")[0])
            assert sid // 4 == r["shard"]
            got[sid] = np.frombuffer(data, dtype="<u2")
    assert sorted(got) == list(range(naive.shape[0]))
    for sid, arr in got.items():
        assert np.array_equal(arr, naive[sid])
