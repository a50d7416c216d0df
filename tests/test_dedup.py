"""Dedup operators: MinHash-LSH pipeline vs brute force, simhash batch vs
scalar, and the vectorized text kernels vs straightforward reference
implementations."""

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gdal_ray.stages import dedup as D
from gdal_ray.stages import text as T

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return t.combine_chunks()


def test_minhash_lsh_pairs_equal_brute(ray_session, docs_table):
    """Pipeline (band rows without text + aggregate dedup + join re-fetch)
    must equal the brute-force LSH result: all pairs colliding in >=1 band
    whose exact Jaccard >= threshold."""
    import ray.data as rd

    n = 120
    mask = pa.compute.less(docs_table.column("doc_id"), n)
    sub = docs_table.filter(mask)
    ds = rd.from_arrow(sub)
    got = (
        D.minhash_lsh_pairs(ds, threshold=0.5)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )

    ids = sub.column("doc_id").to_numpy()
    texts = sub.column("text").to_pylist()
    band_tbl = D.minhash_band_rows(sub)
    bh = band_tbl.column("band_hash").to_numpy().reshape(len(ids), 16)
    order = np.argsort(ids, kind="stable")
    want = set()
    for ii in range(len(ids)):
        for jj in range(ii + 1, len(ids)):
            a, b = order[ii], order[jj]
            if (bh[a] == bh[b]).any() and D.jaccard(texts[a], texts[b]) >= 0.5:
                want.add((int(ids[a]), int(ids[b])))
    assert set(zip(got["doc_a"], got["doc_b"])) == want
    assert len(got) == len(want)


def test_simhash_batch_equals_scalar(docs_table):
    sub = docs_table.slice(0, 200)
    batch = D.simhash_batch(sub).column("simhash").to_pylist()
    scalar = [D.simhash64(t) for t in sub.column("text").to_pylist()]
    assert batch == scalar


EDGE = pa.table(
    {
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(
            ["", "   ", "the the the's o'clock, AND.", "a  b\t\nc !!", "héllo wörld", "are are"],
            pa.string(),
        ),
    }
)


@pytest.mark.parametrize("sliced", [False, True])
def test_token_stats_matches_python_reference(docs_table, sliced):
    tbl = docs_table.slice(37, 101) if sliced else EDGE
    texts = tbl.column("text").to_pylist()
    got = T.token_stats_batch(tbl)
    assert got.column("n_tokens").to_pylist() == [len(t.split()) for t in texts]
    assert got.column("n_chars").to_pylist() == [len(t) for t in texts]
    assert got.column("n_alpha").to_pylist() == [
        sum(c.isascii() and c.isalpha() for c in t) for t in texts
    ]


def test_quality_score_matches_python_reference(docs_table):
    word_re = re.compile(r"[A-Za-z']+")
    punct_re = re.compile(r"[.,;:!?]")
    for tbl in (EDGE, docs_table.slice(0, 150)):
        texts = tbl.column("text").to_pylist()
        got = T.QualityScore()(tbl)
        for i, t in enumerate(texts):
            words = word_re.findall(t.lower())
            nw = max(len(words), 1)
            assert got.column("stop_ratio")[i].as_py() == sum(
                w in T.QualityScore.STOPWORDS for w in words
            ) / nw
            assert got.column("punct_per_100")[i].as_py() == 100.0 * len(
                punct_re.findall(t)
            ) / max(len(t), 1)
            assert got.column("mean_word_len")[i].as_py() == sum(len(w) for w in words) / nw


def test_connected_components_chain_and_stars(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.dedup import connected_components

    # component 1: a 30-node chain (diameter 29 — exercises convergence);
    # component 2: a star around 100; plus isolated nodes 200..204
    chain = [(i, i + 1) for i in range(30)]
    star = [(100, 100 + k) for k in range(1, 8)]
    edges = pa.table({
        "doc_a": pa.array([a for a, _ in chain + star], pa.int64()),
        "doc_b": pa.array([b for _, b in chain + star], pa.int64()),
    })
    node_ids = sorted({v for e in chain + star for v in e}
                      | {200, 201, 202, 203, 204})
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array(node_ids, pa.int64())}))
    out = connected_components(rd.from_arrow(edges), nodes).to_pandas()
    lab = dict(zip(out["doc_id"], out["label"]))
    assert all(lab[i] == 0 for i in range(31))
    assert all(lab[100 + k] == 100 for k in range(8))
    assert all(lab[n] == n for n in (200, 201, 202, 203, 204))
    assert len(out) == len(node_ids)


def test_connected_components_path_graph_log_rounds(ray_session):
    """Round-4 gate (VERDICT #5): hash-to-min pointer jumping must converge
    on a worst-case diameter graph (10k-node path) in <= ceil(log2 d)+2
    rounds — plain min-label propagation would need ~d rounds."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.dedup import connected_components

    n = 10_000
    edges = pa.table({
        "doc_a": pa.array(range(n - 1), pa.int64()),
        "doc_b": pa.array(range(1, n), pa.int64()),
    })
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    stats = {}
    out = connected_components(rd.from_arrow(edges), nodes, stats_out=stats).to_pandas()
    assert len(out) == n
    assert (out["label"] == 0).all()          # single component, min id 0
    d = n - 1
    bound = math.ceil(math.log2(d)) + 2
    assert stats["rounds"] <= bound, f"{stats['rounds']} rounds > log2 bound {bound}"
