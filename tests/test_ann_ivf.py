"""IVF-bucketed ANN: full-probe equals brute force exactly; partial probe
keeps reasonable recall on the fixture embeddings."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _queries(emb):
    head = emb.filter(expr="vec_id < 8").to_pandas().sort_values("vec_id")
    q = np.stack([np.asarray(e, dtype=np.float64) for e in head["embedding"]])
    return q, head["vec_id"].to_numpy()


def test_full_probe_equals_brute(emb):
    from gdal_ray.stages import ann

    q, qids = _queries(emb)
    brute = ann.brute_topk(emb, q, qids, k=5).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    ivf = ann.ivf_topk(emb, q, qids, k=5, n_centroids=8, nprobe=8).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert brute.equals(ivf)


def test_partial_probe_recall(emb):
    from gdal_ray.stages import ann

    q, qids = _queries(emb)
    brute = ann.brute_topk(emb, q, qids, k=5).to_pandas()
    ivf = ann.ivf_topk(emb, q, qids, k=5, n_centroids=8, nprobe=4).to_pandas()
    b = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    v = {(r.query_id, r.neighbor_id) for r in ivf.itertuples()}
    recall = len(b & v) / len(b)
    # random fixture embeddings: half the buckets probed still recovers the
    # query's own bucket neighborhood; loose but meaningful floor
    assert recall >= 0.4, recall
    assert len(ivf) == len(brute)  # k results per query either way
