"""SemDeDup (stages/semdedup.py) vs a single-process reference — the
paper's pipeline: k-means clusters, within-cluster cosine >= eps groups,
keep the member farthest from the centroid."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages.semdedup import _group_keep, semdedup

SF = "/root/testdata/sf0.001"


def _reference(ids, vecs, k, eps, iters):
    """Single-process SemDeDup (same seeding/tie rules)."""
    order = np.argsort(ids, kind="stable")[:k]
    cents = vecs[order].astype(np.float64)
    for _ in range(iters):
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        new = np.array([vecs[a == c].mean(axis=0) if (a == c).any()
                        else cents[c] for c in range(k)])
        cents = new
    d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    keep = np.zeros(len(ids), dtype=bool)
    for c in range(k):
        m = np.nonzero(assign == c)[0]
        if not len(m):
            continue
        km, _ = _group_keep(vecs[m].astype(np.float64), ids[m], cents[c],
                            eps)
        keep[m[km]] = True
    return assign, keep


def _load():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in t.column("embedding").to_pylist()])
    return t, ids, vecs


def test_matches_single_process_reference(ray_session):
    t, ids, vecs = _load()
    # the synthetic embeddings are near-orthogonal (embed_neardup's own
    # oracle threshold is 0.4), so a paper-typical eps finds nothing;
    # 0.35 exercises the drop path on this corpus
    k, eps, iters = 6, 0.35, 5
    out = semdedup(rd.from_arrow(t), k=k, eps=eps, iters=iters) \
        .to_pandas().set_index("vec_id").sort_index()
    assign, keep = _reference(ids, vecs, k, eps, iters)
    srt = np.argsort(ids)
    np.testing.assert_array_equal(out["cluster"].to_numpy(), assign[srt])
    np.testing.assert_array_equal(out["keep"].to_numpy(), keep[srt])
    # dedup must actually drop something at this eps, but never everything
    assert 0 < out["keep"].sum() < len(out)


def test_group_keep_rules():
    # three near-identical vectors + one distinct: keep exactly one of
    # the dup group (the one farthest from the centroid) and the loner
    base = np.array([1.0, 0.0])
    vecs = np.stack([base, base * 0.999 + np.array([0, 0.001]),
                     base + np.array([0, 0.002]), np.array([0.0, 1.0])])
    ids = np.array([10, 11, 12, 13])
    cent = np.array([0.9, 0.1])
    keep, csim = _group_keep(vecs, ids, cent, eps=0.999)
    assert keep[3]                      # loner always kept
    assert keep[:3].sum() == 1          # one survivor of the dup group
    surv = np.nonzero(keep[:3])[0][0]
    assert csim[surv] == pytest.approx(csim[:3].min())


def test_eps_one_keeps_only_exact_dups_separate():
    vecs = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    ids = np.array([1, 2, 3])
    keep, _ = _group_keep(vecs, ids, np.array([1.0, 1.0]), eps=1.0 - 1e-12)
    assert keep[1]                      # orthogonal vector untouched
    assert keep[0] ^ keep[2]            # exactly one of the two clones


def test_giant_cluster_guard_identical_keepset():
    """Round-5 guard (VERDICT r4 #8): a cluster larger than the Gram
    bound runs the tiled pair scan — peak memory O(chunk*n), IDENTICAL
    keep-set to the full-Gram path."""
    import numpy as np

    from gdal_ray.stages.semdedup import _group_keep

    rng = np.random.default_rng(5)
    n, d = 3000, 16
    # many exact-duplicate groups inside one "giant" cluster
    base = rng.normal(size=(n // 3, d))
    vecs = np.repeat(base, 3, axis=0)[:n]
    vecs += rng.normal(scale=1e-4, size=vecs.shape)  # near-dup jitter
    ids = rng.permutation(n).astype(np.int64)
    cent = vecs.mean(axis=0)

    keep_full, sim_full = _group_keep(vecs, ids, cent, 0.99,
                                      max_gram_rows=n)
    keep_tiled, sim_tiled = _group_keep(vecs, ids, cent, 0.99,
                                        max_gram_rows=256)
    assert np.array_equal(keep_full, keep_tiled)
    assert np.allclose(sim_full, sim_tiled)
    # the dedup is real: roughly two thirds dropped
    assert keep_full.sum() < n // 2
