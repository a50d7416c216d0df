"""Distributed k-means (stages/cluster.py): exact parity with a plain
single-process Lloyd's loop on the same data/seeds, plus the broadcast /
partial-sum structure contracts."""
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.cluster import kmeans_assign, kmeans_fit, _nearest


def _reference_lloyd(v, k, iters):
    cents = v[:k].astype(np.float64).copy()
    for _ in range(iters):
        a, _ = _nearest(v, cents)
        for j in range(k):
            m = a == j
            if m.any():
                cents[j] = v[m].mean(axis=0)
    return cents


def _table(n=400, d=16, seed=3):
    rng = np.random.default_rng(seed)
    # 4 well-separated blobs + noise
    centers = rng.normal(0, 10, (4, d))
    v = centers[rng.integers(0, 4, n)] + rng.normal(0, 1, (n, d))
    return v, pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(v.astype(np.float32)),
                              pa.list_(pa.float32())),
    })


def test_matches_single_process_lloyd(ray_session):
    import ray.data as rd

    v, t = _table()
    ds = rd.from_arrow(t).repartition(7)  # uneven partials
    k, iters = 4, 6
    cents = kmeans_fit(ds, k=k, iters=iters)
    ref = _reference_lloyd(v.astype(np.float32).astype(np.float64), k, iters)
    assert np.allclose(cents, ref, rtol=1e-12, atol=1e-9)
    got = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    a_ref, d_ref = _nearest(v.astype(np.float32).astype(np.float64), ref)
    assert np.array_equal(got["cluster"].to_numpy(), a_ref.astype(np.int32))
    assert np.allclose(got["dist2"].to_numpy(), d_ref, rtol=1e-9, atol=1e-9)


def test_seeds_are_lowest_ids(ray_session):
    import ray.data as rd

    v, t = _table(n=50)
    # shuffle row order; seeds must still be vec_id 0..k-1
    perm = np.random.default_rng(0).permutation(50)
    ds = rd.from_arrow(t.take(pa.array(perm))).repartition(4)
    cents = kmeans_fit(ds, k=3, iters=0)
    assert np.allclose(cents, v[:3], atol=1e-6)


def test_k_exceeds_n_raises(ray_session):
    import ray.data as rd

    _, t = _table(n=5)
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(rd.from_arrow(t), k=9, iters=1)


def test_empty_cluster_keeps_centroid(ray_session):
    import ray.data as rd

    # two identical far points as seeds 0/1; all mass lands on seed 0 —
    # the empty cluster must keep its previous centroid, not NaN out
    v = np.zeros((6, 2), np.float32)
    v[1] = [100.0, 100.0]
    t = pa.table({"vec_id": pa.array(np.arange(6, dtype=np.int64)),
                  "embedding": pa.array(list(v), pa.list_(pa.float32()))})
    cents = kmeans_fit(rd.from_arrow(t), k=2, iters=3)
    assert np.allclose(cents[1], [100.0, 100.0])
    assert not np.isnan(cents).any()
