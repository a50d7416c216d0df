"""S2-keyed ring-expansion kNN (knn_s2_ring) ≡ brute broadcast kNN
(knn_topk).  The conservative per-cell AABB (stages/s2.py) is only a
bound, so exactness must hold at every level, for clustered points, and
for queries near face seams / high latitudes where the AABB padding is
largest."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.knn import knn_s2_ring, knn_topk


def _points_ds(n=400, seed=9):
    import ray.data

    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "point_id": pa.array(np.arange(n, dtype=np.int64)),
            "px": pa.array(rng.uniform(-170, 170, n)),
            "py": pa.array(rng.uniform(-80, 80, n)),
        }
    )
    return ray.data.from_arrow(t)


def _run(ds, fn, **kw):
    out = fn(ds, **kw).to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


@pytest.mark.parametrize("level", [3, 6, 9])
def test_s2_ring_equals_brute(ray_session, level):
    ds = _points_ds()
    rng = np.random.default_rng(17)
    q = np.stack([rng.uniform(-170, 170, 8), rng.uniform(-80, 80, 8)], axis=1)
    qids = np.arange(100, 108, dtype=np.int64)
    brute = _run(ds, knn_topk, queries=q, query_ids=qids, k=5)
    cell = _run(ds, knn_s2_ring, queries=q, query_ids=qids, k=5, level=level)
    assert brute.equals(cell), f"level={level} mismatch"


def test_s2_ring_high_latitude(ray_session):
    # near-polar points: lon AABB padding saturates to full range —
    # bounds loosen but results must stay exact
    import ray.data

    rng = np.random.default_rng(31)
    n = 300
    t = pa.table(
        {
            "point_id": pa.array(np.arange(n, dtype=np.int64)),
            "px": pa.array(rng.uniform(-180, 180, n)),
            "py": pa.array(rng.uniform(75, 89.9, n)),
        }
    )
    ds = ray.data.from_arrow(t)
    q = np.stack([rng.uniform(-180, 180, 6), rng.uniform(80, 89.5, 6)], axis=1)
    qids = np.arange(6, dtype=np.int64)
    brute = _run(ds, knn_topk, queries=q, query_ids=qids, k=5)
    cell = _run(ds, knn_s2_ring, queries=q, query_ids=qids, k=5, level=7)
    assert brute.equals(cell)


def test_s2_ring_clustered(ray_session):
    import ray.data

    rng = np.random.default_rng(23)
    centers = rng.uniform(-100, 100, (5, 2))
    pts = np.concatenate([c + rng.normal(0, 0.5, (60, 2)) for c in centers])
    t = pa.table(
        {
            "point_id": pa.array(np.arange(len(pts), dtype=np.int64)),
            "px": pa.array(pts[:, 0]),
            "py": pa.array(pts[:, 1]),
        }
    )
    ds = ray.data.from_arrow(t)
    q = centers + 0.1
    qids = np.arange(5, dtype=np.int64)
    brute = _run(ds, knn_topk, queries=q, query_ids=qids, k=7)
    cell = _run(ds, knn_s2_ring, queries=q, query_ids=qids, k=7, level=10)
    assert brute.equals(cell)
