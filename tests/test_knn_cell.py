"""Hierarchical cell-directory kNN (knn_cell_ring) ≡ brute broadcast kNN
(knn_topk) — including fine zooms where the round-2 flat directory would
have enumerated 4^zoom cells driver-side.  The hierarchical version only
touches non-empty cells (coarse parents first), so zoom 10 (1M-cell grid)
must run fast and exactly match."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.knn import knn_cell_ring, knn_topk


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


@pytest.mark.parametrize("zoom", [3, 6, 10])
def test_cell_ring_equals_brute(ray_session, zoom):
    ds = _points_ds()
    rng = np.random.default_rng(17)
    q = np.stack([rng.uniform(-170, 170, 8), rng.uniform(-80, 80, 8)], axis=1)
    qids = np.arange(100, 108, dtype=np.int64)
    brute = _run(ds, knn_topk, queries=q, query_ids=qids, k=5)
    cell = _run(ds, knn_cell_ring, queries=q, query_ids=qids, k=5, zoom=zoom)
    assert brute.equals(cell), f"zoom={zoom} mismatch"


def test_cell_ring_clustered_points(ray_session):
    # heavy clustering: many points share a cell; directory still exact
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
    cell = _run(ds, knn_cell_ring, queries=q, query_ids=qids, k=7, zoom=10)
    assert brute.equals(cell)
