"""GGA_Linear (Delaunay + barycentric) and GGA_MovingAverage grid
algorithms (stages/delaunay.py, stages/grid.py).

Reference: alg/gdalgrid.cpp GDALGridLinear (qhull triangulation,
alg/delaunay.c) and GDALGridMovingAverage."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.delaunay import _circumcircles, delaunay, linear_interpolate
from gdal_ray.stages import grid


def _rand_pts(n, seed=5, lo=0.0, hi=10.0):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.uniform(lo, hi, size=(n, 2))


def test_delaunay_property_empty_circumcircles():
    pts = _rand_pts(60)
    tris = delaunay(pts)
    assert len(tris) > 0
    cc, r2 = _circumcircles(pts, tris)
    # no point strictly inside any circumcircle
    for t in range(len(tris)):
        d2 = ((pts - cc[t]) ** 2).sum(1)
        inside = d2 < r2[t] * (1 - 1e-9)
        inside[tris[t]] = False
        assert not inside.any()


def test_delaunay_triangle_count_euler():
    # for points in general position: T = 2n - 2 - h (h = hull vertices)
    pts = _rand_pts(40, seed=9)
    tris = delaunay(pts)
    # count hull vertices via edge-use parity: hull edges appear once
    edges = np.vstack([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    ekey = np.sort(edges, axis=1)
    _, counts = np.unique(ekey, axis=0, return_counts=True)
    h = (counts == 1).sum()
    assert len(tris) == 2 * len(pts) - 2 - h


def test_delaunay_order_invariance():
    pts = _rand_pts(30, seed=4)
    t1 = delaunay(pts)
    rng = np.random.Generator(np.random.PCG64(1))
    perm = rng.permutation(len(pts))
    t2 = delaunay(pts[perm])
    # map t2's indices back to original labels and canonicalize
    back = perm[t2]
    back = np.sort(back, axis=1)
    assert np.array_equal(
        np.sort(np.sort(t1, axis=1), axis=0),
        np.sort(back, axis=0),
    )


def test_linear_interpolation_reproduces_plane_exactly():
    pts = _rand_pts(50, seed=7)
    z = 2.0 + 3.0 * pts[:, 0] - 5.0 * pts[:, 1]
    tris = delaunay(pts)
    q = _rand_pts(200, seed=8, lo=2.0, hi=8.0)  # interior queries
    vals, inside = linear_interpolate(pts, z, tris, q)
    assert inside.all()
    expect = 2.0 + 3.0 * q[:, 0] - 5.0 * q[:, 1]
    assert np.abs(vals - expect).max() < 1e-9


def test_linear_interpolation_outside_hull_masked():
    pts = _rand_pts(20, seed=2)
    tris = delaunay(pts)
    vals, inside = linear_interpolate(
        pts, np.zeros(len(pts)), tris, np.array([[100.0, 100.0]])
    )
    assert not inside[0] and np.isnan(vals[0])


def test_degenerate_inputs():
    assert len(delaunay(np.zeros((2, 2)))) == 0
    col = np.stack([np.arange(5.0), np.arange(5.0)], axis=1)  # collinear
    assert len(delaunay(col)) == 0


def _fixture_points(n=800, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    ids = np.arange(n, dtype=np.int64)
    px = rng.uniform(-175, 175, n)
    py = rng.uniform(-85, 85, n)
    return ids, px, py


def test_grid_linear_distributed_equals_single_pass(ray_session):
    import ray.data as rd

    ids, px, py = _fixture_points()
    t = pa.table({
        "point_id": pa.array(ids, pa.int64()),
        "px": pa.array(px, pa.float64()),
        "py": pa.array(py, pa.float64()),
    })
    got = (grid.grid_linear(rd.from_arrow(t).repartition(4))
           .to_pandas().sort_values(["cx", "cy"]).reset_index(drop=True))
    centers, vals = grid.grid_linear_single(
        np.stack([px, py], axis=1), ids)
    order = np.lexsort((centers[:, 1], centers[:, 0]))
    assert len(got) == len(centers)
    assert np.array_equal(got["cx"].to_numpy(),
                          centers[order, 0].astype(np.int64))
    assert np.array_equal(got["cy"].to_numpy(),
                          centers[order, 1].astype(np.int64))
    # exact equality: with a sufficient halo the per-block triangles
    # covering each block's cells equal the global Delaunay triangles
    assert np.array_equal(got["value"].to_numpy(), vals[order])


def test_grid_average_matches_brute(ray_session):
    import ray.data as rd

    ids, px, py = _fixture_points(300, seed=12)
    t = pa.table({
        "point_id": pa.array(ids, pa.int64()),
        "px": pa.array(px, pa.float64()),
        "py": pa.array(py, pa.float64()),
    })
    got = (grid.grid_average(rd.from_arrow(t).repartition(3))
           .to_pandas().set_index(["cx", "cy"]).sort_index())
    # brute force
    brute = {}
    for cxi in range(grid.NX):
        for cyi in range(grid.NY):
            cx = grid.X0 + cxi * grid.STEP
            cy = grid.Y0 + cyi * grid.STEP
            d2 = (px - cx) ** 2 + (py - cy) ** 2
            m = d2 < grid.RADIUS ** 2
            if m.any():
                brute[(cx, cy)] = (int(m.sum()), int((ids[m] % 100).sum()))
    assert set(got.index) == set(brute)
    for k, (n, s) in brute.items():
        assert got.loc[k, "n_points"] == n
        assert got.loc[k, "sum_z"] == s
