"""Scattered-points → regular-grid interpolation — the `gdal_grid` family
(reference: GDALGridCreate alg/gdalgrid.cpp:3649; algorithms GGA_*
alg/gdal_alg.h:402-416 — inverse distance, moving average, nearest, and
the "data metrics" count/min/max/range; quadtree-accelerated per-cell
search alg/gdalgrid.cpp:260-426).

Ray plan (SURVEY.md §2.4 "grid interpolation"): instead of a per-cell
search index, each point is REPLICATED to every grid cell whose center
lies within the search radius (the halo / ring-expansion made explicit),
then one groupby((cx,cy)) computes the per-cell aggregate.  The shuffle
moves (point, cell) contribution rows — small fixed width — never pixels;
skewed cells split fine because contributions are associative.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# default lattice: centers every 10° starting at -175/-85 (exact integer
# coordinates → bit-exact cross-engine distance math)
X0, Y0, STEP, NX, NY = -175, -85, 10, 36, 18
RADIUS = 6.0


def scatter_contributions(batch: pa.Table, *, radius: float = RADIUS) -> pa.Table:
    """(point_id, px, py) rows → one row per (cell, point) pair with the
    point within `radius` of the cell center: (cx, cy, point_id, d2)."""
    px = batch.column("px").to_numpy()
    py = batch.column("py").to_numpy()
    ids = batch.column("point_id").to_numpy()
    ix0 = np.maximum(np.ceil((px - radius - X0) / STEP).astype(np.int64), 0)
    ix1 = np.minimum(np.floor((px + radius - X0) / STEP).astype(np.int64), NX - 1)
    iy0 = np.maximum(np.ceil((py - radius - Y0) / STEP).astype(np.int64), 0)
    iy1 = np.minimum(np.floor((py + radius - Y0) / STEP).astype(np.int64), NY - 1)
    nx = np.maximum(ix1 - ix0 + 1, 0)
    ny = np.maximum(iy1 - iy0 + 1, 0)
    count = nx * ny
    keep = count > 0
    px, py, ids = px[keep], py[keep], ids[keep]
    ix0, iy0, nx, ny, count = ix0[keep], iy0[keep], nx[keep], ny[keep], count[keep]
    idx = np.repeat(np.arange(len(ids), dtype=np.int64), count)
    starts = np.concatenate([[0], np.cumsum(count)[:-1]])
    ordinal = np.arange(int(count.sum()), dtype=np.int64) - np.repeat(starts, count)
    cx = (X0 + (ix0[idx] + ordinal % nx[idx]) * STEP).astype(np.float64)
    cy = (Y0 + (iy0[idx] + ordinal // nx[idx]) * STEP).astype(np.float64)
    dx = px[idx] - cx
    dy = py[idx] - cy
    d2 = dx * dx + dy * dy
    inside = d2 < radius * radius
    return pa.table(
        {
            "cx": pa.array(cx[inside].astype(np.int64), pa.int64()),
            "cy": pa.array(cy[inside].astype(np.int64), pa.int64()),
            "point_id": pa.array(ids[idx][inside], pa.int64()),
            "d2": pa.array(d2[inside], pa.float64()),
        }
    )


def grid_metrics(points_ds, *, radius: float = RADIUS):
    """Data-metrics + nearest (GGA_MetricCount/-Minimum/-Maximum +
    GGA_NearestNeighbor): per cell → n_points, min_d2, max_d2, nearest_id
    (tie-break: smallest point_id among min-d2)."""
    contrib = points_ds.map_batches(
        lambda b: scatter_contributions(b, radius=radius), batch_format="pyarrow"
    )

    def reduce_cell(g: pa.Table) -> pa.Table:
        d2 = g.column("d2").to_numpy()
        pid = g.column("point_id").to_numpy()
        order = np.lexsort((pid, d2))
        return pa.table(
            {
                "cx": pa.array([g.column("cx")[0].as_py()], pa.int64()),
                "cy": pa.array([g.column("cy")[0].as_py()], pa.int64()),
                "n_points": pa.array([len(g)], pa.int64()),
                "min_d2": pa.array([float(d2[order[0]])], pa.float64()),
                "max_d2": pa.array([float(d2.max())], pa.float64()),
                "nearest_id": pa.array([int(pid[order[0]])], pa.int64()),
            }
        )

    return contrib.groupby(["cx", "cy"]).map_groups(reduce_cell, batch_format="pyarrow")


def grid_invdist(points_ds, *, radius: float = RADIUS, power: float = 2.0):
    """Inverse-distance-weighted interpolation (GGA_InverseDistanceToAPower,
    alg/gdalgridsse.cpp inner loop): value = Σ w·z / Σ w, w = d^-power,
    z = point_id % 100 (deterministic synthetic observable).  Float sums
    are order-dependent → rows-only driver check; pytest fixes the order."""
    contrib = points_ds.map_batches(
        lambda b: scatter_contributions(b, radius=radius), batch_format="pyarrow"
    )

    def reduce_cell(g: pa.Table) -> pa.Table:
        pid_all = g.column("point_id").to_numpy()
        order0 = np.argsort(pid_all, kind="stable")  # deterministic sum order
        d2 = g.column("d2").to_numpy()[order0]
        z = (pid_all[order0] % 100).astype(np.float64)
        w = np.where(d2 == 0.0, np.inf, d2 ** (-power / 2.0))
        if np.isinf(w).any():  # exact hit: GDAL returns the point value
            val = float(z[np.argmax(np.isinf(w))])
        else:
            val = float(np.dot(w, z) / w.sum())
        return pa.table(
            {
                "cx": pa.array([g.column("cx")[0].as_py()], pa.int64()),
                "cy": pa.array([g.column("cy")[0].as_py()], pa.int64()),
                "n_points": pa.array([len(g)], pa.int64()),
                "value": pa.array([val], pa.float64()),
            }
        )

    return contrib.groupby(["cx", "cy"]).map_groups(reduce_cell, batch_format="pyarrow")
