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


def grid_average(points_ds, *, radius: float = RADIUS):
    """Moving average (GGA_MovingAverage, alg/gdalgrid.cpp
    GDALGridMovingAverage): per cell → point count and Σz with
    z = point_id % 100 (deterministic synthetic observable).  The sum is
    integer-exact, so the SQL oracle hash-matches bit-for-bit; the float
    average is sum_z / n_points."""
    contrib = points_ds.map_batches(
        lambda b: scatter_contributions(b, radius=radius), batch_format="pyarrow"
    )

    def reduce_cell(g: pa.Table) -> pa.Table:
        pid = g.column("point_id").to_numpy()
        return pa.table(
            {
                "cx": pa.array([g.column("cx")[0].as_py()], pa.int64()),
                "cy": pa.array([g.column("cy")[0].as_py()], pa.int64()),
                "n_points": pa.array([len(g)], pa.int64()),
                "sum_z": pa.array([int((pid % 100).sum())], pa.int64()),
            }
        )

    return contrib.groupby(["cx", "cy"]).map_groups(reduce_cell, batch_format="pyarrow")


# ---- GGA_Linear: block-partitioned Delaunay --------------------------------
#
# PARTITIONING ASSUMPTION (documented per SURVEY.md §2 custom-operator
# rule): the lattice is split into coarse blocks of cells; every point
# within `halo` degrees of a block's bbox is replicated to that block,
# and the block triangulates only its replicated neighborhood.  The
# per-block triangles covering the block's own cells equal the global
# Delaunay triangles iff every such triangle's circumcircle lies within
# the halo'd bbox (Delaunay is a local property: a triangle is Delaunay
# iff its circumcircle is point-free).  `halo` must therefore exceed the
# largest circumradius of any triangle that touches a block boundary —
# i.e. points must be dense at the halo scale.  pytest gates exact
# distributed ≡ single-pass equality on the fixture.

BLOCK = 6  # lattice cells per block side


def _linear_block(block_id: int, pts: np.ndarray, ids: np.ndarray):
    """Triangulate one block's neighborhood and interpolate its cells."""
    from gdal_ray.stages.delaunay import delaunay, linear_interpolate

    bx = block_id % ((NX + BLOCK - 1) // BLOCK)
    by = block_id // ((NX + BLOCK - 1) // BLOCK)
    ix = np.arange(bx * BLOCK, min((bx + 1) * BLOCK, NX))
    iy = np.arange(by * BLOCK, min((by + 1) * BLOCK, NY))
    gx, gy = np.meshgrid(X0 + ix * STEP, Y0 + iy * STEP)
    centers = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)
    if len(pts) < 3:
        return centers[:0], np.empty(0)
    # deterministic point order -> deterministic triangulation
    order = np.argsort(ids, kind="stable")
    pts, ids = pts[order], ids[order]
    tris = delaunay(pts)
    z = (ids % 100).astype(np.float64)
    vals, inside = linear_interpolate(pts, z, tris, centers)
    return centers[inside], vals[inside]


def grid_linear(points_ds, *, halo: float = 3.0 * STEP):
    """Triangulated linear interpolation (GGA_Linear, alg/gdalgrid.cpp —
    reference triangulates via vendored qhull alg/delaunay.c): scatter
    points to lattice blocks with a `halo`-degree margin, per-block
    Bowyer–Watson Delaunay + barycentric interpolation of the block's
    cell centers; outside-hull cells are not emitted.  See the
    partitioning assumption above."""
    nbx = (NX + BLOCK - 1) // BLOCK

    def scatter(batch: pa.Table) -> pa.Table:
        px = batch.column("px").to_numpy()
        py = batch.column("py").to_numpy()
        ids = batch.column("point_id").to_numpy()
        w = BLOCK * STEP
        bx0 = np.maximum(np.floor((px - halo - X0) / w).astype(np.int64), 0)
        bx1 = np.minimum(np.floor((px + halo - X0) / w).astype(np.int64), nbx - 1)
        by0 = np.maximum(np.floor((py - halo - Y0) / w).astype(np.int64), 0)
        nby = (NY + BLOCK - 1) // BLOCK
        by1 = np.minimum(np.floor((py + halo - Y0) / w).astype(np.int64), nby - 1)
        nx = np.maximum(bx1 - bx0 + 1, 0)
        ny = np.maximum(by1 - by0 + 1, 0)
        count = nx * ny
        keep = count > 0
        px, py, ids = px[keep], py[keep], ids[keep]
        bx0, by0, nx, ny, count = bx0[keep], by0[keep], nx[keep], ny[keep], count[keep]
        idx = np.repeat(np.arange(len(ids), dtype=np.int64), count)
        starts = np.concatenate([[0], np.cumsum(count)[:-1]])
        ordn = np.arange(int(count.sum()), dtype=np.int64) - np.repeat(starts, count)
        bid = (by0[idx] + ordn // nx[idx]) * nbx + (bx0[idx] + ordn % nx[idx])
        return pa.table(
            {
                "block": pa.array(bid, pa.int64()),
                "point_id": pa.array(ids[idx], pa.int64()),
                "px": pa.array(px[idx], pa.float64()),
                "py": pa.array(py[idx], pa.float64()),
            }
        )

    def reduce_block(g: pa.Table) -> pa.Table:
        bid = int(g.column("block")[0].as_py())
        pts = np.stack(
            [g.column("px").to_numpy(), g.column("py").to_numpy()], axis=1
        )
        centers, vals = _linear_block(bid, pts, g.column("point_id").to_numpy())
        return pa.table(
            {
                "cx": pa.array(centers[:, 0].astype(np.int64), pa.int64()),
                "cy": pa.array(centers[:, 1].astype(np.int64), pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    contrib = points_ds.map_batches(scatter, batch_format="pyarrow")
    return contrib.groupby("block").map_groups(reduce_block, batch_format="pyarrow")


def grid_linear_single(points: np.ndarray, ids: np.ndarray):
    """Single-pass GGA_Linear over the full lattice (test oracle path)."""
    from gdal_ray.stages.delaunay import delaunay, linear_interpolate

    order = np.argsort(ids, kind="stable")
    pts, ids = np.asarray(points, np.float64)[order], np.asarray(ids)[order]
    gx, gy = np.meshgrid(X0 + np.arange(NX) * STEP, Y0 + np.arange(NY) * STEP)
    centers = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)
    tris = delaunay(pts)
    vals, inside = linear_interpolate(
        pts, (ids % 100).astype(np.float64), tris, centers
    )
    return centers[inside], vals[inside]


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


# ---- parameterized lattice (the gdal_grid CLI door) -------------------------
#
# Same replicate-to-cells plan as scatter_contributions, but over an
# arbitrary output raster (extent + size from the command line) and with a
# real z column.  Cell centers are pixel centers: x = xmin + (ci+0.5)·dx,
# y = ymax − (cj+0.5)·dy (row 0 = north, GDAL raster convention).


def lattice_scatter(batch: pa.Table, *, xmin: float, ymax: float,
                    dx: float, dy: float, nx: int, ny: int,
                    radius: float) -> pa.Table:
    """(px, py, z) rows → (ci, cj, z, d2) contribution rows, one per grid
    cell whose center lies within `radius` of the point."""
    px = batch.column("px").to_numpy()
    py = batch.column("py").to_numpy()
    z = batch.column("z").to_numpy().astype(np.float64)
    # cell-center index ranges hit by each point
    ci0 = np.maximum(np.ceil((px - radius - xmin) / dx - 0.5).astype(np.int64), 0)
    ci1 = np.minimum(np.floor((px + radius - xmin) / dx - 0.5).astype(np.int64), nx - 1)
    cj0 = np.maximum(np.ceil((ymax - py - radius) / dy - 0.5).astype(np.int64), 0)
    cj1 = np.minimum(np.floor((ymax - py + radius) / dy - 0.5).astype(np.int64), ny - 1)
    cnx = np.maximum(ci1 - ci0 + 1, 0)
    cny = np.maximum(cj1 - cj0 + 1, 0)
    count = cnx * cny
    keep = count > 0
    px, py, z = px[keep], py[keep], z[keep]
    ci0, cj0, cnx, count = ci0[keep], cj0[keep], cnx[keep], count[keep]
    idx = np.repeat(np.arange(len(z), dtype=np.int64), count)
    starts = np.concatenate([[0], np.cumsum(count)[:-1]])
    ordn = np.arange(int(count.sum()), dtype=np.int64) - np.repeat(starts, count)
    ci = ci0[idx] + ordn % cnx[idx]
    cj = cj0[idx] + ordn // cnx[idx]
    cxc = xmin + (ci + 0.5) * dx
    cyc = ymax - (cj + 0.5) * dy
    ddx = px[idx] - cxc
    ddy = py[idx] - cyc
    d2 = ddx * ddx + ddy * ddy
    inside = d2 <= radius * radius
    return pa.table({
        "ci": pa.array(ci[inside], pa.int64()),
        "cj": pa.array(cj[inside], pa.int64()),
        "z": pa.array(z[idx][inside], pa.float64()),
        "d2": pa.array(d2[inside], pa.float64()),
    })


def lattice_reduce(alg: str, power: float = 2.0):
    """Per-cell aggregate for `lattice_scatter` contributions — the
    GGA_* menu: average, invdist, nearest, count, minimum, maximum,
    range.  Sum order is pinned by (d2, z) lexsort so distributed
    output is deterministic."""

    def reduce_cell(g: pa.Table) -> pa.Table:
        z = g.column("z").to_numpy()
        d2 = g.column("d2").to_numpy()
        order = np.lexsort((z, d2))
        z, d2 = z[order], d2[order]
        if alg == "average":
            val = float(z.sum() / len(z))
        elif alg == "invdist":
            w = np.where(d2 == 0.0, np.inf, d2 ** (-power / 2.0))
            val = (float(z[np.argmax(np.isinf(w))]) if np.isinf(w).any()
                   else float(np.dot(w, z) / w.sum()))
        elif alg == "nearest":
            val = float(z[0])
        elif alg == "count":
            val = float(len(z))
        elif alg == "minimum":
            val = float(z.min())
        elif alg == "maximum":
            val = float(z.max())
        elif alg == "range":
            val = float(z.max() - z.min())
        else:
            raise ValueError(f"unknown gdal_grid algorithm {alg!r}")
        return pa.table({
            "ci": pa.array([g.column("ci")[0].as_py()], pa.int64()),
            "cj": pa.array([g.column("cj")[0].as_py()], pa.int64()),
            "value": pa.array([val], pa.float64()),
        })

    return reduce_cell
