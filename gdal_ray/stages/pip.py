"""Point-in-polygon join — the engine's primitive spatial semi-join.

Semantics mirror the reference's spatial filter (OGRLayer::SetSpatialFilter →
bbox pre-test then exact test, ogr/ogrsf_frmts/generic/ogrlayer.cpp:2129-2330)
with the even-odd/pixel-center containment convention of the scanline
rasterizer (alg/llrasterize.cpp:49-58).

Two physical plans, chosen by polygon-side size (SURVEY.md §2.4):

- **broadcast** (small polygon side): polygons are prepared once (decoded
  rings + bboxes), `ray.put` once, and every `map_batches` actor reads them
  from the object store in __init__ — the classic broadcast join, no shuffle.
- **cell-partitioned** (large polygon side): polygons are replicated to the
  quadkey cells their bbox covers, points keyed by their containing cell;
  one `groupby(cell_id).map_groups` co-partitions both sides.  A point lies
  in exactly one cell, so each (point, polygon) pair is tested exactly once
  — no post-join dedup needed (unlike polygon×polygon algebra).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray import tilemath as tm
from gdal_ray.geometry.predicates import points_in_rings, ring_bbox
from gdal_ray.geometry.wkb import polygon_rings


def prepare_polygons(polys: pa.Table) -> list[tuple[str, tuple, list[np.ndarray]]]:
    """WKB table -> [(poly_id, bbox, rings)] ready for vectorized tests."""
    out = []
    for pid, wkb in zip(polys.column("poly_id").to_pylist(), polys.column("wkb").to_pylist()):
        rings = polygon_rings(wkb)
        out.append((pid, ring_bbox(rings), rings))
    return out


_IDX_NX, _IDX_NY = 64, 32  # coarse world grid for the polygon bucket index


class PolyBucketIndex:
    """Grid-bucket CSR index over polygon bboxes (the in-memory analog of
    the prepared-geometry R-tree the reference builds for spatial
    filters).  Candidate (point, polygon) pairs are generated fully
    vectorized: point → its single bucket, bucket → CSR polygon slice,
    pairs via repeat/arange, then ONE vectorized bbox test over all pairs
    — per-batch cost O(points × polys-per-bucket) instead of
    O(points × polys), which is what a 10^5-polygon broadcast side needs."""

    def __init__(self, prepared):
        entries: list[tuple[int, int]] = []
        P = len(prepared)
        self.bbox = np.empty((P, 4), dtype=np.float64)
        for j, (_, (bx0, by0, bx1, by1), _) in enumerate(prepared):
            self.bbox[j] = (bx0, by0, bx1, by1)
            ix0 = max(int((bx0 + 180.0) / 360.0 * _IDX_NX), 0)
            ix1 = min(int((bx1 + 180.0) / 360.0 * _IDX_NX), _IDX_NX - 1)
            iy0 = max(int((by0 + 90.0) / 180.0 * _IDX_NY), 0)
            iy1 = min(int((by1 + 90.0) / 180.0 * _IDX_NY), _IDX_NY - 1)
            for ix in range(ix0, ix1 + 1):
                for iy in range(iy0, iy1 + 1):
                    entries.append((ix * _IDX_NY + iy, j))
        nb = _IDX_NX * _IDX_NY
        if entries:
            barr = np.array([b for b, _ in entries], dtype=np.int64)
            parr = np.array([p for _, p in entries], dtype=np.int64)
            order = np.argsort(barr, kind="stable")
            self.csr_poly = parr[order]
            self.csr_ptr = np.searchsorted(barr[order], np.arange(nb + 1))
        else:
            self.csr_poly = np.empty(0, dtype=np.int64)
            self.csr_ptr = np.zeros(nb + 1, dtype=np.int64)

    def candidate_pairs(self, px: np.ndarray, py: np.ndarray):
        """-> (point_idx, poly_idx) arrays of bbox-passing pairs."""
        bx = np.clip(((px + 180.0) / 360.0 * _IDX_NX).astype(np.int64), 0, _IDX_NX - 1)
        by = np.clip(((py + 90.0) / 180.0 * _IDX_NY).astype(np.int64), 0, _IDX_NY - 1)
        b = bx * _IDX_NY + by
        s, e = self.csr_ptr[b], self.csr_ptr[b + 1]
        counts = e - s
        if len(px) == 0 or int(counts.sum()) == 0:
            empty = np.empty(0, dtype=np.int64)
            return empty, empty
        pt = np.repeat(np.arange(len(px), dtype=np.int64), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        flat = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(starts, counts)
        pl = self.csr_poly[np.repeat(s, counts) + flat]
        bb = self.bbox[pl]
        ok = (
            (px[pt] >= bb[:, 0]) & (px[pt] <= bb[:, 2])
            & (py[pt] >= bb[:, 1]) & (py[pt] <= bb[:, 3])
        )
        return pt[ok], pl[ok]


def _match_points(px, py, point_ids, prepared, index=None):
    """Bucket-pruned candidate pairs + exact even-odd test per polygon.
    Each point lives in exactly one bucket, so every (point, polygon)
    pair is tested at most once."""
    if index is None:
        index = PolyBucketIndex(prepared)
    pt, pl = index.candidate_pairs(np.asarray(px), np.asarray(py))
    out_pid, out_poly = [], []
    if len(pt) == 0:
        return out_pid, out_poly
    order = np.argsort(pl, kind="stable")
    pt, pl = pt[order], pl[order]
    starts = np.nonzero(np.concatenate([[True], pl[1:] != pl[:-1]]))[0]
    ends = np.append(starts[1:], len(pl))
    for s, e in zip(starts, ends):
        poly_id, _, rings = prepared[int(pl[s])]
        idx = pt[s:e]
        hit = points_in_rings(px[idx], py[idx], rings)
        for k in idx[hit]:
            out_pid.append(point_ids[k])
            out_poly.append(poly_id)
    return out_pid, out_poly


class PIPBroadcastJoin:
    """Actor-pool stage: polygons fetched from the object store once per
    actor (not per batch).  Construct with
    ``map_batches(PIPBroadcastJoin, fn_constructor_kwargs={"polys_ref": [ref]},
    concurrency=N, batch_format="pyarrow")``.
    The ref is wrapped in a list so Ray does not auto-deref it at submission
    — each actor resolves it locally (zero-copy from the shared store).
    """

    def __init__(self, polys_ref=None, polys: pa.Table | None = None):
        import ray

        if polys is None:
            polys = ray.get(polys_ref[0])
        self.prepared = prepare_polygons(polys)
        self.index = PolyBucketIndex(self.prepared)

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column("px").to_numpy()
        py = batch.column("py").to_numpy()
        ids = batch.column("point_id").to_pylist()
        out_pid, out_poly = _match_points(px, py, ids, self.prepared, self.index)
        return pa.table(
            {
                "point_id": pa.array(out_pid, batch.schema.field("point_id").type),
                "poly_id": pa.array(out_poly, pa.string()),
            }
        )


# ---------------------------------------------------------------------------
# cell-partitioned plan

def polygons_to_cell_rows(polys: pa.Table, zoom: int) -> pa.Table:
    """Replicate each polygon to every quadkey cell its bbox covers
    (coarse cover = bbox cover; exact test happens inside the cell group)."""
    pids, wkbs = polys.column("poly_id").to_pylist(), polys.column("wkb").to_pylist()
    cells, rpid, rwkb = [], [], []
    for pid, wkb in zip(pids, wkbs):
        x0c, y0c, x1c, y1c = ring_bbox(polygon_rings(wkb))
        tx0, tx1, ty0, ty1 = tm.bbox_to_tile_range_xyz(
            np.float64(x0c), np.float64(y0c), np.float64(x1c), np.float64(y1c), np.int64(zoom)
        )
        for x in range(int(tx0), int(tx1) + 1):
            for y in range(int(ty0), int(ty1) + 1):
                cells.append(int(tm.quadkey_int(np.int64(x), np.int64(y), np.int64(zoom))))
                rpid.append(pid)
                rwkb.append(wkb)
    return pa.table(
        {
            "cell_id": pa.array(cells, pa.int64()),
            "poly_id": pa.array(rpid, pa.string()),
            "wkb": pa.array(rwkb, pa.binary()),
        }
    )


def points_with_cell(batch: pa.Table, *, zoom: int) -> pa.Table:
    px = batch.column("px").to_numpy()
    py = batch.column("py").to_numpy()
    x, y = tm.lonlat_to_tile_xyz(px, py, zoom)
    cell = tm.quadkey_int(x, y, np.int64(zoom))
    return batch.append_column("cell_id", pa.array(cell, pa.int64()))


def pip_join_cell_partitioned(points_ds, polys: pa.Table, *, zoom: int = 6):
    """Large-side plan: groupby(cell) over the union of tagged point rows and
    replicated polygon rows, exact PIP inside each group.

    Returns a Dataset of (point_id, poly_id).
    """
    import ray
    import ray.data as rd

    poly_cells = polygons_to_cell_rows(polys, zoom)
    pid_type = points_ds.schema().base_schema.field("point_id").type

    # Tag and align both sides onto one unified nullable schema so the
    # union's blocks concatenate cleanly inside the groupby.
    def as_point_rows(b: pa.Table) -> pa.Table:
        b = points_with_cell(b, zoom=zoom)
        n = len(b)
        return pa.table(
            {
                "cell_id": b.column("cell_id"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "point_id": b.column("point_id"),
                "px": b.column("px"),
                "py": b.column("py"),
                "poly_id": pa.nulls(n, pa.string()),
                "wkb": pa.nulls(n, pa.binary()),
            }
        )

    def as_poly_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "cell_id": b.column("cell_id"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "point_id": pa.nulls(n, pid_type),
                "px": pa.nulls(n, pa.float64()),
                "py": pa.nulls(n, pa.float64()),
                "poly_id": b.column("poly_id"),
                "wkb": b.column("wkb"),
            }
        )

    pts = points_ds.map_batches(as_point_rows, batch_format="pyarrow")
    polys_ds = rd.from_arrow(poly_cells).map_batches(as_poly_rows, batch_format="pyarrow")

    def join_group(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy()
        pmask = side == 0
        empty = pa.table(
            {"point_id": pa.array([], pid_type), "poly_id": pa.array([], pa.string())}
        )
        if not pmask.any() or pmask.all():
            return empty
        pts_idx = np.flatnonzero(pmask)
        poly_idx = np.flatnonzero(~pmask)
        poly_ids = g.column("poly_id").take(poly_idx).to_pylist()
        wkbs = g.column("wkb").take(poly_idx).to_pylist()
        prepared = []
        for pid, wkb in zip(poly_ids, wkbs):
            rings = polygon_rings(bytes(wkb))
            prepared.append((pid, ring_bbox(rings), rings))
        px = g.column("px").to_numpy(zero_copy_only=False)[pts_idx]
        py = g.column("py").to_numpy(zero_copy_only=False)[pts_idx]
        ids = g.column("point_id").take(pts_idx).to_pylist()
        out_pid, out_poly = _match_points(px, py, ids, prepared)
        return pa.table(
            {
                "point_id": pa.array(out_pid, pid_type),
                "poly_id": pa.array(out_poly, pa.string()),
            }
        )

    unioned = pts.union(polys_ds)
    return unioned.groupby("cell_id").map_groups(join_group, batch_format="pyarrow")
