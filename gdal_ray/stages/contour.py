"""Contour polyline extraction + assembly — `gdal_contour`
(reference: alg/marching_squares/contour_generator.h segment emission,
segment_merger.h chaining, GDALContourGenerateEx alg/contour.cpp:568).

Two plans:
- :func:`contour_polylines` — single-pass per grid (runs per image inside
  map_batches, no shuffle);
- :func:`distributed_contours` — per-tile extraction + cross-tile chain
  stitching (groupby(doc, level) union-find over border endpoints), the
  same stitch pattern as polygonize.distributed_components; results equal
  the single-pass assembly exactly (pytest-verified).

Geometry convention: grid vertex (r, c) sits at coordinate (x=c, y=r);
a crossing on the edge between two vertices is linearly interpolated at
t = (level − v0) / (v1 − v0).  Both cells sharing an edge compute the
identical t from the identical corner values, so endpoints match
bit-for-bat across cells AND across tiles — chaining can key on exact
coordinates.
"""

from __future__ import annotations

import numpy as np

# marching-squares segment table: case (tl,tr,br,bl bits, corner >= level)
# → list of (edge_in, edge_out); edges: 0=top, 1=right, 2=bottom, 3=left.
# Saddles (5, 10) emit two segments; the convention pairs top-left.
_SEGS = {
    0: [], 15: [],
    1: [(3, 2)], 14: [(3, 2)],
    2: [(2, 1)], 13: [(2, 1)],
    3: [(3, 1)], 12: [(3, 1)],
    4: [(0, 1)], 11: [(0, 1)],
    6: [(0, 2)], 9: [(0, 2)],
    7: [(3, 0)], 8: [(3, 0)],
    5: [(3, 0), (1, 2)],
    10: [(0, 1), (2, 3)],
}


def _edge_point(e: np.ndarray, r: int, c: int, edge: int, level: float):
    """Crossing coordinate on an edge of cell (r, c): (x, y) floats."""
    if edge == 0:    # top: (r, c) — (r, c+1)
        v0, v1 = e[r, c], e[r, c + 1]
        t = (level - v0) / (v1 - v0)
        return (c + t, float(r))
    if edge == 2:    # bottom: (r+1, c) — (r+1, c+1)
        v0, v1 = e[r + 1, c], e[r + 1, c + 1]
        t = (level - v0) / (v1 - v0)
        return (c + t, float(r + 1))
    if edge == 3:    # left: (r, c) — (r+1, c)
        v0, v1 = e[r, c], e[r + 1, c]
        t = (level - v0) / (v1 - v0)
        return (float(c), r + t)
    v0, v1 = e[r, c + 1], e[r + 1, c + 1]   # right
    t = (level - v0) / (v1 - v0)
    return (float(c + 1), r + t)


def contour_segments(e: np.ndarray, level: float, *, r0: int = 0, c0: int = 0):
    """All marching-squares segments of one grid at `level` as
    [((x1,y1),(x2,y2))], coordinates offset by (c0, r0) (tile placement)."""
    e = np.asarray(e, dtype=np.float64)
    h, w = e.shape
    ge = e >= level
    segs = []
    for r in range(h - 1):
        for c in range(w - 1):
            case = (ge[r, c] << 3) | (ge[r, c + 1] << 2) | (ge[r + 1, c + 1] << 1) | ge[r + 1, c]
            for e_in, e_out in _SEGS[case]:
                p1 = _edge_point(e, r, c, e_in, level)
                p2 = _edge_point(e, r, c, e_out, level)
                segs.append(((p1[0] + c0, p1[1] + r0), (p2[0] + c0, p2[1] + r0)))
    return segs


def assemble_chains(segs):
    """Chain segments into polylines by exact endpoint matching
    (segment_merger.h semantics).  Returns (n_closed, n_open, total_pts)
    plus the chains themselves."""
    from collections import defaultdict

    adj = defaultdict(list)
    for i, (a, b) in enumerate(segs):
        adj[a].append((i, b))
        adj[b].append((i, a))
    used = [False] * len(segs)
    chains = []
    for i, (a, b) in enumerate(segs):
        if used[i]:
            continue
        used[i] = True
        chain = [a, b]
        # extend forward
        while True:
            end = chain[-1]
            nxt = next(((j, o) for j, o in adj[end] if not used[j]), None)
            if nxt is None:
                break
            used[nxt[0]] = True
            chain.append(nxt[1])
        # extend backward
        while True:
            start = chain[0]
            nxt = next(((j, o) for j, o in adj[start] if not used[j]), None)
            if nxt is None:
                break
            used[nxt[0]] = True
            chain.insert(0, nxt[1])
        chains.append(chain)
    n_closed = sum(1 for ch in chains if ch[0] == ch[-1])
    n_open = len(chains) - n_closed
    return n_closed, n_open, sum(len(ch) for ch in chains), chains


def contour_polylines(e: np.ndarray, levels) -> dict:
    """Single-pass: {level: (n_closed, n_open, n_points, n_segments)}."""
    out = {}
    for lv in levels:
        segs = contour_segments(e, lv)
        n_closed, n_open, npts, _ = assemble_chains(segs)
        out[lv] = (n_closed, n_open, npts, len(segs))
    return out


# ---------------------------------------------------------------------------
# distributed: per-tile segments + chain-count stitching.
#
# Chains = connected components of the segment graph; counting them
# distributedly is the same union-find-over-borders pattern as CCL:
# per tile we count local chain components and emit the OPEN endpoints
# that lie on a tile border; the stitch joins chains whose endpoints
# coincide across the border.  n_global = Σ local − merges (each endpoint
# match joins two chain components; a match that closes a loop does not
# reduce the count but converts open→closed — tracked via cycle
# detection in the union-find).

def tile_contour_summary(e_tile: np.ndarray, level: float, r0: int, c0: int,
                         r_max: float, c_max: float):
    """Per-tile: (n_chains_local, border endpoint list, n_segments).
    Border endpoints = chain ends lying on the tile's OUTER border that is
    interior to the full grid (shared with a neighbor tile)."""
    segs = contour_segments(e_tile, level, r0=r0, c0=c0)
    n_closed, n_open, _, chains = assemble_chains(segs)
    h, w = e_tile.shape
    borders = []
    for ci, ch in enumerate(chains):
        if ch[0] == ch[-1]:
            continue
        for endpoint in (ch[0], ch[-1]):
            x, y = endpoint
            on_border = (
                (x == c0 and c0 > 0) or (x == c0 + w - 1 and c0 + w - 1 < c_max)
                or (y == r0 and r0 > 0) or (y == r0 + h - 1 and r0 + h - 1 < r_max)
            )
            if on_border:
                borders.append((ci, x, y))
    return len(chains), n_closed, len(segs), borders


def distributed_contours(docs_ds, *, grid_fn, levels, tile: int):
    """docs → per-(doc, level, tile) segment extraction + local chaining →
    groupby(doc, level) border stitch (union-find over exact endpoint
    matches) → (doc_id, level, n_chains, n_closed, n_open, n_segments).

    Levels must avoid exact data values (use half-integers) so no crossing
    lands on a grid vertex — then every border endpoint has degree 2 and
    the stitch is exact (GDAL's contour fudge, alg/contour.cpp, serves the
    same purpose).  Tiles overlap by one VERTEX row/col (cells are
    disjoint), so facing tiles compute identical border crossings.
    """
    import pyarrow as pa

    def extract(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        grids = grid_fn(ids)
        n = grids.shape[1]
        nt = (n - 1 + tile - 1) // tile  # cell-rows per axis / tile
        out = {k: [] for k in ("doc_id", "level", "tidx", "n_chains", "n_closed",
                                "n_segments", "b_chain", "b_x", "b_y")}
        for i, d in enumerate(ids):
            for lv in levels:
                for tyi in range(nt):
                    for txi in range(nt):
                        r0, c0 = tyi * tile, txi * tile
                        r1 = min(r0 + tile, n - 1)
                        c1 = min(c0 + tile, n - 1)
                        sub = grids[i, r0 : r1 + 1, c0 : c1 + 1]
                        n_ch, n_cl, n_seg, borders = tile_contour_summary(
                            sub, lv, r0, c0, n - 1, n - 1
                        )
                        out["doc_id"].append(int(d))
                        out["level"].append(float(lv))
                        out["tidx"].append(tyi * nt + txi)
                        out["n_chains"].append(n_ch)
                        out["n_closed"].append(n_cl)
                        out["n_segments"].append(n_seg)
                        out["b_chain"].append([b[0] for b in borders])
                        out["b_x"].append([b[1] for b in borders])
                        out["b_y"].append([b[2] for b in borders])
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "level": pa.array(out["level"], pa.float64()),
                "tidx": pa.array(out["tidx"], pa.int64()),
                "n_chains": pa.array(out["n_chains"], pa.int64()),
                "n_closed": pa.array(out["n_closed"], pa.int64()),
                "n_segments": pa.array(out["n_segments"], pa.int64()),
                "b_chain": pa.array(out["b_chain"], pa.list_(pa.int64())),
                "b_x": pa.array(out["b_x"], pa.list_(pa.float64())),
                "b_y": pa.array(out["b_y"], pa.list_(pa.float64())),
            }
        )

    def stitch(g: pa.Table) -> pa.Table:
        from collections import defaultdict

        nodes = {}
        node_ep = []          # open-endpoint count per node (2 open / 0 closed)
        parent = []

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra == rb:
                return False
            parent[max(ra, rb)] = min(ra, rb)
            return True

        local_closed = 0
        n_segments = 0
        matches = defaultdict(list)
        tidxs = g.column("tidx").to_numpy()
        closeds = g.column("n_closed").to_numpy()
        segs = g.column("n_segments").to_numpy()
        b_chains = g.column("b_chain").to_pylist()
        b_xs = g.column("b_x").to_pylist()
        b_ys = g.column("b_y").to_pylist()
        for i in range(len(g)):
            t = int(tidxs[i])
            local_closed += int(closeds[i])
            n_segments += int(segs[i])
            # nodes only for chains that reach a shared border; other
            # chains never merge and are covered by the totals below
            for ci, x, y in zip(b_chains[i], b_xs[i], b_ys[i]):
                key = (t, int(ci))
                if key not in nodes:
                    nodes[key] = len(parent)
                    parent.append(len(parent))
                    node_ep.append(2)
                matches[(float(x), float(y))].append(nodes[key])
        total_chains = int(g.column("n_chains").to_numpy().sum())
        merges = 0
        matched_ep = defaultdict(int)  # node -> matched endpoint count
        for pt, lst in matches.items():
            if len(lst) == 2:
                if union(lst[0], lst[1]):
                    merges += 1
                matched_ep[lst[0]] += 1
                matched_ep[lst[1]] += 1
        n_chains_global = total_chains - merges
        # closed-by-stitching: border components whose every open endpoint
        # got matched
        comp_ep = defaultdict(int)
        comp_matched = defaultdict(int)
        for key, node in nodes.items():
            root = find(node)
            comp_ep[root] += node_ep[node]
            comp_matched[root] += matched_ep[node]
        closed_by_stitch = sum(1 for rt in comp_ep if comp_ep[rt] == comp_matched[rt])
        n_closed = local_closed + closed_by_stitch
        return pa.table(
            {
                "doc_id": pa.array([g.column("doc_id")[0].as_py()], pa.int64()),
                "level": pa.array([float(g.column("level")[0].as_py())], pa.float64()),
                "n_chains": pa.array([n_chains_global], pa.int64()),
                "n_closed": pa.array([n_closed], pa.int64()),
                "n_open": pa.array([n_chains_global - n_closed], pa.int64()),
                "n_segments": pa.array([n_segments], pa.int64()),
            }
        )

    summaries = docs_ds.map_batches(extract, batch_format="pyarrow")
    return summaries.groupby(["doc_id", "level"]).map_groups(stitch, batch_format="pyarrow")
