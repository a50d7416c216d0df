"""Polygonize (raster → vector): connected-component labelling + ring
extraction, per image/tile.

Semantics per the reference (alg/polygonize.cpp:500 ``GDALPolygonize``):
two-pass connected components over equal pixel values
(alg/gdalrasterpolygonenumerator.cpp:209 ProcessLine + CompleteMerges
equivalence merging), 4- or 8-connected, then ring assembly
(alg/polygonize_polygonizer.cpp) emitting one polygon per component with
the pixel value as attribute.  Optionally a mask (nodata) excludes pixels.

Implementation: two-pass union-find CCL (row-sequential, numpy-vectorized
within rows) + boundary edge walking for exterior/hole rings.  Polygon
coordinates are in pixel space (col, row) with the GDAL corner convention:
ring vertices lie on pixel corners, exterior rings wound clockwise in
array coordinates (y down) like GDALPolygonize output.

Distributed plan: per-image `map_batches`; cross-tile stitching (label
equivalence across tile borders) is the documented hard part (SURVEY.md
§7) and is future work — the operator's unit here is one image/tile.
"""

from __future__ import annotations

import numpy as np


def label_components(img: np.ndarray, *, connect8: bool = False, mask: np.ndarray | None = None) -> np.ndarray:
    """Two-pass union-find CCL of equal-valued pixels.

    Returns int32 labels (0 = masked), labels numbered 1..N in first-pixel
    (row-major) order — the same deterministic ordering the reference's
    sequential enumerator produces.
    """
    h, w = img.shape
    if mask is None:
        mask = np.ones((h, w), dtype=bool)
    labels = np.zeros((h, w), dtype=np.int64)
    parent = [0]  # parent[i] — union-find over provisional labels

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    nxt = 1
    for r in range(h):
        row = img[r]
        m = mask[r]
        left_same = np.zeros(w, dtype=bool)
        left_same[1:] = m[1:] & m[:-1] & (row[1:] == row[:-1])
        if r > 0:
            up_same = m & mask[r - 1] & (row == img[r - 1])
        else:
            up_same = np.zeros(w, dtype=bool)
        if connect8 and r > 0:
            ul_same = np.zeros(w, dtype=bool)
            ul_same[1:] = m[1:] & mask[r - 1][:-1] & (row[1:] == img[r - 1][:-1])
            ur_same = np.zeros(w, dtype=bool)
            ur_same[:-1] = m[:-1] & mask[r - 1][1:] & (row[:-1] == img[r - 1][1:])
        for c in range(w):
            if not m[c]:
                continue
            cands = []
            if left_same[c]:
                cands.append(labels[r, c - 1])
            if up_same[c]:
                cands.append(labels[r - 1, c])
            if connect8 and r > 0:
                if ul_same[c]:
                    cands.append(labels[r - 1, c - 1])
                if ur_same[c]:
                    cands.append(labels[r - 1, c + 1])
            if not cands:
                parent.append(nxt)
                labels[r, c] = nxt
                nxt += 1
            else:
                roots = [find(int(x)) for x in cands]
                root = min(roots)
                labels[r, c] = root
                for other in roots:
                    parent[other] = root
    # flatten + renumber in row-major first-appearance order
    flat = labels.ravel()
    for i in range(len(flat)):
        if flat[i]:
            flat[i] = find(int(flat[i]))
    out = np.zeros_like(labels, dtype=np.int64)
    remap: dict[int, int] = {}
    n = 0
    for i, v in enumerate(flat):
        if v:
            if v not in remap:
                n += 1
                remap[v] = n
            out.ravel()[i] = remap[v]
    return out


def component_rings(labels: np.ndarray, label: int) -> list[list[tuple[int, int]]]:
    """Extract boundary rings (exterior first) of one labeled component.

    Vertices are pixel-corner lattice points (x=col, y=row).  Uses
    boundary-edge walking: collect all unit edges between the component
    and the outside, then chain them into closed rings; rings are oriented
    by the walk (exterior CW in y-down coordinates, holes CCW), matching
    polygonize_polygonizer.cpp's ring emission.
    """
    comp = labels == label
    h, w = comp.shape
    # directed boundary edges, keeping component on the left of travel dir
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add_edge(a, b):
        edges.setdefault(a, []).append(b)

    up = np.zeros((h, w), dtype=bool)
    up[0] = comp[0]
    up[1:] = comp[1:] & ~comp[:-1]
    down = np.zeros((h, w), dtype=bool)
    down[-1] = comp[-1]
    down[:-1] = comp[:-1] & ~comp[1:]
    left = np.zeros((h, w), dtype=bool)
    left[:, 0] = comp[:, 0]
    left[:, 1:] = comp[:, 1:] & ~comp[:, :-1]
    right = np.zeros((h, w), dtype=bool)
    right[:, -1] = comp[:, -1]
    right[:, :-1] = comp[:, :-1] & ~comp[:, 1:]

    for r, c in zip(*np.nonzero(up)):
        add_edge((c, r), (c + 1, r))          # top edge, travel +x
    for r, c in zip(*np.nonzero(down)):
        add_edge((c + 1, r + 1), (c, r + 1))  # bottom edge, travel -x
    for r, c in zip(*np.nonzero(left)):
        add_edge((c, r + 1), (c, r))          # left edge, travel -y
    for r, c in zip(*np.nonzero(right)):
        add_edge((c + 1, r), (c + 1, r + 1))  # right edge, travel +y

    return walk_rings(edges)


def walk_rings(edges: dict[tuple[int, int], list[tuple[int, int]]]):
    """Chain a directed boundary-edge multimap into closed simple rings
    (consumes `edges`).  Deterministic: each ring starts at its
    lexicographically smallest open vertex; at corner touches the
    rightmost turn is preferred (keeps rings simple, as
    polygonize_polygonizer.cpp's emitter does)."""
    rings = []
    while edges:
        start = min(edges)  # deterministic: lexicographically smallest vertex
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            outs = edges[cur]
            if len(outs) == 1:
                nxt = outs.pop()
            else:
                # prefer the rightmost turn to keep rings simple at
                # checkerboard corner touches
                def turn_key(cand):
                    d = (cand[0] - cur[0], cand[1] - cur[1])
                    if prev_dir is None:
                        return 0
                    cross = prev_dir[0] * d[1] - prev_dir[1] * d[0]
                    dot = prev_dir[0] * d[0] + prev_dir[1] * d[1]
                    return -np.arctan2(cross, dot)
                outs.sort(key=turn_key)
                nxt = outs.pop(0)
            if not edges[cur]:
                del edges[cur]
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            if nxt == start:
                ring.append(start)
                break
            ring.append(nxt)
            cur = nxt
        rings.append(_simplify_collinear(ring))
    # exterior ring = the one containing the component's min corner
    rings.sort(key=lambda rg: (min(p[1] for p in rg), min(p[0] for p in rg)))
    return rings


def _simplify_collinear(ring: list[tuple[int, int]]) -> list[tuple[int, int]]:
    out = []
    n = len(ring) - 1  # last == first
    for i in range(n):
        prev = ring[(i - 1) % n]
        cur = ring[i]
        nxt = ring[(i + 1) % n]
        if (cur[0] - prev[0]) * (nxt[1] - cur[1]) != (cur[1] - prev[1]) * (nxt[0] - cur[0]):
            out.append(cur)
    out.append(out[0])
    return out


def polygonize(img: np.ndarray, *, connect8: bool = False, mask: np.ndarray | None = None):
    """-> list of dicts {label, value, pixel_count, rings} in deterministic
    (first-pixel row-major) label order."""
    labels = label_components(img, connect8=connect8, mask=mask)
    out = []
    nlab = labels.max()
    for lab in range(1, int(nlab) + 1):
        sel = labels == lab
        rr, cc = np.nonzero(sel)
        out.append(
            {
                "label": int(lab),
                "value": img[rr[0], cc[0]].item(),
                "pixel_count": int(sel.sum()),
                "rings": component_rings(labels, lab),
            }
        )
    return out


def rings_to_wkt(rings: list[list[tuple[int, int]]]) -> str:
    parts = []
    for ring in rings:
        coords = ",".join(f"{x} {y}" for x, y in ring)
        parts.append(f"({coords})")
    return "POLYGON (" + ",".join(parts) + ")"


# ---------------------------------------------------------------------------
# distributed CCL: per-tile labeling + cross-tile boundary stitching
# (SURVEY.md §7 "hard part 2" — the label-equivalence merge GDALPolygonize
# never needs because it is single-process; reference semantics
# alg/gdalrasterpolygonenumerator.cpp CompleteMerges:167 generalized to a
# tile-partitioned grid)

import pandas as pd
import pyarrow as pa


def split_tiles_batch(batch: pa.Table, *, grid_fn, tile: int) -> pa.Table:
    """doc rows → one row per (doc, ty, tx) tile of the doc's grid.
    grid_fn(ids) -> (B, n, n) int array; n must be divisible by `tile`."""
    ids = batch.column("doc_id").to_numpy()
    grids = grid_fn(ids)
    n = grids.shape[1]
    nt = n // tile
    out_doc, out_ty, out_tx, out_bytes = [], [], [], []
    for i, d in enumerate(ids):
        for ty in range(nt):
            for tx in range(nt):
                t = grids[i, ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
                out_doc.append(int(d))
                out_ty.append(ty)
                out_tx.append(tx)
                out_bytes.append(np.ascontiguousarray(t, dtype=np.int32).tobytes())
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "ty": pa.array(out_ty, pa.int64()),
            "tx": pa.array(out_tx, pa.int64()),
            "tile": pa.array(out_bytes, pa.binary()),
            "ts": pa.array([tile] * len(out_doc), pa.int64()),
            "nt": pa.array([nt] * len(out_doc), pa.int64()),
        }
    )


def tile_label_summary_batch(batch: pa.Table) -> pa.Table:
    """Per tile: local CCL (the heavy, perfectly-parallel step) → compact
    summary rows carrying ONLY label counts/sizes and the four border
    (value, label) sequences — pixels never shuffle."""
    out = {k: [] for k in ("doc_id", "ty", "tx", "nt", "n_labels", "sizes",
                            "top_v", "top_l", "bot_v", "bot_l",
                            "left_v", "left_l", "right_v", "right_l")}
    for row in range(len(batch)):
        ts = batch.column("ts")[row].as_py()
        t = np.frombuffer(batch.column("tile")[row].as_py(), dtype=np.int32).reshape(ts, ts)
        labels = label_components(t)
        n_labels = int(labels.max())
        sizes = np.bincount(labels.ravel(), minlength=n_labels + 1)[1:]
        out["doc_id"].append(batch.column("doc_id")[row].as_py())
        out["ty"].append(batch.column("ty")[row].as_py())
        out["tx"].append(batch.column("tx")[row].as_py())
        out["nt"].append(batch.column("nt")[row].as_py())
        out["n_labels"].append(n_labels)
        out["sizes"].append(sizes.astype(np.int64).tolist())
        out["top_v"].append(t[0, :].astype(np.int64).tolist())
        out["top_l"].append(labels[0, :].astype(np.int64).tolist())
        out["bot_v"].append(t[-1, :].astype(np.int64).tolist())
        out["bot_l"].append(labels[-1, :].astype(np.int64).tolist())
        out["left_v"].append(t[:, 0].astype(np.int64).tolist())
        out["left_l"].append(labels[:, 0].astype(np.int64).tolist())
        out["right_v"].append(t[:, -1].astype(np.int64).tolist())
        out["right_l"].append(labels[:, -1].astype(np.int64).tolist())
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "ty": pa.array(out["ty"], pa.int64()),
            "tx": pa.array(out["tx"], pa.int64()),
            "nt": pa.array(out["nt"], pa.int64()),
            "n_labels": pa.array(out["n_labels"], pa.int64()),
            "sizes": pa.array(out["sizes"], pa.list_(pa.int64())),
            **{k: pa.array(out[k], pa.list_(pa.int64()))
               for k in ("top_v", "top_l", "bot_v", "bot_l",
                          "left_v", "left_l", "right_v", "right_l")},
        }
    )


def stitch_doc_components(g: pa.Table) -> pa.Table:
    """Per-doc reduce: union-find over border equivalences of the tile
    summaries → exact global component count + size distribution (equals
    the single-pass CCL bit-for-bit; pytest-verified)."""
    rows = sorted(g.to_pylist(), key=lambda r: (r["ty"], r["tx"]))
    offsets = {}
    total = 0
    sizes_all = []
    for r in rows:
        offsets[(int(r["ty"]), int(r["tx"]))] = total
        total += int(r["n_labels"])
        sizes_all.extend(r["sizes"])
    parent = list(range(total))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_pos = {(int(r["ty"]), int(r["tx"])): r for r in rows}
    for (ty, tx), r in by_pos.items():
        low = by_pos.get((ty + 1, tx))
        if low is not None:
            bv, bl = np.array(r["bot_v"]), np.array(r["bot_l"])
            tv, tl = np.array(low["top_v"]), np.array(low["top_l"])
            same = bv == tv
            for k in np.flatnonzero(same):
                union(offsets[(ty, tx)] + int(bl[k]) - 1,
                      offsets[(ty + 1, tx)] + int(tl[k]) - 1)
        rgt = by_pos.get((ty, tx + 1))
        if rgt is not None:
            rv, rl = np.array(r["right_v"]), np.array(r["right_l"])
            lv, ll = np.array(rgt["left_v"]), np.array(rgt["left_l"])
            same = rv == lv
            for k in np.flatnonzero(same):
                union(offsets[(ty, tx)] + int(rl[k]) - 1,
                      offsets[(ty, tx + 1)] + int(ll[k]) - 1)

    root_sizes: dict[int, int] = {}
    for i in range(total):
        root = find(i)
        root_sizes[root] = root_sizes.get(root, 0) + int(sizes_all[i])
    return pa.table(
        {
            "doc_id": pa.array([rows[0]["doc_id"]], pa.int64()),
            "n_components": pa.array([len(root_sizes)], pa.int64()),
            "max_component": pa.array([max(root_sizes.values())], pa.int64()),
            "n_pixels": pa.array([sum(root_sizes.values())], pa.int64()),
        }
    )


def tile_label_geometry_batch(batch: pa.Table) -> pa.Table:
    """Per tile: local CCL + per-label boundary EDGES in global pixel
    coordinates — interior edges (value changes inside the tile) plus the
    doc-grid outer boundary; seam edges are derivable in the reduce from
    the border value sequences, so nothing here needs halo pixels.

    Extends tile_label_summary_batch with (edge_l, edge_ax, edge_ay,
    edge_bx, edge_by, label_vals) columns — the payload is boundary-sized,
    never pixel-sized."""
    base = tile_label_summary_batch(batch)
    e_l, e_ax, e_ay, e_bx, e_by, lab_vals = [], [], [], [], [], []
    for row in range(len(batch)):
        ts = batch.column("ts")[row].as_py()
        nt = batch.column("nt")[row].as_py()
        ty = batch.column("ty")[row].as_py()
        tx = batch.column("tx")[row].as_py()
        t = np.frombuffer(batch.column("tile")[row].as_py(), dtype=np.int32).reshape(ts, ts)
        labels = label_components(t)
        n_labels = int(labels.max())
        vals = np.zeros(n_labels + 1, dtype=np.int64)
        vals[labels.ravel()] = t.ravel()
        lab_vals.append(vals[1:].tolist())
        offx, offy = tx * ts, ty * ts
        is_top, is_bot = ty == 0, ty == nt - 1
        is_left, is_right = tx == 0, tx == nt - 1

        up = np.zeros((ts, ts), dtype=bool)
        if is_top:
            up[0] = True
        up[1:] = t[1:] != t[:-1]
        down = np.zeros((ts, ts), dtype=bool)
        if is_bot:
            down[-1] = True
        down[:-1] = t[:-1] != t[1:]
        left = np.zeros((ts, ts), dtype=bool)
        if is_left:
            left[:, 0] = True
        left[:, 1:] = t[:, 1:] != t[:, :-1]
        right = np.zeros((ts, ts), dtype=bool)
        if is_right:
            right[:, -1] = True
        right[:, :-1] = t[:, :-1] != t[:, 1:]

        ls, axs, ays, bxs, bys = [], [], [], [], []
        for mask, mk in (
            (up, lambda r, c: (c, r, c + 1, r)),
            (down, lambda r, c: (c + 1, r + 1, c, r + 1)),
            (left, lambda r, c: (c, r + 1, c, r)),
            (right, lambda r, c: (c + 1, r, c + 1, r + 1)),
        ):
            rr, cc = np.nonzero(mask)
            for r, c in zip(rr, cc):
                ax, ay, bx, by = mk(int(r), int(c))
                ls.append(int(labels[r, c]))
                axs.append(ax + offx); ays.append(ay + offy)
                bxs.append(bx + offx); bys.append(by + offy)
        e_l.append(ls); e_ax.append(axs); e_ay.append(ays)
        e_bx.append(bxs); e_by.append(bys)
    for name, data in (
        ("edge_l", e_l), ("edge_ax", e_ax), ("edge_ay", e_ay),
        ("edge_bx", e_bx), ("edge_by", e_by), ("label_vals", lab_vals),
    ):
        base = base.append_column(name, pa.array(data, pa.list_(pa.int64())))
    return base


def stitch_doc_geometry(g: pa.Table) -> pa.Table:
    """Per-doc reduce: union-find label equivalence + seam-edge synthesis
    from the border value sequences + ring walk per global component →
    actual polygon WKT (cross-tile), bit-identical to the single-pass
    polygonize (pytest-gated).  The reference emits rings in
    alg/polygonize_polygonizer.cpp; the distributed generalization here is
    the §7 boundary-stitch."""
    order = np.lexsort((g.column("tx").to_numpy(zero_copy_only=False),
                        g.column("ty").to_numpy(zero_copy_only=False)))
    g = g.take(pa.array(order))
    rows = g.to_pylist()
    offsets = {}
    total = 0
    sizes_all: list[int] = []
    vals_all: list[int] = []
    for r in rows:
        offsets[(r["ty"], r["tx"])] = total
        total += r["n_labels"]
        sizes_all.extend(r["sizes"])
        vals_all.extend(r["label_vals"])
    parent = list(range(total))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_pos = {(r["ty"], r["tx"]): r for r in rows}
    ts = len(rows[0]["top_v"])
    edges_by_gl: dict[int, dict] = {}

    def add_edge(gl, a, b):
        edges_by_gl.setdefault(gl, {}).setdefault(a, []).append(b)

    for (ty, tx), r in by_pos.items():
        off = offsets[(ty, tx)]
        # interior + outer-boundary edges from the tile stage
        for l, ax, ay, bx, by in zip(r["edge_l"], r["edge_ax"], r["edge_ay"],
                                     r["edge_bx"], r["edge_by"]):
            add_edge(off + l - 1, (ax, ay), (bx, by))
        low = by_pos.get((ty + 1, tx))
        if low is not None:
            bv, bl = r["bot_v"], r["bot_l"]
            tv, tl = low["top_v"], low["top_l"]
            y = (ty + 1) * ts
            gx = tx * ts
            for k in range(ts):
                if bv[k] == tv[k]:
                    union(off + bl[k] - 1, offsets[(ty + 1, tx)] + tl[k] - 1)
                else:
                    add_edge(off + bl[k] - 1, (gx + k + 1, y), (gx + k, y))
                    add_edge(offsets[(ty + 1, tx)] + tl[k] - 1, (gx + k, y), (gx + k + 1, y))
        rgt = by_pos.get((ty, tx + 1))
        if rgt is not None:
            rv, rl = r["right_v"], r["right_l"]
            lv, ll = rgt["left_v"], rgt["left_l"]
            x = (tx + 1) * ts
            gy = ty * ts
            for k in range(ts):
                if rv[k] == lv[k]:
                    union(off + rl[k] - 1, offsets[(ty, tx + 1)] + ll[k] - 1)
                else:
                    add_edge(off + rl[k] - 1, (x, gy + k), (x, gy + k + 1))
                    add_edge(offsets[(ty, tx + 1)] + ll[k] - 1, (x, gy + k + 1), (x, gy + k))

    merged_edges: dict[int, dict] = {}
    root_sizes: dict[int, int] = {}
    for i in range(total):
        root = find(i)
        root_sizes[root] = root_sizes.get(root, 0) + sizes_all[i]
        if i in edges_by_gl:
            dst = merged_edges.setdefault(root, {})
            for a, bs in edges_by_gl[i].items():
                dst.setdefault(a, []).extend(bs)

    comps = []
    for root, edges in merged_edges.items():
        rings = walk_rings(edges)
        key = min((p[1], p[0]) for p in rings[0])
        comps.append((key, root, rings))
    comps.sort(key=lambda c: c[0])

    doc_id = rows[0]["doc_id"]
    return pa.table(
        {
            "doc_id": pa.array([doc_id] * len(comps), pa.int64()),
            "comp": pa.array(np.arange(len(comps), dtype=np.int64)),
            "value": pa.array([vals_all[root] for _, root, _ in comps], pa.int64()),
            "n_pixels": pa.array([root_sizes[root] for _, root, _ in comps], pa.int64()),
            "wkt": pa.array([rings_to_wkt(rings) for _, _, rings in comps], pa.string()),
        }
    )


def distributed_polygons(docs_ds, *, grid_fn, tile: int):
    """docs → tile split → per-tile CCL + boundary edges → per-doc stitch
    emitting actual cross-tile polygon WKT (value, n_pixels, wkt)."""
    tiles = docs_ds.map_batches(
        lambda b: split_tiles_batch(b, grid_fn=grid_fn, tile=tile),
        batch_format="pyarrow",
    )
    geo = tiles.map_batches(tile_label_geometry_batch, batch_format="pyarrow")
    return geo.groupby("doc_id").map_groups(stitch_doc_geometry, batch_format="pyarrow")


def distributed_components(docs_ds, *, grid_fn, tile: int):
    """docs → tile split (flat_map) → per-tile CCL (map_batches) →
    groupby(doc).stitch — global component stats, exactly equal to a
    single-pass CCL of the whole grid."""
    tiles = docs_ds.map_batches(
        lambda b: split_tiles_batch(b, grid_fn=grid_fn, tile=tile),
        batch_format="pyarrow",
    )
    summaries = tiles.map_batches(tile_label_summary_batch, batch_format="pyarrow")
    return summaries.groupby("doc_id").map_groups(stitch_doc_components, batch_format="pyarrow")
