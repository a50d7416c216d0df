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
