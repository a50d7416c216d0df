"""Per-image raster pipeline steps: proximity, sieve, fill-nodata,
nearblack (reference: alg/gdalproximity.cpp:94 GDALComputeProximity,
alg/gdalsievefilter.cpp:178 GDALSieveFilter, alg/rasterfill.cpp:394
GDALFillNodata, apps/nearblack_lib.cpp).

All run per image inside ``map_batches`` — no shuffle; grids are bounded
per row, so O(n log n)/O(n) per-image algorithms are the right scale
shape (the 100 TB axis is the number of images, not image size).

Proximity is the EXACT squared euclidean distance transform
(Felzenszwalb–Huttenlocher two-pass lower-envelope algorithm) — integer
d² in/out, so the DuckDB oracle (min over a targets join) matches
bit-for-bit.  GDAL's scanline approximation differs slightly; we keep the
exact transform and document the difference (GDAL's MAXDIST/units options
map to a post-filter here).
"""

from __future__ import annotations

import numpy as np

from gdal_ray.stages.polygonize import label_components

_INF = np.int64(1 << 60)


def _edt_1d_sq(f: np.ndarray) -> np.ndarray:
    """1-D squared EDT of sampled function f (int64, _INF = no site)."""
    n = len(f)
    d = np.empty(n, dtype=np.int64)
    v = np.empty(n, dtype=np.int64)   # site positions
    z = np.empty(n + 1, dtype=np.float64)
    k = 0
    v[0] = 0
    z[0], z[1] = -np.inf, np.inf
    for q in range(1, n):
        if f[q] >= _INF and f[v[k]] >= _INF:
            continue
        while True:
            p = v[k]
            denom = 2 * (q - p)
            s = ((f[q] + q * q) - (f[p] + p * p)) / denom
            if s <= z[k]:
                k -= 1
                if k < 0:
                    k = 0
                    v[0] = q
                    z[0], z[1] = -np.inf, np.inf
                    break
            else:
                k += 1
                v[k] = q
                z[k] = s
                z[k + 1] = np.inf
                break
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        p = v[k]
        val = f[p] + (q - p) * (q - p)
        d[q] = val if val < _INF else _INF
    return d


def proximity_sq(targets: np.ndarray) -> np.ndarray:
    """(h, w) bool target mask → int64 squared euclidean distance to the
    nearest target pixel (_INF where no targets exist)."""
    t = np.asarray(targets, dtype=bool)
    h, w = t.shape
    f = np.where(t, np.int64(0), _INF)
    # column pass then row pass (separable)
    for c in range(w):
        f[:, c] = _edt_1d_sq(f[:, c])
    out = np.empty_like(f)
    for r in range(h):
        out[r, :] = _edt_1d_sq(f[r, :])
    return out


def column_target_extents(targets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-column (first, last) target row index within a strip, -1 where
    the column holds no target.  This is the ENTIRE cross-strip state the
    distributed proximity transform needs: the vertical nearest-target
    distance for a row inside some other strip only ever reaches back to
    the closest target row of each intervening strip, i.e. these two
    numbers per column."""
    t = np.asarray(targets, dtype=bool)
    h = t.shape[0]
    any_col = t.any(axis=0)
    first = np.where(any_col, t.argmax(axis=0), -1).astype(np.int64)
    last = np.where(any_col, h - 1 - t[::-1].argmax(axis=0), -1).astype(np.int64)
    return first, last


def strip_vertical_dist(targets: np.ndarray, r0: int,
                        above: np.ndarray, below: np.ndarray) -> np.ndarray:
    """Exact per-pixel vertical distance (in rows) to the nearest target in
    the SAME column anywhere in the full raster, computed strip-locally.

    `targets` is the strip's (h, w) bool mask starting at global row r0;
    `above[c]` / `below[c]` are the nearest target GLOBAL rows outside the
    strip (above/below), -1 / huge where none.  Two vectorized scans (one
    down, one up) over the strip's rows; O(h·w), no Python per pixel."""
    t = np.asarray(targets, dtype=bool)
    h, w = t.shape
    big = _INF
    zero = np.int64(0)
    down = np.empty((h, w), dtype=np.int64)
    # distance at the virtual row r0-1 (from the cross-strip summary)
    prev = np.where(above >= 0, (np.int64(r0) - 1) - above, big)
    for r in range(h):
        prev = np.where(t[r], zero, np.minimum(prev, big - 1) + 1)
        down[r] = prev
    up = np.empty((h, w), dtype=np.int64)
    # distance at the virtual row r0+h (from the cross-strip summary)
    nxt = np.where(below >= 0, below - (np.int64(r0) + h), big)
    for r in range(h - 1, -1, -1):
        nxt = np.where(t[r], zero, np.minimum(nxt, big - 1) + 1)
        up[r] = nxt
    return np.minimum(down, up)


def strip_proximity_sq(targets: np.ndarray, r0: int,
                       above: np.ndarray, below: np.ndarray) -> np.ndarray:
    """Exact squared euclidean distance transform for one row strip of a
    larger raster: vertical pass from strip-local scans + the (above,
    below) cross-strip summaries, then the Felzenszwalb–Huttenlocher
    lower-envelope row pass (exact, row-independent — needs no context
    beyond the strip's own rows).  Bit-identical to `proximity_sq` of the
    whole raster restricted to the strip (pytest-gated)."""
    g = strip_vertical_dist(targets, r0, above, below)
    f = np.where(g >= _INF, _INF, g * g)
    out = np.empty_like(f)
    for r in range(f.shape[0]):
        out[r, :] = _edt_1d_sq(f[r, :])
    return out


def sieve(classes: np.ndarray, *, threshold: int, connect8: bool = False) -> np.ndarray:
    """Remove connected components smaller than `threshold` pixels by
    merging each into its largest-by-pixel-count neighboring component
    (GDALSieveFilter semantics), iterating smallest-first until stable."""
    cls = np.asarray(classes).copy()
    while True:
        labels = label_components(cls.astype(np.int32), connect8=connect8)
        nlab = int(labels.max())
        if nlab <= 1:
            return cls
        sizes = np.bincount(labels.ravel())[1:]  # size per label (1-based)
        small = np.argsort(sizes, kind="stable") + 1
        target_lab = small[0] if sizes[small[0] - 1] < threshold else None
        if target_lab is None:
            return cls
        # neighbors of the smallest small component
        sel = labels == target_lab
        nb = np.zeros_like(sel)
        nb[:-1, :] |= sel[1:, :]
        nb[1:, :] |= sel[:-1, :]
        nb[:, :-1] |= sel[:, 1:]
        nb[:, 1:] |= sel[:, :-1]
        if connect8:
            nb[:-1, :-1] |= sel[1:, 1:]
            nb[:-1, 1:] |= sel[1:, :-1]
            nb[1:, :-1] |= sel[:-1, 1:]
            nb[1:, 1:] |= sel[:-1, :-1]
        nb &= ~sel
        nb_labels = labels[nb]
        if nb_labels.size == 0:
            return cls  # isolated full-image component
        # largest-by-pixel-count neighboring component wins (GDALSieveFilter,
        # alg/gdalsievefilter.cpp); ties → smaller label (deterministic)
        cand = np.unique(nb_labels)
        merge_into = int(cand[np.argmax(sizes[cand - 1])])
        cls[sel] = cls[labels == merge_into].ravel()[0]


def fill_nodata(img: np.ndarray, nodata_mask: np.ndarray, *, max_iter: int = 1000) -> np.ndarray:
    """Fill nodata pixels by iterative 4-neighbor mean of valid pixels
    (the smoothing-iteration half of GDALFillNodata; deterministic,
    converges inward one ring per iteration)."""
    out = np.asarray(img, dtype=np.float64).copy()
    invalid = np.asarray(nodata_mask, dtype=bool).copy()
    for _ in range(max_iter):
        if not invalid.any():
            break
        valid = ~invalid
        vsum = np.zeros_like(out)
        vcnt = np.zeros(out.shape, dtype=np.int64)
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted_v = np.zeros_like(valid)
            shifted_x = np.zeros_like(out)
            src_r = slice(max(dr, 0), out.shape[0] + min(dr, 0))
            dst_r = slice(max(-dr, 0), out.shape[0] + min(-dr, 0))
            src_c = slice(max(dc, 0), out.shape[1] + min(dc, 0))
            dst_c = slice(max(-dc, 0), out.shape[1] + min(-dc, 0))
            shifted_v[dst_r, dst_c] = valid[src_r, src_c]
            shifted_x[dst_r, dst_c] = out[src_r, src_c]
            vsum += np.where(shifted_v, shifted_x, 0.0)
            vcnt += shifted_v
        ring = invalid & (vcnt > 0)
        if not ring.any():
            break
        out[ring] = vsum[ring] / vcnt[ring]
        invalid &= ~ring
    return out


def nearblack(img: np.ndarray, *, threshold: int = 15, value: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Collar clean: flood from the image border through near-black pixels
    (all bands < threshold), set them to `value`; returns (img, collar_mask)
    (apps/nearblack_lib.cpp semantics, 4-connected flood)."""
    a = np.asarray(img)
    dark = (a < threshold).all(axis=2) if a.ndim == 3 else a < threshold
    h, w = dark.shape
    collar = np.zeros((h, w), dtype=bool)
    # seed border
    frontier = np.zeros_like(collar)
    frontier[0, :] = dark[0, :]
    frontier[-1, :] = dark[-1, :]
    frontier[:, 0] |= dark[:, 0]
    frontier[:, -1] |= dark[:, -1]
    while frontier.any():
        collar |= frontier
        grow = np.zeros_like(collar)
        grow[1:, :] |= collar[:-1, :]
        grow[:-1, :] |= collar[1:, :]
        grow[:, 1:] |= collar[:, :-1]
        grow[:, :-1] |= collar[:, 1:]
        frontier = grow & dark & ~collar
    out = a.copy()
    out[collar] = value
    return out, collar


# ---------------------------------------------------------------------------
# distributed (strip-parallel) sieve / nearblack
#
# Both are connected-component problems, so the distributed shape mirrors
# the polygonize stitch (stages/polygonize.py): each Ray task labels ONE
# row strip and ships an O(width + n_components) summary — boundary label
# rows, per-component size/class/first-pixel, different-class adjacency
# pairs.  The driver unions boundary-adjacent same-class labels into
# global components and runs the reference's merge rule on the COMPONENT
# GRAPH (tiny vs. pixels); a second strip pass rewrites pixels from the
# per-strip label→class map.  Pixels never shuffle; the exchange is
# O(width · n_strips + components).


def _adjacency_pairs(labels: np.ndarray, *, connect8: bool = False) -> np.ndarray:
    """Unique (la, lb) pairs (la < lb, both nonzero) of pixel-adjacent
    distinct labels inside one grid."""
    pairs = []

    def emit(a: np.ndarray, b: np.ndarray) -> None:
        m = (a != b) & (a > 0) & (b > 0)
        if m.any():
            pairs.append(np.stack([a[m], b[m]], axis=1))

    emit(labels[:, :-1].ravel(), labels[:, 1:].ravel())
    emit(labels[:-1, :].ravel(), labels[1:, :].ravel())
    if connect8:
        emit(labels[:-1, :-1].ravel(), labels[1:, 1:].ravel())
        emit(labels[:-1, 1:].ravel(), labels[1:, :-1].ravel())
    if not pairs:
        return np.empty((0, 2), dtype=np.int64)
    p = np.concatenate(pairs).astype(np.int64)
    return np.unique(np.sort(p, axis=1), axis=0)


def sieve_strip_summary(cls: np.ndarray, y0: int, *, connect8: bool = False) -> dict:
    """Label one strip and summarize it for the distributed sieve.

    Returns per-strip arrays indexed by local label 1..N:
    sizes / classes / firstpos (global row-major position of the
    component's first pixel — the reference's deterministic label
    order), intra-strip different-class adjacency pairs, and the
    top/bottom boundary label+class rows for cross-strip stitching.
    """
    cls = np.asarray(cls)
    h, w = cls.shape
    labels = label_components(cls.astype(np.int32), connect8=connect8)
    flat = labels.ravel()
    u, first = np.unique(flat, return_index=True)  # u is dense 1..N (no mask)
    sizes = np.bincount(flat)[1:]
    classes = cls.ravel()[first]
    firstpos = ((first // w) + y0).astype(np.int64) * np.int64(w) + (first % w)
    return {
        "y0": int(y0),
        "n": int(labels.max()),
        "sizes": sizes.astype(np.int64),
        "classes": classes.astype(np.int64),
        "firstpos": firstpos,
        "adj": _adjacency_pairs(labels, connect8=connect8),
        "top_lab": labels[0].copy(),
        "bot_lab": labels[-1].copy(),
        "top_cls": cls[0].astype(np.int64),
        "bot_cls": cls[-1].astype(np.int64),
    }


def _boundary_pairs(bot_lab, bot_cls, top_lab, top_cls, *, connect8):
    """(lo_label, hi_label, same_class) triples across one strip seam."""
    outs = []

    def emit(a_lab, a_cls, b_lab, b_cls):
        same = a_cls == b_cls
        outs.append(np.stack([a_lab, b_lab, same.astype(np.int64)], axis=1))

    emit(bot_lab, bot_cls, top_lab, top_cls)
    if connect8:
        emit(bot_lab[:-1], bot_cls[:-1], top_lab[1:], top_cls[1:])
        emit(bot_lab[1:], bot_cls[1:], top_lab[:-1], top_cls[:-1])
    return np.concatenate(outs)


class _UF:
    __slots__ = ("p",)

    def __init__(self, n: int):
        self.p = np.arange(n, dtype=np.int64)

    def find(self, a: int) -> int:
        p = self.p
        while p[a] != a:
            p[a] = p[p[a]]
            a = p[a]
        return int(a)

    def union(self, a: int, b: int) -> int:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.p[rb] = ra
        return ra


def sieve_merge(summaries: list[dict], *, threshold: int,
                connect8: bool = False) -> list[np.ndarray]:
    """Driver half of the distributed sieve: stitch strip summaries into
    global components, run GDALSieveFilter's smallest-first merge rule on
    the component graph (identical tie-breaks to :func:`sieve` — size
    asc, then first-pixel raster order; merge target = largest neighbor,
    ties → earliest first pixel), and return, per strip, the final class
    per local label (index 0 unused).

    Exactness contract: distributed output == single-pass
    :func:`sieve(full_grid)` — pinned by tests/test_cli_sieve.py.
    """
    summaries = sorted(summaries, key=lambda s: s["y0"])
    offs = np.cumsum([0] + [s["n"] for s in summaries])
    total = int(offs[-1])
    uf = _UF(total + 1)  # node ids 1..total (0 unused)

    size = np.zeros(total + 1, dtype=np.int64)
    kls = np.zeros(total + 1, dtype=np.int64)
    fpos = np.full(total + 1, np.int64(1) << 62, dtype=np.int64)
    adj_edges = []
    for i, s in enumerate(summaries):
        o = offs[i]
        size[o + 1:o + 1 + s["n"]] = s["sizes"]
        kls[o + 1:o + 1 + s["n"]] = s["classes"]
        fpos[o + 1:o + 1 + s["n"]] = s["firstpos"]
        if len(s["adj"]):
            adj_edges.append(s["adj"] + o)
    # cross-strip seams: same class → union; different → adjacency edge
    for i in range(len(summaries) - 1):
        a, b = summaries[i], summaries[i + 1]
        tri = _boundary_pairs(a["bot_lab"] + offs[i], a["bot_cls"],
                              b["top_lab"] + offs[i + 1], b["top_cls"],
                              connect8=connect8)
        same = tri[tri[:, 2] == 1]
        diff = tri[tri[:, 2] == 0]
        for la, lb in np.unique(same[:, :2], axis=0):
            uf.union(int(la), int(lb))
        if len(diff):
            adj_edges.append(diff[:, :2])

    # collapse per-node stats onto roots
    roots = np.fromiter((uf.find(i) for i in range(1, total + 1)),
                        dtype=np.int64, count=total)
    comp_size: dict[int, int] = {}
    comp_fpos: dict[int, int] = {}
    comp_cls: dict[int, int] = {}
    for node in range(1, total + 1):
        r = int(roots[node - 1])
        comp_size[r] = comp_size.get(r, 0) + int(size[node])
        comp_fpos[r] = min(comp_fpos.get(r, 1 << 62), int(fpos[node]))
        comp_cls[r] = int(kls[node])
    nbrs: dict[int, set[int]] = {r: set() for r in comp_size}
    if adj_edges:
        e = np.concatenate(adj_edges)
        for a, b in np.unique(e, axis=0):
            ra, rb = uf.find(int(a)), uf.find(int(b))
            if ra != rb:
                nbrs[ra].add(rb)
                nbrs[rb].add(ra)

    # the reference's merge loop, on the component graph
    while len(comp_size) > 1:
        # smallest component; ties by first-pixel raster order (== the
        # from-scratch relabel order the single-pass kernel uses)
        target = min(comp_size, key=lambda r: (comp_size[r], comp_fpos[r]))
        if comp_size[target] >= threshold:
            break
        live_nb = {uf.find(x) for x in nbrs[target]} - {target}
        if not live_nb:
            break  # isolated component: single-pass kernel returns here too
        merge_into = min(live_nb,
                         key=lambda r: (-comp_size[r], comp_fpos[r]))
        new_cls = comp_cls[merge_into]
        # target's pixels take new_cls; any neighbor of target with that
        # class is now connected through target → same component
        absorb = [merge_into] + [r for r in live_nb
                                 if r != merge_into and comp_cls[r] == new_cls]
        grp = [target] + absorb
        root = grp[0]
        for g in grp[1:]:
            root = uf.union(root, g)
        merged_nb = set()
        sz = 0
        fp = 1 << 62
        for g in grp:
            sz += comp_size.pop(g)
            fp = min(fp, comp_fpos.pop(g))
            comp_cls.pop(g)
            merged_nb |= nbrs.pop(g)
        comp_size[root] = sz
        comp_fpos[root] = fp
        comp_cls[root] = new_cls
        nbrs[root] = {uf.find(x) for x in merged_nb} - {root}
        for n in list(nbrs[root]):
            nbrs[n] = {uf.find(x) for x in nbrs[n]} - {n}

    # final class per (strip, local label)
    out = []
    for i, s in enumerate(summaries):
        o = offs[i]
        m = np.zeros(s["n"] + 1, dtype=np.int64)
        for ll in range(1, s["n"] + 1):
            m[ll] = comp_cls[uf.find(o + ll)]
        out.append(m)
    return out


def distributed_sieve(strips: list[tuple[int, np.ndarray]], *, threshold: int,
                      connect8: bool = False) -> list[np.ndarray]:
    """Pure-array reference for the two-pass distributed sieve (used by
    the CLI door and the equality pytest): strips is [(y0, grid)]."""
    summaries = [sieve_strip_summary(g, y0, connect8=connect8)
                 for y0, g in strips]
    maps = sieve_merge(summaries, threshold=threshold, connect8=connect8)
    outs = []
    for (y0, g), m in zip(sorted(strips, key=lambda t: t[0]), maps):
        labels = label_components(np.asarray(g).astype(np.int32),
                                  connect8=connect8)
        outs.append(m[labels].astype(np.asarray(g).dtype))
    return outs


def nearblack_strip_summary(dark: np.ndarray, y0: int, H: int) -> dict:
    """Label one strip's near-black mask and summarize for the
    distributed collar flood: local labels, seed labels (dark pixels on
    the IMAGE border — left/right columns of every strip, top row of the
    first, bottom row of the last), and the seam label rows."""
    dark = np.asarray(dark, dtype=bool)
    h, w = dark.shape
    labels = label_components(dark.astype(np.int32), mask=dark)
    seeds = set()
    seeds.update(labels[:, 0][labels[:, 0] > 0].tolist())
    seeds.update(labels[:, -1][labels[:, -1] > 0].tolist())
    if y0 == 0:
        seeds.update(labels[0][labels[0] > 0].tolist())
    if y0 + h == H:
        seeds.update(labels[-1][labels[-1] > 0].tolist())
    return {"y0": int(y0), "n": int(labels.max()),
            "seeds": sorted(seeds),
            "top_lab": labels[0].copy(), "bot_lab": labels[-1].copy()}


def nearblack_merge(summaries: list[dict]) -> list[np.ndarray]:
    """Driver half of the distributed nearblack: union seam-adjacent dark
    labels (4-connected, matching :func:`nearblack`'s flood), then mark
    every component containing a border seed.  Returns, per strip, a bool
    array over local labels (index 0 unused): True = collar."""
    summaries = sorted(summaries, key=lambda s: s["y0"])
    offs = np.cumsum([0] + [s["n"] for s in summaries])
    total = int(offs[-1])
    uf = _UF(total + 1)
    for i in range(len(summaries) - 1):
        a_lab = summaries[i]["bot_lab"] + np.where(
            summaries[i]["bot_lab"] > 0, offs[i], 0)
        b_lab = summaries[i + 1]["top_lab"] + np.where(
            summaries[i + 1]["top_lab"] > 0, offs[i + 1], 0)
        m = (a_lab > 0) & (b_lab > 0)
        for la, lb in np.unique(
                np.stack([a_lab[m], b_lab[m]], axis=1), axis=0):
            uf.union(int(la), int(lb))
    collar_roots = set()
    for i, s in enumerate(summaries):
        for ll in s["seeds"]:
            collar_roots.add(uf.find(int(offs[i]) + ll))
    out = []
    for i, s in enumerate(summaries):
        flag = np.zeros(s["n"] + 1, dtype=bool)
        for ll in range(1, s["n"] + 1):
            flag[ll] = uf.find(int(offs[i]) + ll) in collar_roots
        out.append(flag)
    return out
