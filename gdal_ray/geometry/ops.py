"""Per-feature geometry constructions & measures (pure numpy) — the
`gdal vector geom` step family (reference: GEOS-backed OGRGeometry ops,
ogr/ogrgeometry.cpp — Buffer :4526, Simplify, ConvexHull :4186, Centroid,
Area/Length; segmentize/swap-xy of apps/gdalalg_vector_pipeline.cpp).

Integer-unit contract: coordinates in this repo's synthetic fixtures are
decimal-rounded (multiples of 0.01°), so measures that must cross-check
against a SQL oracle are computed in integer hundredths
(``u = round(x*100)``) — shoelace cross products then stay in int64 and
are EXACT regardless of summation order on both engines.
"""

from __future__ import annotations

import numpy as np

UNIT = 100.0  # hundredths of a degree


def to_units(xy: np.ndarray) -> np.ndarray:
    """(n,2) float coords → int64 hundredth-degree units (exact for the
    decimal-rounded fixture coords; same as SQL round(x*100)::bigint)."""
    return np.round(np.asarray(xy, dtype=np.float64) * UNIT).astype(np.int64)


def _closed(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r)
    if len(r) >= 2 and not (r[0] == r[-1]).all():
        r = np.vstack([r, r[:1]])
    return r


def ring_area2_units(ring: np.ndarray) -> int:
    """2×signed shoelace area in integer unit² (int64-exact)."""
    u = to_units(_closed(ring))
    x, y = u[:-1, 0], u[:-1, 1]
    x2, y2 = u[1:, 0], u[1:, 1]
    return int(np.sum(x * y2 - x2 * y))


def polygon_area2_units(parts: list[list[np.ndarray]]) -> int:
    """2×area in unit², exterior minus holes, orientation-insensitive:
    Σ_parts ( |A2(ext)| − Σ |A2(hole)| )."""
    total = 0
    for rings in parts:
        total += abs(ring_area2_units(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_area2_units(hole))
    return total


def perimeter(parts: list[list[np.ndarray]]) -> float:
    """Total ring length in degrees (float; not oracle-checked)."""
    tot = 0.0
    for rings in parts:
        for r in rings:
            c = _closed(np.asarray(r, dtype=np.float64))
            tot += float(np.sum(np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1]))))
    return tot


def counts(parts: list[list[np.ndarray]]) -> tuple[int, int, int]:
    """(n_parts, n_rings, n_vertices) with rings stored open (no dup of the
    closing vertex)."""
    n_rings = sum(len(rings) for rings in parts)
    n_vert = 0
    for rings in parts:
        for r in rings:
            r = np.asarray(r)
            n = len(r)
            if n >= 2 and (r[0] == r[-1]).all():
                n -= 1
            n_vert += n
    return len(parts), n_rings, n_vert


# ---------------------------------------------------------------------------
# convex hull — Andrew monotone chain on integer units (exact orientation)

def convex_hull(points: np.ndarray) -> np.ndarray:
    """(n,2) float coords → hull vertices CCW starting from the
    lexicographically smallest point; collinear points dropped.  Orientation
    tests run in int64 units → exact (OGRGeometry::ConvexHull parity)."""
    pts = np.asarray(points, dtype=np.float64)
    u = to_units(pts)
    order = np.lexsort((u[:, 1], u[:, 0]))
    u_sorted = u[order]
    _, first = np.unique(u_sorted, axis=0, return_index=True)
    uniq_idx = order[np.sort(first)]
    P = u[uniq_idx]
    if len(P) <= 2:
        return pts[uniq_idx]

    def half(idx_range):
        hull = []
        for i in idx_range:
            while len(hull) >= 2:
                o, a = P[hull[-2]], P[hull[-1]]
                cross = (a[0] - o[0]) * (P[i][1] - o[1]) - (a[1] - o[1]) * (P[i][0] - o[0])
                if cross <= 0:
                    hull.pop()
                else:
                    break
            hull.append(i)
        return hull

    lower = half(range(len(P)))
    upper = half(range(len(P) - 1, -1, -1))
    hull_idx = lower[:-1] + upper[:-1]
    return pts[uniq_idx][hull_idx]


# ---------------------------------------------------------------------------
# simplify — Douglas-Peucker (OGRGeometry::Simplify semantics, tolerance =
# max perpendicular deviation)

def douglas_peucker(line: np.ndarray, eps: float) -> np.ndarray:
    pts = np.asarray(line, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = pts[i1] - pts[i0]
        rel = pts[i0 + 1 : i1] - pts[i0]
        seg_len = np.hypot(*seg)
        if seg_len == 0:
            d = np.hypot(rel[:, 0], rel[:, 1])
        else:
            d = np.abs(seg[0] * rel[:, 1] - seg[1] * rel[:, 0]) / seg_len
        k = int(np.argmax(d))
        if d[k] > eps:
            j = i0 + 1 + k
            keep[j] = True
            stack.append((i0, j))
            stack.append((j, i1))
    return pts[keep]


# ---------------------------------------------------------------------------
# segmentize — insert vertices so no segment exceeds max_len
# (OGRGeometry::segmentize semantics: uniform subdivision per segment)

def segmentize(line: np.ndarray, max_len: float) -> np.ndarray:
    pts = np.asarray(line, dtype=np.float64)
    if len(pts) < 2:
        return pts
    out = [pts[:1]]
    for a, b in zip(pts[:-1], pts[1:]):
        d = float(np.hypot(*(b - a)))
        k = max(1, int(np.ceil(d / max_len)))
        t = np.arange(1, k + 1, dtype=np.float64)[:, None] / k
        out.append(a + t * (b - a))
    return np.vstack(out)


# ---------------------------------------------------------------------------
# buffer — point buffer as a regular k-gon (the reference delegates Buffer
# to GEOS; our sandbox parity is the k-segment circle approximation GEOS
# uses, quadrant_segments*4 vertices)

def buffer_point(x: float, y: float, radius: float, quadrant_segments: int = 8) -> np.ndarray:
    k = 4 * quadrant_segments
    ang = np.arange(k, dtype=np.float64) * (2 * np.pi / k)
    return np.stack([x + radius * np.cos(ang), y + radius * np.sin(ang)], axis=1)


def buffer_convex(ring: np.ndarray, radius: float, quadrant_segments: int = 8) -> np.ndarray:
    """Positive buffer of a CONVEX ring — Minkowski sum with the
    quadrant_segments·4-gon circle approximation GEOS uses
    (OGRGeometry::Buffer, ogr/ogrgeometry.cpp:4526, round joins): each
    edge shifts outward along its normal; each vertex gains arc points
    subdividing its exterior-angle turn.  Concave inputs need the full
    GEOS machinery and are rejected."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    n = len(pts)
    if n < 3:
        raise ValueError("buffer_convex needs a ring with >= 3 vertices")
    # enforce CCW
    x, y = pts[:, 0], pts[:, 1]
    area2 = np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
    if area2 < 0:
        pts = pts[::-1]
    edges = np.roll(pts, -1, axis=0) - pts
    cross = edges[:, 0] * np.roll(edges, -1, axis=0)[:, 1] - edges[:, 1] * np.roll(edges, -1, axis=0)[:, 0]
    if (cross < 0).any():
        raise ValueError("buffer_convex: ring is not convex")
    step = np.pi / (2 * quadrant_segments)
    out = []
    for i in range(n):
        e_prev = edges[i - 1]
        e_next = edges[i]
        # outward normals (right of a CCW edge)
        a0 = np.arctan2(-e_prev[0], e_prev[1])
        a1 = np.arctan2(-e_next[0], e_next[1])
        turn = (a1 - a0) % (2 * np.pi)
        m = int(np.ceil(turn / step))
        for j in range(m + 1):
            a = a0 + turn * j / max(m, 1)
            out.append((pts[i, 0] + radius * np.cos(a), pts[i, 1] + radius * np.sin(a)))
    return np.array(out, dtype=np.float64)


def swap_xy(xy: np.ndarray) -> np.ndarray:
    return np.asarray(xy)[:, ::-1]


# ---------------------------------------------------------------------------
# clip — Sutherland–Hodgman against an axis-aligned box (the `gdal vector
# clip` / warp-cutline primitive for convex clip regions; reference
# delegates to GEOS Intersection, ogrlayer.cpp clip path)

def clip_ring_box(ring: np.ndarray, x0: float, y0: float, x1: float, y1: float) -> np.ndarray:
    """Clip one (closed or open) ring to [x0,x1]×[y0,y1]; returns the
    clipped ring's vertices (possibly empty).  Vertices exactly on the
    boundary are kept (closed-region convention)."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]

    def clip_edge(poly, inside, intersect):
        out = []
        n = len(poly)
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            cin, nin = inside(cur), inside(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect(cur, nxt))
            elif nin:
                out.append(intersect(cur, nxt))
        return out

    def x_cross(a, b, x):
        t = (x - a[0]) / (b[0] - a[0])
        return (x, a[1] + t * (b[1] - a[1]))

    def y_cross(a, b, y):
        t = (y - a[1]) / (b[1] - a[1])
        return (a[0] + t * (b[0] - a[0]), y)

    poly = [tuple(p) for p in pts]
    for inside, intersect in (
        (lambda p: p[0] >= x0, lambda a, b: x_cross(a, b, x0)),
        (lambda p: p[0] <= x1, lambda a, b: x_cross(a, b, x1)),
        (lambda p: p[1] >= y0, lambda a, b: y_cross(a, b, y0)),
        (lambda p: p[1] <= y1, lambda a, b: y_cross(a, b, y1)),
    ):
        if not poly:
            break
        poly = clip_edge(poly, inside, intersect)
    return np.array(poly, dtype=np.float64).reshape(-1, 2)


def clip_ring_convex(ring: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of one ring against an arbitrary CONVEX
    clip polygon given CCW (generalizes :func:`clip_ring_box` from the four
    axis-aligned half-planes to any convex cell — warp cutlines, triangle
    overlays, convex tiles).  Boundary points kept (closed region).

    Reference semantics: OGRGeometry::Intersection (ogr/ogrgeometry.cpp:4893)
    restricted to convex method geometries; like the box clip, a concave
    subject whose intersection is multi-part comes back as one ring with
    zero-area connectors — area-exact, not topology-exact."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    cp = np.asarray(clip, dtype=np.float64)
    if len(cp) >= 2 and (cp[0] == cp[-1]).all():
        cp = cp[:-1]
    poly = [tuple(p) for p in pts]
    for e in range(len(cp)):
        if not poly:
            break
        ax, ay = cp[e]
        bx, by = cp[(e + 1) % len(cp)]
        ex, ey = bx - ax, by - ay

        def side(p):
            # >= 0 ⇔ p on the interior side (left of the CCW edge)
            return ex * (p[1] - ay) - ey * (p[0] - ax)

        out = []
        n = len(poly)
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            sc, sn = side(cur), side(nxt)
            if sc >= 0:
                out.append(cur)
                if sn < 0:
                    t = sc / (sc - sn)
                    out.append((cur[0] + t * (nxt[0] - cur[0]), cur[1] + t * (nxt[1] - cur[1])))
            elif sn >= 0:
                t = sc / (sc - sn)
                out.append((cur[0] + t * (nxt[0] - cur[0]), cur[1] + t * (nxt[1] - cur[1])))
        poly = out
    return np.array(poly, dtype=np.float64).reshape(-1, 2)


def ring_area2_float(r: np.ndarray) -> float:
    """2× unsigned shoelace area of a (possibly open) float ring."""
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def centroid6_units(parts: list[list[np.ndarray]]) -> tuple[int, int, int]:
    """Exact area-weighted polygon centroid as int64 rationals:
    returns (sx6, sy6, a2) in hundredth-degree units with
    Cx = sx6 / (3·a2), Cy = sy6 / (3·a2) — exterior minus holes,
    orientation-insensitive (OGRGeometry Centroid parity, integer-exact so
    the SQL oracle reproduces the numbers bit-for-bit)."""
    sx6 = sy6 = a2 = 0
    for rings in parts:
        for ri, ring in enumerate(rings):
            u = to_units(_closed(ring))
            x, y = u[:-1, 0], u[:-1, 1]
            x2, y2 = u[1:, 0], u[1:, 1]
            cross = x * y2 - x2 * y
            ra2 = int(cross.sum())
            rsx = int(((x + x2) * cross).sum())
            rsy = int(((y + y2) * cross).sum())
            sign = 1 if ra2 >= 0 else -1
            factor = sign * (-1 if ri > 0 else 1)  # holes subtract
            a2 += factor * ra2
            sx6 += factor * rsx
            sy6 += factor * rsy
    return sx6, sy6, a2


def make_valid_pinch(ring: np.ndarray) -> list[np.ndarray]:
    """Split a self-touching ring (repeated vertices — figure-eights,
    pinched lobes) into its simple loops: the OGRGeometry::MakeValid
    (ogr/ogrgeometry.cpp:3922, GEOSMakeValid 'linework') behavior for the
    self-TOUCHING subset; crossing-edge (bowtie-without-shared-vertex)
    repair is out of scope and returns the ring unchanged.

    Walk the vertices keeping a stack; when a vertex reappears, the slice
    since its previous occurrence is a closed loop — emit it and collapse.
    Exact match on integer-unit coordinates."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    u = to_units(pts)
    stack: list[int] = []
    seen: dict[tuple[int, int], int] = {}
    loops: list[np.ndarray] = []
    for i in range(len(u)):
        key = (int(u[i, 0]), int(u[i, 1]))
        if key in seen:
            depth = seen[key]
            loop_idx = stack[depth:]
            if len(loop_idx) >= 3:
                loops.append(pts[loop_idx])
            for j in stack[depth:]:
                seen.pop((int(u[j, 0]), int(u[j, 1])), None)
            del stack[depth:]
            seen[key] = len(stack)
            stack.append(i)
        else:
            seen[key] = len(stack)
            stack.append(i)
    if len(stack) >= 3:
        loops.append(pts[stack])
    return loops if loops else [pts]


def ear_clip(ring: np.ndarray) -> list[np.ndarray]:
    """Triangulate a simple (concave OK, no holes) ring by ear clipping.
    Orientation tests run on integer units → robust for the fixture
    coordinate grid.  Returns (3,2) float triangles whose disjoint union
    is the polygon."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    u = to_units(pts)
    n = len(pts)
    if n < 3:
        return []
    # normalize to CCW
    x, y = u[:, 0], u[:, 1]
    if int(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0:
        pts = pts[::-1]
        u = u[::-1]
    idx = list(range(len(pts)))
    tris: list[np.ndarray] = []

    def cross(o, a, b):
        return int((u[a, 0] - u[o, 0]) * (u[b, 1] - u[o, 1])
                   - (u[a, 1] - u[o, 1]) * (u[b, 0] - u[o, 0]))

    def point_in_tri(p, a, b, c):
        d1 = cross(a, b, p)
        d2 = cross(b, c, p)
        d3 = cross(c, a, p)
        return d1 > 0 and d2 > 0 and d3 > 0

    guard = 0
    while len(idx) > 3 and guard < 10 * n * n:
        guard += 1
        m = len(idx)
        for k in range(m):
            a, b, c = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            if cross(a, b, c) <= 0:
                continue  # reflex or degenerate corner
            if any(point_in_tri(j, a, b, c) for j in idx if j not in (a, b, c)):
                continue
            tris.append(pts[[a, b, c]])
            idx.pop(k)
            break
        else:
            break  # no ear found (degenerate input) — bail with partial fan
    if len(idx) == 3:
        a, b, c = idx
        if cross(a, b, c) != 0:
            tris.append(pts[[a, b, c]])
    return tris


def polygon_intersection_area2_units(parts_a, parts_b) -> int:
    """Exact 2×area (integer unit², rounded) of (Multi)Polygon ∩
    (Multi)Polygon for arbitrary simple rings incl. concave parts and
    holes — OGRLayer::Intersection area semantics (ogr/ogrlayer.cpp:3345)
    without GEOS:

    Triangulate every ring of both sides (ear clipping) and sum
    triangle∩triangle areas (each pair via the convex Sutherland–Hodgman
    clip).  Triangles of one ring are interior-disjoint, so areas add;
    holes enter with inclusion–exclusion
    (ext∩ext − ext∩hole − hole∩ext + hole∩hole)."""
    def ring_tris(parts):
        ext, hol = [], []
        for rings in parts:
            ext.extend(ear_clip(rings[0]))
            for h in rings[1:]:
                hol.extend(ear_clip(h))
        return ext, hol

    ea, ha = ring_tris(parts_a)
    eb, hb = ring_tris(parts_b)

    def tri_bbox(ts):
        if not ts:
            return np.empty((0, 4))
        arr = np.stack([np.concatenate([t.min(axis=0), t.max(axis=0)]) for t in ts])
        return arr

    def pair_area2(ta, tb) -> float:
        ba, bb = tri_bbox(ta), tri_bbox(tb)
        total = 0.0
        for i, t1 in enumerate(ta):
            x0, y0, x1, y1 = ba[i]
            for j, t2 in enumerate(tb):
                if bb[j, 0] > x1 or bb[j, 2] < x0 or bb[j, 1] > y1 or bb[j, 3] < y0:
                    continue
                inter = clip_ring_convex(t1, t2)
                total += ring_area2_float(inter)
        return total

    a2 = (pair_area2(ea, eb) - pair_area2(ea, hb)
          - pair_area2(ha, eb) + pair_area2(ha, hb))
    return int(round(a2 * UNIT * UNIT))


def clipped_area(parts: list[list[np.ndarray]], x0, y0, x1, y1) -> float:
    """Area of (Multi)Polygon ∩ box (exterior − holes), via per-ring clip.
    Correct for rings whose box intersection is simply connected (our
    fixture shapes); float area in deg²."""
    def ring_area(r):
        if len(r) < 3:
            return 0.0
        x, y = r[:, 0], r[:, 1]
        return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))

    total = 0.0
    for rings in parts:
        total += ring_area(clip_ring_box(rings[0], x0, y0, x1, y1))
        for hole in rings[1:]:
            total -= ring_area(clip_ring_box(hole, x0, y0, x1, y1))
    return total


def union_area_rects(x0: np.ndarray, y0: np.ndarray,
                     x1: np.ndarray, y1: np.ndarray) -> int:
    """Exact union area of axis-aligned integer rectangles via the
    classic coordinate-compression slab sweep: for each x-slab between
    consecutive distinct rect edges, the union of active y-intervals
    (vectorized cummax segmentation) times the slab width.  Integer
    arithmetic throughout — no epsilon.  The dissolve / ST_Union(area)
    kernel for rectangular footprints (the reference dissolves via GEOS
    cascaded union, ogr/ogrgeometryfactory.cpp organizePolygons +
    GEOSUnion; same result for this geometry class)."""
    x0 = np.asarray(x0, dtype=np.int64)
    y0 = np.asarray(y0, dtype=np.int64)
    x1 = np.asarray(x1, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    xs = np.unique(np.concatenate([x0, x1]))
    total = 0
    for k in range(len(xs) - 1):
        xa, xb = int(xs[k]), int(xs[k + 1])
        sel = (x0 < xb) & (x1 > xa)
        if not sel.any():
            continue
        ys0, ys1 = y0[sel], y1[sel]
        order = np.argsort(ys0, kind="stable")
        ys0, ys1 = ys0[order], ys1[order]
        cm = np.maximum.accumulate(ys1)
        new = np.concatenate([[True], ys0[1:] > cm[:-1]])
        seg_starts = ys0[new]
        seg_last = np.concatenate([np.nonzero(new)[0][1:] - 1,
                                   [len(ys0) - 1]])
        seg_ends = cm[seg_last]
        covered = int((seg_ends - seg_starts).sum())
        total += (xb - xa) * covered
    return total


def clip_line_box(line: np.ndarray, x0: float, y0: float,
                  x1: float, y1: float) -> list[np.ndarray]:
    """Clip a polyline to an axis-aligned box (Liang–Barsky per segment,
    consecutive in-box segments stitched back together) -> list of
    clipped sub-lines.  The MVT tiling door's linestring kernel
    (reference: mvtutils.cpp clips through GEOS Intersection)."""
    line = np.asarray(line, dtype=np.float64)
    out: list[np.ndarray] = []
    cur: list[np.ndarray] = []

    def flush():
        nonlocal cur
        if len(cur) >= 2:
            out.append(np.asarray(cur))
        cur = []

    for i in range(len(line) - 1):
        p, q = line[i], line[i + 1]
        d = q - p
        t0, t1 = 0.0, 1.0
        ok = True
        for delta, lo, hi, c in ((d[0], x0, x1, p[0]), (d[1], y0, y1, p[1])):
            if delta == 0.0:
                if c < lo or c > hi:
                    ok = False
                    break
            else:
                ta, tb = (lo - c) / delta, (hi - c) / delta
                if ta > tb:
                    ta, tb = tb, ta
                t0, t1 = max(t0, ta), min(t1, tb)
                if t0 > t1:
                    ok = False
                    break
        if not ok:
            flush()
            continue
        a = p + t0 * d
        b = p + t1 * d
        if not cur:
            cur = [a]
        elif not np.array_equal(cur[-1], a):
            flush()
            cur = [a]
        cur.append(b)
        if t1 < 1.0:
            flush()
    flush()
    return out
