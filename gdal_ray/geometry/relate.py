"""Pairwise geometry predicates — the OGR relate surface
(ogr/ogrgeometry.cpp: Intersects :579, Disjoint :5588, Touches :5661,
Within :5842, Contains :5915, Overlaps; Distance :3562) for the
(Multi)Polygon subset this engine handles, implemented WITHOUT GEOS on
two exact primitives:

  interiors    exact integer intersection area
               (ops.polygon_intersection_area2_units — ear-clip ×
               Sutherland–Hodgman, inclusion–exclusion for holes):
               interiors overlap  ⟺  area > 0; Within/Contains/Equals
               are integer comparisons of that area against each side's
               own area.
  boundaries   all-pairs segment contact in integer units (int64 cross
               products — orientation tests are EXACT for the
               0.01-degree-quantized fixture coords, matching to_units'
               contract): proper crossings, endpoint touches and
               collinear overlaps all count as contact.

Predicate table (area/area, OGC SF semantics):
  intersects = area > 0 or boundary contact
  disjoint   = not intersects
  within     = area == own_area (interior fully covered)
  contains   = within flipped
  equals     = area == both areas
  touches    = boundary contact and area == 0
  overlaps   = 0 < area < min(own areas)  (same dimension, partial)
Distance: 0 when intersecting, else the min vertex↔segment distance
(attained there for polygon pairs).

Contract: slivers thinner than half an integer unit² round to area 0 and
read as touches — irrelevant for the quantized fixtures, stated for
honesty.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geometry.ops import (polygon_area2_units,
                                   polygon_intersection_area2_units,
                                   to_units, _closed)
from gdal_ray.geometry.wkb import polygon_parts


def _segments_units(parts) -> np.ndarray:
    """(N, 4) int64 segment endpoints (x1, y1, x2, y2) over all rings."""
    segs = []
    for rings in parts:
        for r in rings:
            u = to_units(_closed(r))
            segs.append(np.concatenate([u[:-1], u[1:]], axis=1))
    return np.concatenate(segs, axis=0) if segs else np.empty((0, 4), np.int64)


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def segments_contact(sa: np.ndarray, sb: np.ndarray) -> bool:
    """True if ANY segment of sa meets any segment of sb (proper
    crossing, endpoint touch, or collinear overlap) — all-pairs int64
    orientation tests, fully vectorized."""
    if not len(sa) or not len(sb):
        return False
    p1x = sa[:, 0][:, None]
    p1y = sa[:, 1][:, None]
    p2x = sa[:, 2][:, None]
    p2y = sa[:, 3][:, None]
    q1x = sb[:, 0][None, :]
    q1y = sb[:, 1][None, :]
    q2x = sb[:, 2][None, :]
    q2y = sb[:, 3][None, :]
    d1 = _cross(p1x, p1y, p2x, p2y, q1x, q1y)
    d2 = _cross(p1x, p1y, p2x, p2y, q2x, q2y)
    d3 = _cross(q1x, q1y, q2x, q2y, p1x, p1y)
    d4 = _cross(q1x, q1y, q2x, q2y, p2x, p2y)
    s1 = np.sign(d1)
    s2 = np.sign(d2)
    s3 = np.sign(d3)
    s4 = np.sign(d4)
    general = (s1 * s2 <= 0) & (s3 * s4 <= 0)
    # general position (no zeros): crossing guaranteed
    nz = (s1 != 0) & (s2 != 0) & (s3 != 0) & (s4 != 0)
    if np.any(general & nz):
        return True
    # boundary cases: some orientation is zero — require the collinear
    # endpoint to actually lie within the other segment's bbox
    cand = general & ~nz
    if not np.any(cand):
        return False

    def on_seg(ox, oy, ax, ay, bx, by, d):
        return (d == 0) & (np.minimum(ox, ax) <= bx) & \
            (bx <= np.maximum(ox, ax)) & (np.minimum(oy, ay) <= by) & \
            (by <= np.maximum(oy, ay))

    touch = (on_seg(p1x, p1y, p2x, p2y, q1x, q1y, d1)
             | on_seg(p1x, p1y, p2x, p2y, q2x, q2y, d2)
             | on_seg(q1x, q1y, q2x, q2y, p1x, p1y, d3)
             | on_seg(q1x, q1y, q2x, q2y, p2x, p2y, d4))
    return bool(np.any(touch & cand))


def relate_polygons(wkb_a: bytes, wkb_b: bytes) -> dict:
    """All OGR area/area predicates in one pass (shared primitives)."""
    pa_ = polygon_parts(wkb_a)
    pb_ = polygon_parts(wkb_b)
    area_a = polygon_area2_units(pa_)
    area_b = polygon_area2_units(pb_)
    inter = polygon_intersection_area2_units(pa_, pb_)
    contact = segments_contact(_segments_units(pa_), _segments_units(pb_))
    intersects = inter > 0 or contact
    return {
        "intersects": intersects,
        "disjoint": not intersects,
        "within": inter == area_a,
        "contains": inter == area_b,
        "equals": inter == area_a == area_b,
        "touches": contact and inter == 0,
        "overlaps": 0 < inter < min(area_a, area_b),
        "inter_area2_units": inter,
    }


def polygon_distance(wkb_a: bytes, wkb_b: bytes) -> float:
    """Min distance between two (Multi)Polygons in coordinate units
    (degrees here — planar, like OGRGeometry::Distance without GEOS
    geodesics): 0 when they intersect, else the minimum vertex↔segment
    distance (attained there for polygon pairs)."""
    r = relate_polygons(wkb_a, wkb_b)
    if r["intersects"]:
        return 0.0
    sa = _segments_units(polygon_parts(wkb_a)).astype(np.float64)
    sb = _segments_units(polygon_parts(wkb_b)).astype(np.float64)

    def pts(s):
        return np.unique(np.concatenate([s[:, :2], s[:, 2:]]), axis=0)

    def pt_seg_d2(P, S):
        # squared distance of every point to every segment
        px = P[:, 0][:, None]
        py = P[:, 1][:, None]
        ax = S[:, 0][None, :]
        ay = S[:, 1][None, :]
        bx = S[:, 2][None, :]
        by = S[:, 3][None, :]
        dx = bx - ax
        dy = by - ay
        ln = dx * dx + dy * dy
        t = np.clip(np.divide((px - ax) * dx + (py - ay) * dy,
                              np.where(ln == 0, 1.0, ln)), 0.0, 1.0)
        cx = ax + t * dx
        cy = ay + t * dy
        return ((px - cx) ** 2 + (py - cy) ** 2).min()

    d2 = min(pt_seg_d2(pts(sa), sb), pt_seg_d2(pts(sb), sa))
    from gdal_ray.geometry.ops import UNIT

    return float(np.sqrt(d2)) / UNIT
