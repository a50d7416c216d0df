"""ST_* spatial SQL functions over WKB columns — the OGR SQLite-dialect
surface (ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp registers the
same names over GEOS; Spatialite semantics).

Geometry values flow through SQL as WKB ``binary`` columns, so the
functions compose (``ST_X(ST_CENTROID(wkb))``).  Evaluation is per-row
over the batch — spatial scalar functions are inherently per-feature,
the same shape as the reference's per-feature GEOS calls — with the
numeric kernels delegated to :mod:`gdal_ray.geometry`'s vectorized
primitives.

Supported (raise with the feature name otherwise):
ST_AREA, ST_PERIMETER, ST_LENGTH, ST_NPOINTS, ST_GEOMETRYTYPE,
ST_ISEMPTY, ST_MINX/MINY/MAXX/MAXY, ST_ENVELOPE, ST_CENTROID,
ST_X, ST_Y, ST_ASTEXT, ST_GEOMFROMTEXT, ST_CONVEXHULL,
ST_SIMPLIFY, ST_INTERSECTS, ST_DISJOINT, ST_CONTAINS, ST_WITHIN,
ST_DISTANCE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _wkbs(arr) -> list:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Scalar):
        return [arr.as_py()]
    return arr.to_pylist()


def _all_points(wkb: bytes) -> np.ndarray:
    from gdal_ray.geometry.wkb import GeomType, decode_wkb

    kind, payload = decode_wkb(wkb)
    if kind == GeomType.POINT:
        return payload.reshape(1, 2)
    if kind in (GeomType.LINESTRING, GeomType.MULTIPOINT):
        if kind == GeomType.MULTIPOINT:
            return np.vstack([p for _t, p in payload]).reshape(-1, 2)
        return payload
    if kind == GeomType.POLYGON:
        return np.vstack(payload)
    if kind == GeomType.MULTILINESTRING:
        return np.vstack([p for _t, p in payload])
    if kind == GeomType.MULTIPOLYGON:
        return np.vstack([r for _t, rings in payload for r in rings])
    raise ValueError(f"geometry type {kind}")


def _area(wkb: bytes) -> float:
    from gdal_ray.geometry.ops import ring_area2_float
    from gdal_ray.geometry.wkb import polygon_parts

    total = 0.0
    for rings in polygon_parts(wkb):
        for i, r in enumerate(rings):
            a = abs(ring_area2_float(r)) / 2.0
            total += a if i == 0 else -a
    return total


def _perimeter(wkb: bytes) -> float:
    from gdal_ray.geometry.wkb import polygon_parts

    total = 0.0
    for rings in polygon_parts(wkb):
        for r in rings:
            rr = r if (r[0] == r[-1]).all() else np.vstack([r, r[:1]])
            total += float(np.hypot(*(rr[1:] - rr[:-1]).T).sum())
    return total


def _length(wkb: bytes) -> float:
    from gdal_ray.geometry.wkb import GeomType, decode_wkb

    kind, payload = decode_wkb(wkb)
    if kind == GeomType.LINESTRING:
        return float(np.hypot(*(payload[1:] - payload[:-1]).T).sum())
    if kind == GeomType.MULTILINESTRING:
        return sum(float(np.hypot(*(p[1:] - p[:-1]).T).sum())
                   for _t, p in payload)
    # Spatialite's ST_Length on areal types returns the perimeter
    return _perimeter(wkb)


def _centroid(wkb: bytes) -> bytes:
    from gdal_ray.geometry.wkb import (GeomType, decode_wkb, encode_point,
                                       polygon_parts)

    kind, payload = decode_wkb(wkb)
    if kind == GeomType.POINT:
        return encode_point(float(payload[0]), float(payload[1]))
    if kind in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        # area-weighted (signed shoelace moments), holes subtract
        sa = sx = sy = 0.0
        for rings in polygon_parts(wkb):
            for i, r in enumerate(rings):
                rr = r if (r[0] == r[-1]).all() else np.vstack([r, r[:1]])
                x0, y0 = rr[:-1, 0], rr[:-1, 1]
                x1, y1 = rr[1:, 0], rr[1:, 1]
                cross = x0 * y1 - x1 * y0
                a2 = cross.sum()
                sgn = 1.0 if i == 0 else -1.0
                sa += sgn * abs(a2)
                s = sgn * np.sign(a2) if a2 != 0 else 0.0
                sx += s * ((x0 + x1) * cross).sum()
                sy += s * ((y0 + y1) * cross).sum()
        if sa == 0.0:
            pts = _all_points(wkb)
            return encode_point(float(pts[:, 0].mean()),
                                float(pts[:, 1].mean()))
        return encode_point(sx / (3.0 * sa), sy / (3.0 * sa))
    pts = _all_points(wkb)
    return encode_point(float(pts[:, 0].mean()), float(pts[:, 1].mean()))


def _envelope(wkb: bytes) -> bytes:
    from gdal_ray.geometry.wkb import encode_polygon

    p = _all_points(wkb)
    x0, y0 = p[:, 0].min(), p[:, 1].min()
    x1, y1 = p[:, 0].max(), p[:, 1].max()
    return encode_polygon([np.array([[x0, y0], [x1, y0], [x1, y1],
                                     [x0, y1], [x0, y0]])])


def _geom_type(wkb: bytes) -> str:
    g = int.from_bytes(wkb[1:5], "little" if wkb[0] else "big") & 0xFF
    return {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
            5: "MULTILINESTRING", 6: "MULTIPOLYGON"}.get(g, f"GEOMETRY{g}")


def _intersects(wa: bytes, wb: bytes) -> bool:
    from gdal_ray.geometry.relate import relate_polygons

    r = relate_polygons(wa, wb)
    return bool(r["intersects"])


def _contains(wa: bytes, wb: bytes) -> bool:
    from gdal_ray.geometry.relate import relate_polygons

    return bool(relate_polygons(wa, wb)["contains"])


def _distance(wa: bytes, wb: bytes) -> float:
    from gdal_ray.geometry.relate import polygon_distance

    return float(polygon_distance(wa, wb))


def eval_st(fn: str, args: list, node) -> pa.Array:
    """Dispatch one ST_* call over already-evaluated argument columns."""
    from gdal_ray.geometry.ops import convex_hull, douglas_peucker
    from gdal_ray.geometry.wkb import (GeomType, decode_wkb,
                                       encode_polygon)
    from gdal_ray.geometry.wkt import wkb_to_wkt, wkt_to_wkb

    a0 = _wkbs(args[0])

    if fn == "ST_GEOMFROMTEXT":
        return pa.array([wkt_to_wkb(w) for w in a0], pa.binary())
    if fn == "ST_ASTEXT":
        return pa.array([wkb_to_wkt(w) for w in a0], pa.string())
    if fn == "ST_AREA":
        return pa.array([_area(w) for w in a0], pa.float64())
    if fn == "ST_PERIMETER":
        return pa.array([_perimeter(w) for w in a0], pa.float64())
    if fn == "ST_LENGTH":
        return pa.array([_length(w) for w in a0], pa.float64())
    if fn == "ST_NPOINTS":
        return pa.array([len(_all_points(w)) for w in a0], pa.int64())
    if fn == "ST_GEOMETRYTYPE":
        return pa.array([_geom_type(w) for w in a0], pa.string())
    if fn == "ST_ISEMPTY":
        return pa.array([len(_all_points(w)) == 0 for w in a0], pa.bool_())
    if fn in ("ST_MINX", "ST_MINY", "ST_MAXX", "ST_MAXY"):
        ax = 0 if fn[-1] == "X" else 1
        red = np.min if fn[3:6] == "MIN" else np.max
        return pa.array([float(red(_all_points(w)[:, ax])) for w in a0],
                        pa.float64())
    if fn == "ST_ENVELOPE":
        return pa.array([_envelope(w) for w in a0], pa.binary())
    if fn == "ST_CENTROID":
        return pa.array([_centroid(w) for w in a0], pa.binary())
    if fn in ("ST_X", "ST_Y"):
        out = []
        for w in a0:
            kind, payload = decode_wkb(w)
            if kind != GeomType.POINT:
                raise ValueError(f"{fn} needs POINT input")
            out.append(float(payload[0 if fn == "ST_X" else 1]))
        return pa.array(out, pa.float64())
    if fn == "ST_CONVEXHULL":
        return pa.array(
            [encode_polygon([convex_hull(_all_points(w))]) for w in a0],
            pa.binary())
    if fn == "ST_SIMPLIFY":
        tol = args[1].as_py() if isinstance(args[1], pa.Scalar) \
            else float(np.asarray(args[1])[0])
        from gdal_ray.geometry.wkb import polygon_parts

        out = []
        for w in a0:
            kind, payload = decode_wkb(w)
            if kind == GeomType.LINESTRING:
                from gdal_ray.geometry.wkb import encode_linestring

                out.append(encode_linestring(douglas_peucker(payload, tol)))
            elif kind == GeomType.POLYGON:
                rings = [douglas_peucker(
                    r if (r[0] == r[-1]).all() else np.vstack([r, r[:1]]),
                    tol) for r in polygon_parts(w)[0]]
                out.append(encode_polygon(rings))
            else:
                raise NotImplementedError(f"ST_SIMPLIFY for {kind}")
        return pa.array(out, pa.binary())
    if fn == "ST_BUFFER":
        from gdal_ray.geometry.ops import buffer_convex, buffer_point
        from gdal_ray.geometry.wkb import polygon_parts

        dist = args[1].as_py() if isinstance(args[1], pa.Scalar) \
            else float(np.asarray(args[1])[0])
        out = []
        for w in a0:
            kind, payload = decode_wkb(w)
            if kind == GeomType.POINT:
                ring = buffer_point(float(payload[0]), float(payload[1]),
                                    dist)
            elif kind == GeomType.POLYGON:
                # convex-ring buffer (ops.buffer_convex contract); the
                # reference's general GEOS buffer covers concave input
                ring = buffer_convex(convex_hull(polygon_parts(w)[0][0]),
                                     dist)
            else:
                raise NotImplementedError(f"ST_BUFFER for {kind}")
            out.append(encode_polygon([ring]))
        return pa.array(out, pa.binary())
    if fn in ("ST_INTERSECTS", "ST_DISJOINT", "ST_CONTAINS", "ST_WITHIN",
              "ST_DISTANCE"):
        b0 = _wkbs(args[1])
        if len(b0) == 1 and len(a0) > 1:
            b0 = b0 * len(a0)
        if len(a0) == 1 and len(b0) > 1:
            a0 = a0 * len(b0)
        if fn == "ST_DISTANCE":
            return pa.array([_distance(x, y) for x, y in zip(a0, b0)],
                            pa.float64())
        if fn == "ST_INTERSECTS":
            vals = [_intersects(x, y) for x, y in zip(a0, b0)]
        elif fn == "ST_DISJOINT":
            vals = [not _intersects(x, y) for x, y in zip(a0, b0)]
        elif fn == "ST_CONTAINS":
            vals = [_contains(x, y) for x, y in zip(a0, b0)]
        else:  # ST_WITHIN(a, b) == ST_CONTAINS(b, a)
            vals = [_contains(y, x) for x, y in zip(a0, b0)]
        return pa.array(vals, pa.bool_())
    raise NotImplementedError(f"spatial function {fn}")
