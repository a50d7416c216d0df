"""ogr2ogr-style vector translate: the reference's most-used vector ETL
entry point (apps/ogr2ogr_lib.cpp; SURVEY.md §3.3) as ONE composable
Ray Data stage over a WKB-geometry Dataset.

Options mirror the CLI surface:
  -where  → ``where`` (swq expression string, compiled by gdal_ray.sql to
            Arrow kernels — the same engine behind execute_sql)
  -select → ``select`` (attribute columns kept alongside the geometry)
  -clipsrc xmin ymin xmax ymax → ``clip_bbox`` (Sutherland–Hodgman ring
            clip, geometry/ops.clip_ring_box — OGRGeometry::Intersection
            with a rectangle)
  -s_srs / -t_srs → ``s_srs``/``t_srs`` (per-vertex reprojection through
            the closed-form transform_fn registry: 4326/3857/UTM/LCC/
            polar stereo/Albers/LAEA)

Everything is a single map_batches chain: filter → clip → reproject →
project.  No shuffle, no materialization — ogr2ogr is embarrassingly
parallel per feature and stays that way at 100 TB."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.geometry.wkb import encode_multipolygon, encode_polygon, polygon_parts


def _transform_parts(parts, f):
    out = []
    for rings in parts:
        new_rings = []
        for r in rings:
            x, y = f(r[:, 0], r[:, 1])
            new_rings.append(np.stack([x, y], axis=1))
        out.append(new_rings)
    return out


def _encode_parts(parts) -> bytes:
    if len(parts) == 1:
        return encode_polygon(parts[0])
    return encode_multipolygon(parts)


def vector_translate(
    ds,
    *,
    where: str | None = None,
    select: list[str] | None = None,
    clip_bbox: tuple[float, float, float, float] | None = None,
    s_srs: str = "EPSG:4326",
    t_srs: str | None = None,
    geometry_col: str = "wkb",
):
    """Filter/clip/reproject/project a polygon Dataset (ogr2ogr chain).
    Features whose geometry clips away entirely are dropped, like
    ogr2ogr -clipsrc.  Returns the transformed Dataset (lazy)."""
    from gdal_ray.geometry.ops import clip_ring_box

    where_ast = None
    if where is not None:
        from gdal_ray.sql import _tokenize, _parse_expr, _P
        p = _P(_tokenize(where))
        where_ast = _parse_expr(p)
        p.expect("eof")

    fwd = None
    if t_srs is not None and t_srs != s_srs:
        from gdal_ray.crs import transform_fn
        fwd = transform_fn(s_srs, t_srs)

    def tr(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from gdal_ray.sql import _eval

        if where_ast is not None and b.num_rows:
            mask = _eval(where_ast, b)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            b = b.filter(pc.fill_null(mask, False))
        attr_cols = [c for c in b.column_names if c != geometry_col]
        if select is not None:
            missing = set(select) - set(attr_cols)
            if missing:
                raise ValueError(f"select: unknown columns {sorted(missing)}")
            attr_cols = list(select)
        keep_rows, out_wkb = [], []
        for i in range(b.num_rows):
            raw = b.column(geometry_col)[i].as_py()
            code = int.from_bytes(raw[1:5], "little" if raw[0] == 1 else "big") % 1000
            if code in (1, 4):  # (Multi)Point: clip = inside test, transform = map coords
                from gdal_ray.sources.geojson import (geometry_to_wkb,
                                                      wkb_to_geometry)

                g = wkb_to_geometry(raw)
                pts = [g["coordinates"]] if code == 1 else g["coordinates"]
                if clip_bbox is not None:
                    x0, y0, x1, y1 = clip_bbox
                    pts = [p for p in pts
                           if x0 <= p[0] <= x1 and y0 <= p[1] <= y1]
                    if not pts:
                        continue
                if fwd is not None:
                    import numpy as _np

                    xs, ys = fwd(_np.array([p[0] for p in pts]),
                                 _np.array([p[1] for p in pts]))
                    pts = [[float(x), float(y)] for x, y in zip(xs, ys)]
                g = ({"type": "Point", "coordinates": pts[0]} if code == 1
                     else {"type": "MultiPoint", "coordinates": pts})
                keep_rows.append(i)
                out_wkb.append(geometry_to_wkb(g))
                continue
            if code in (2, 5) and clip_bbox is None and fwd is None:
                keep_rows.append(i)  # (Multi)LineString untouched: pass through
                out_wkb.append(raw)
                continue
            parts = polygon_parts(raw)
            if clip_bbox is not None:
                x0, y0, x1, y1 = clip_bbox
                clipped = []
                for rings in parts:
                    new_rings = [clip_ring_box(r, x0, y0, x1, y1) for r in rings]
                    new_rings = [r for r in new_rings if len(r) >= 3]
                    if new_rings:
                        clipped.append(new_rings)
                parts = clipped
                if not parts:
                    continue  # feature fully outside the clip box
            if fwd is not None:
                parts = _transform_parts(parts, fwd)
            keep_rows.append(i)
            out_wkb.append(_encode_parts(parts))
        cols = {geometry_col: pa.array(out_wkb, pa.binary())}
        taken = b.take(pa.array(keep_rows, pa.int64()))
        for c in attr_cols:
            cols[c] = taken.column(c)
        return pa.table(cols)

    return ds.map_batches(tr, batch_format="pyarrow")
