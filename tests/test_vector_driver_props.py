"""Property round-trips across the interchange drivers (MIF/GML) with
random grid-quantized polygons, plus an ogr2ogr-door conversion chain."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from gdal_ray.geometry.wkb import encode_point, encode_polygon, polygon_parts


def _rand_box(rng):
    x0 = round(float(rng.uniform(-170, 160)), 2)
    y0 = round(float(rng.uniform(-80, 70)), 2)
    w = round(float(rng.uniform(0.5, 8.0)), 2)
    h = round(float(rng.uniform(0.5, 8.0)), 2)
    return np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=1, max_value=12), st.integers(0, 10**6))
def test_mif_gml_polygon_roundtrip(n, seed):
    import os
    import tempfile

    from gdal_ray.sources.gml import write_gml
    from gdal_ray.sources.mifmid import write_mifmid, _parse_records
    from gdal_ray.sources.gml import _member_spans, _parse_member

    rng = np.random.default_rng(seed)
    wkbs = [encode_polygon([_rand_box(rng)]) for _ in range(n)]
    tbl = pa.table({"wkb": pa.array(wkbs, pa.binary()),
                    "name": pa.array([f"p{i}" for i in range(n)])})
    d = tempfile.mkdtemp()
    # MIF: driver-side parse (no Ray) — geometry vertices survive exactly
    write_mifmid(os.path.join(d, "x.mif"), tbl)
    data_lines = open(os.path.join(d, "x.mif")).read().splitlines()
    start = data_lines.index("DATA") + 1
    geoms = _parse_records(data_lines[start:])
    assert len(geoms) == n
    for w_in, w_out in zip(wkbs, geoms):
        a = polygon_parts(w_in)[0][0]
        b = polygon_parts(w_out)[0][0]
        np.testing.assert_array_equal(a[:4], b[:4])
    # GML: member spans parse
    write_gml(os.path.join(d, "x.gml"), tbl)
    with open(os.path.join(d, "x.gml"), "rb") as f:
        buf = f.read()
    _tag, spans = _member_spans(os.path.join(d, "x.gml"))
    assert len(spans) == n
    for (s0, s1), w_in in zip(spans, wkbs):
        w_out, attrs = _parse_member(buf[s0:s1].decode())
        a = polygon_parts(w_in)[0][0]
        b = polygon_parts(w_out)[0][0]
        np.testing.assert_array_equal(a[:4], b[:4])


def test_conversion_chain_gml_to_gpkg_to_shp(tmp_path, ray_session):
    """open_vector/save_vector door chain: GML -> GPKG -> Shapefile —
    geometry and attribute survival across three drivers."""
    from gdal_ray.sources import open_vector, save_vector

    rng = np.random.default_rng(3)
    wkbs = [encode_point(round(float(rng.uniform(-179, 179)), 2),
                         round(float(rng.uniform(-89, 89)), 2))
            for _ in range(7)]
    tbl = pa.table({
        "fid": pa.array(range(1, 8), pa.int64()),
        "wkb": pa.array(wkbs, pa.binary()),
        "name": pa.array([f"f{i}" for i in range(7)]),
    })
    from gdal_ray.sources.gml import write_gml

    g = str(tmp_path / "a.gml")
    write_gml(g, tbl)
    def nofid(ds):
        return ds.map_batches(
            lambda b: b.drop_columns(
                [c for c in ("fid",) if c in b.column_names]),
            batch_format="pyarrow")

    ds1 = open_vector(g)
    gp = str(tmp_path / "b.gpkg")
    save_vector(nofid(ds1), gp)
    ds2 = open_vector(gp)
    shp = str(tmp_path / "c.shp")
    save_vector(nofid(ds2), shp)
    rows = sorted(open_vector(shp).take_all(), key=lambda r: r["name"])
    assert len(rows) == 7
    got = {(r["name"], tuple(np.round(np.frombuffer(r["wkb"][5:21], "<f8"), 2)))
           for r in rows}
    want = {(f"f{i}", tuple(np.round(np.frombuffer(w[5:21], "<f8"), 2)))
            for i, w in enumerate(wkbs)}
    assert got == want
