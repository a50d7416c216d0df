"""ST_* spatial SQL functions (geometry/stfuncs.py wired into sql.py) —
the OGR SQLite-dialect surface (ogrsqlitesqlfunctions.cpp)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.geometry.wkb import (
    encode_linestring,
    encode_point,
    encode_polygon,
)
from gdal_ray.sql import execute_sql


def _sq(x0, y0, s):
    return encode_polygon([np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]])])


def _tbl():
    return rd.from_arrow(pa.table({
        "gid": pa.array([0, 1, 2], pa.int64()),
        "wkb": pa.array([_sq(0, 0, 10), _sq(2, 2, 2), _sq(20, 20, 5)],
                        pa.binary()),
    }))


def test_predicates_through_sql(ray_session):
    geoms = [_sq(0, 0, 10), _sq(2, 2, 2), _sq(20, 20, 5)]
    pairs = [(i, j) for i in range(3) for j in range(3) if i < j]
    tbl = rd.from_arrow(pa.table({
        "ga": pa.array([i for i, _ in pairs], pa.int64()),
        "gb": pa.array([j for _, j in pairs], pa.int64()),
        "wkb_a": pa.array([geoms[i] for i, _ in pairs], pa.binary()),
        "wkb_b": pa.array([geoms[j] for _, j in pairs], pa.binary()),
    }))
    out = execute_sql(
        "SELECT ga, gb, "
        "ST_INTERSECTS(wkb_a, wkb_b) AS inter, "
        "ST_CONTAINS(wkb_a, wkb_b) AS cont, "
        "ST_WITHIN(wkb_a, wkb_b) AS within, "
        "ST_DISTANCE(wkb_a, wkb_b) AS dist "
        "FROM pairs ORDER BY ga, gb",
        {"pairs": tbl}).to_pandas()
    rows = {(r.ga, r.gb): r for r in out.itertuples()}
    assert rows[(0, 1)].inter and rows[(0, 1)].cont \
        and not rows[(0, 1)].within
    assert not rows[(0, 2)].inter
    assert rows[(0, 2)].dist == pytest.approx(np.hypot(10, 10))
    assert rows[(1, 2)].dist == pytest.approx(np.hypot(16, 16))


def test_centroid_envelope_area(ray_session):
    out = execute_sql(
        "SELECT gid, ST_X(ST_CENTROID(wkb)) AS cx, "
        "ST_Y(ST_CENTROID(wkb)) AS cy, ST_AREA(wkb) AS a, "
        "ST_PERIMETER(wkb) AS p, ST_AREA(ST_ENVELOPE(wkb)) AS ea "
        "FROM g ORDER BY gid", {"g": _tbl()}).to_pandas()
    assert out.loc[0, "cx"] == pytest.approx(5.0)
    assert out.loc[0, "cy"] == pytest.approx(5.0)
    assert out.loc[0, "a"] == pytest.approx(100.0)
    assert out.loc[0, "p"] == pytest.approx(40.0)
    # envelope of an axis-aligned square is itself
    assert (out["ea"] == out["a"]).all()


def test_centroid_with_hole():
    from gdal_ray.geometry.stfuncs import _centroid
    from gdal_ray.geometry.wkb import decode_wkb

    # square with an off-center hole: centroid shifts away from the hole
    outer = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10]])
    hole = np.array([[6.0, 4], [8, 4], [8, 6], [6, 6]])
    _, xy = decode_wkb(_centroid(encode_polygon([outer, hole])))
    # moments: 100·(5,5) − 4·(7,5) over area 96
    assert xy[0] == pytest.approx((100 * 5 - 4 * 7) / 96)
    assert xy[1] == pytest.approx(5.0)


def test_geomfromtext_astext_roundtrip(ray_session):
    ds = rd.from_arrow(pa.table({
        "gid": pa.array([0], pa.int64()),
        "wkt": pa.array(["POLYGON ((0 0,4 0,4 4,0 4,0 0))"], pa.string()),
    }))
    out = execute_sql(
        "SELECT ST_AREA(ST_GEOMFROMTEXT(wkt)) AS a, "
        "ST_ASTEXT(ST_ENVELOPE(ST_GEOMFROMTEXT(wkt))) AS e FROM t",
        {"t": ds}).to_pandas()
    assert out.loc[0, "a"] == pytest.approx(16.0)
    assert out.loc[0, "e"].startswith("POLYGON")


def test_length_line_vs_perimeter():
    from gdal_ray.geometry.stfuncs import _length

    line = encode_linestring(np.array([[0.0, 0], [3, 4], [3, 8]]))
    assert _length(line) == pytest.approx(9.0)
    assert _length(_sq(0, 0, 2)) == pytest.approx(8.0)  # areal -> perimeter


def test_simplify_and_convexhull(ray_session):
    # a line with a collinear midpoint simplifies to 2 points
    ds = rd.from_arrow(pa.table({
        "gid": pa.array([0], pa.int64()),
        "wkb": pa.array([encode_linestring(
            np.array([[0.0, 0], [5, 0.001], [10, 0]]))], pa.binary()),
    }))
    out = execute_sql(
        "SELECT ST_NPOINTS(ST_SIMPLIFY(wkb, 0.1)) AS n FROM t",
        {"t": ds}).to_pandas()
    assert out.loc[0, "n"] == 2
    out2 = execute_sql(
        "SELECT ST_NPOINTS(ST_CONVEXHULL(wkb)) AS n FROM t",
        {"t": ds}).to_pandas()
    assert out2.loc[0, "n"] >= 3


def test_point_funcs():
    from gdal_ray.geometry.stfuncs import eval_st

    pts = pa.array([encode_point(3.5, -2.25)], pa.binary())
    assert eval_st("ST_X", [pts], None)[0].as_py() == 3.5
    assert eval_st("ST_Y", [pts], None)[0].as_py() == -2.25
    assert eval_st("ST_GEOMETRYTYPE", [pts], None)[0].as_py() == "POINT"


def test_unknown_st_raises():
    from gdal_ray.geometry.stfuncs import eval_st

    with pytest.raises(NotImplementedError):
        eval_st("ST_FRABJOUS", [pa.array([b""], pa.binary())], None)


def test_buffer(ray_session):
    # point buffer: area converges to pi*r^2 from below (inscribed
    # polygon); square buffer contains the original and grows area by
    # ~ perimeter*d + pi*d^2
    ds = rd.from_arrow(pa.table({
        "gid": pa.array([0], pa.int64()),
        "wkb": pa.array([encode_point(5.0, 5.0)], pa.binary()),
    }))
    out = execute_sql(
        "SELECT ST_AREA(ST_BUFFER(wkb, 2.0)) AS a, "
        "ST_NPOINTS(ST_BUFFER(wkb, 2.0)) AS n FROM t",
        {"t": ds}).to_pandas()
    assert 0.95 * np.pi * 4 < out.loc[0, "a"] <= np.pi * 4
    assert out.loc[0, "n"] >= 32
    ds2 = rd.from_arrow(pa.table({
        "gid": pa.array([0], pa.int64()),
        "wkb": pa.array([_sq(0, 0, 10)], pa.binary()),
    }))
    out2 = execute_sql(
        "SELECT ST_AREA(ST_BUFFER(wkb, 1.0)) AS a, "
        "ST_CONTAINS(ST_BUFFER(wkb, 1.0), wkb) AS c FROM t",
        {"t": ds2}).to_pandas()
    assert out2.loc[0, "c"]
    assert 100 + 40 + 0.9 * np.pi < out2.loc[0, "a"] <= 100 + 40 + np.pi
