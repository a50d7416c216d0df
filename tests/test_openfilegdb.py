"""OpenFileGDB (.gdb) reader vs the reference's own autotest
expectations: curves.gdb line/polygon lengths+areas against the
ArcGIS-computed SHAPE_Length/SHAPE_Area columns of curves_line.csv /
curves_polygon.csv (the same fixtures ogr_openfilegdb.py test 18 uses),
curve_circle_by_center.gdb against its CSV's circularstrings, and the
ArcGIS-Pro-3.2 scalar types against their documented extreme values."""

import csv

import numpy as np
import pytest

from gdal_ray.geometry.wkb import decode_wkb, polygon_parts
from gdal_ray.sources.openfilegdb import (GdbTable, gdb_catalog,
                                          gdb_layers, gdb_meta, read_gdb)

D = "/root/reference/autotest/ogr/data/filegdb"


def _iter_rows(gdb, layer):
    cat = gdb_catalog(f"{D}/{gdb}")
    t = GdbTable(f"{D}/{gdb}/a{cat[layer]:08x}")
    with open(t.base + ".gdbtable", "rb") as fh:
        for i in range(len(t.offsets)):
            r = t.row(fh, i)
            if r is not None:
                yield r


def _length(wkb):
    gt, p = decode_wkb(wkb)

    def ll(a):
        return float(np.hypot(*np.diff(a, axis=0).T).sum())

    return ll(p) if gt == 2 else sum(ll(pp[1]) for pp in p)


def test_catalog_and_meta():
    cat = gdb_catalog(f"{D}/curves.gdb")
    assert cat["GDB_SystemCatalog"] == 1
    assert set(gdb_layers(f"{D}/curves.gdb")) == {"line", "polygon"}
    m = gdb_meta(f"{D}/curves.gdb")
    assert m["driver"] == "OpenFileGDB"
    byname = {x["name"]: x for x in m["layers"]}
    assert byname["line"]["n_rows"] == 9
    assert byname["polygon"]["n_rows"] == 5


def test_curves_line_lengths_match_arcgis():
    exp = list(csv.DictReader(open(f"{D}/curves_line.csv")))
    rows = list(_iter_rows("curves.gdb", "line"))
    assert len(rows) == len(exp) == 9
    for r, e in zip(rows, exp):
        want = float(e["SHAPE_Length"])
        got = _length(r["wkb"])
        # 4-degree arc linearization vs ArcGIS's exact curve length
        assert abs(got - want) / want < 5e-3, (r["fid"], got, want)
        # the stored attribute decodes exactly
        assert abs(r["SHAPE_Length"] - want) < 1e-9


def test_curves_polygon_areas_match_arcgis():
    exp = list(csv.DictReader(open(f"{D}/curves_polygon.csv")))
    rows = list(_iter_rows("curves.gdb", "polygon"))
    assert len(rows) == len(exp) == 5

    def ring_area(rr):
        x, y = rr[:, 0], rr[:, 1]
        return 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    for r, e in zip(rows, exp):
        parts = polygon_parts(r["wkb"])
        area = sum(abs(sum(ring_area(rr) for rr in p)) for p in parts)
        per = sum(float(np.hypot(*np.diff(rr, axis=0).T).sum())
                  for p in parts for rr in p)
        wantA = float(e["SHAPE_Area"])
        wantL = float(e["SHAPE_Length"])
        assert abs(area - wantA) / wantA < 5e-3, (r["fid"], area, wantA)
        assert abs(per - wantL) / wantL < 5e-3, (r["fid"], per, wantL)


def test_circle_by_center_arcs():
    """Arc-by-center descriptors must reproduce the reference's
    radius-from-end-point + mid-angle recipe (the CSV's 3-point
    circularstrings are the ground truth, incl. the non-circular row 6)."""
    from gdal_ray.geometry.wkb import _arc_points

    exp = list(csv.DictReader(open(f"{D}/curve_circle_by_center.csv")))
    want = []
    for e in exp:
        # parse "CIRCULARSTRING (x y,x y,x y)" out of the MULTICURVE WKT
        inner = e["WKT"].split("CIRCULARSTRING (")[1].split(")")[0]
        pts = np.array([[float(v) for v in pair.split()]
                        for pair in inner.split(",")])
        lin = _arc_points(pts[0], pts[1], pts[2], 1.0)
        want.append(float(np.hypot(*np.diff(lin, axis=0).T).sum()))
    name = gdb_layers(f"{D}/curve_circle_by_center.gdb")[0]
    rows = list(_iter_rows("curve_circle_by_center.gdb", name))
    assert len(rows) == len(want) == 6
    for r, w in zip(rows, want):
        got = _length(r["wkb"])
        assert abs(got - w) / w < 2e-3, (r["fid"], got, w)


def test_arcgis_pro_32_types_scalars():
    rows = list(_iter_rows("arcgis_pro_32_types.gdb", "big_int"))
    assert rows[0]["short"] == 32767
    assert rows[0]["long"] == 2147483647
    assert rows[0]["big"] == 9007199254740991  # int64 column
    assert rows[1]["big"] == -9007199254740991
    assert rows[0]["double"] == pytest.approx(1.7976931348623157e308)
    dt = list(_iter_rows("arcgis_pro_32_types.gdb", "date_types"))
    assert dt[0]["date_only"] == 45259.0  # days since 1899-12-30
    assert dt[0]["time_only"] == pytest.approx(0.5515625)


def test_read_gdb_ray_door_and_registry(ray_session):
    rows = read_gdb(f"{D}/curves.gdb", "line").take_all()
    assert len(rows) == 9
    assert {"fid", "wkb", "SHAPE_Length"} <= set(rows[0])
    # open_vector dispatches .gdb directories
    from gdal_ray.sources import open_vector

    rows2 = open_vector(f"{D}/curves.gdb", layer="polygon").take_all()
    assert len(rows2) == 5
    # describe() routes the directory
    from gdal_ray.info import describe

    m = describe(f"{D}/curves.gdb")
    assert m["driver"] == "OpenFileGDB" and len(m["layers"]) == 2


def test_master_fixture_geometries_and_attributes(tmp_path):
    """The reference's main testopenfilegdb.gdb (unzipped to scratch):
    every simple-feature layer's first feature must decode to the
    documented geometry (ogr_openfilegdb.py datalist) and the attribute
    set (id=1, str='foo_é', smallint=-13, int=123, float=1.5,
    real=4.56, binary=00FF7F)."""
    import zipfile

    from gdal_ray.geometry.wkb import GeomType

    zipfile.ZipFile(f"{D}/testopenfilegdb.gdb.zip").extractall(
        str(tmp_path))
    G = str(tmp_path / "testopenfilegdb.gdb")
    cat = gdb_catalog(G)

    def first(layer):
        t = GdbTable(f"{G}/a{cat[layer]:08x}")
        with open(t.base + ".gdbtable", "rb") as fh:
            for i in range(len(t.offsets)):
                r = t.row(fh, i)
                if r is not None:
                    return r
        return None

    r = first("point")
    gt, p = decode_wkb(r["wkb"])
    assert gt == GeomType.POINT
    assert np.allclose(p, [1.0, 2.0])
    assert r["id"] == 1 and r["str"] == "foo_é"
    assert r["smallint"] == -13 and r["int"] == 123
    assert r["float"] == pytest.approx(1.5)
    assert r["real"] == pytest.approx(4.56)
    assert r["binary"] == b"\x00\xff\x7f"

    gt, p = decode_wkb(first("multipoint")["wkb"])
    assert gt == GeomType.MULTIPOINT and len(p) == 2

    gt, p = decode_wkb(first("linestring")["wkb"])
    assert gt == GeomType.LINESTRING
    assert np.allclose(p, [[1, 2], [3, 4]])

    gt, p = decode_wkb(first("multilinestring_multipart")["wkb"])
    assert gt == GeomType.MULTILINESTRING and len(p) == 2
    assert np.allclose(p[1][1], [[5, 6], [7, 8]])

    gt, p = decode_wkb(first("polygon")["wkb"])
    assert gt == GeomType.POLYGON and len(p) == 1
    x, y = p[0][:, 0], p[0][:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert area == pytest.approx(1.0, abs=1e-9)

    # MULTIPOLYGON (((ring,hole)),((ring2))) regroups into 2 parts
    gt, p = decode_wkb(first("multipolygon")["wkb"])
    assert gt == GeomType.MULTIPOLYGON and len(p) == 2
    assert len(p[0][1]) == 2  # outer + hole

    # Z layer decodes (Z dropped into the 2D engine model)
    gt, p = decode_wkb(first("linestring25D")["wkb"])
    assert gt == GeomType.LINESTRING
    assert np.allclose(p, [[1, 2], [3, 4]])

    # null geometry rows surface as wkb=None
    assert first("null_polygon")["wkb"] is None
    # big_layer: many rows with interleaved deletions; every valid row
    # must decode and the count must match the header
    t = GdbTable(f"{G}/a{cat['big_layer']:08x}")
    n = 0
    with open(t.base + ".gdbtable", "rb") as fh:
        for i in range(len(t.offsets)):
            if t.row(fh, i) is not None:
                n += 1
    assert n == t.n_valid >= 300


def test_write_gdb_roundtrip(tmp_path, ray_session):
    """Minimal writer: all geometry classes + nulls + int64/float/string
    attributes round-trip through read_gdb; snap-grid coordinates are
    bit-exact for values representable on the 1e-9 grid."""
    from gdal_ray.geometry.wkb import (GeomType, encode_linestring,
                                       encode_multipolygon, encode_point)
    from gdal_ray.sources.openfilegdb import write_gdb

    import pyarrow as pa

    mp = encode_multipolygon(
        [[np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float),
          np.array([[0.5, 0.5], [0.5, 1.5], [1.5, 1.5], [1.5, 0.5],
                    [0.5, 0.5]], float)],
         [np.array([[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]], float)]])
    tbl = pa.table({
        "wkb": pa.array([encode_point(1.25, -2.5),
                         encode_linestring(np.array([[0, 0], [3, 4]],
                                                    float)),
                         mp, None], pa.binary()),
        "name": pa.array(["a", "b", "c", None]),
        "big": pa.array([10 ** 15, -7, 0, 5], pa.int64()),
        "score": pa.array([1.5, None, 2.25, 0.0], pa.float64()),
    })
    g = str(tmp_path / "rt.gdb")
    write_gdb(tbl, g, layer="features")
    rows = read_gdb(g, "features").take_all()
    assert [r["fid"] for r in rows] == [1, 2, 3, 4]
    gt, p = decode_wkb(rows[0]["wkb"])
    assert gt == GeomType.POINT and p.tolist() == [1.25, -2.5]
    gt, p = decode_wkb(rows[1]["wkb"])
    assert gt == GeomType.LINESTRING and p.tolist() == [[0, 0], [3, 4]]
    gt, p = decode_wkb(rows[2]["wkb"])
    assert gt == GeomType.MULTIPOLYGON and len(p) == 2
    assert len(p[0][1]) == 2
    assert rows[3]["wkb"] is None
    assert [r["big"] for r in rows] == [10 ** 15, -7, 0, 5]
    assert rows[1]["score"] is None and rows[3]["name"] is None


def test_gdbtable_v4_objectid64():
    """v4 (64-bit ObjectID) tables: int64 row counts in the .gdbtable
    header and the .gdbtablx trailer; geometry perimeters/areas must
    match the stored Shape_Length/Shape_Area attributes."""
    D4 = f"{D}/objectid64/3features.gdb"
    name = gdb_layers(D4)[0]
    rows = list(_iter_rows_at(D4, name))
    assert len(rows) == 3
    for r in rows:
        parts = polygon_parts(r["wkb"])
        per = sum(float(np.hypot(*np.diff(rr, axis=0).T).sum())
                  for p in parts for rr in p)
        area = sum(abs(0.5 * (np.dot(rr[:, 0], np.roll(rr[:, 1], -1))
                              - np.dot(rr[:, 1], np.roll(rr[:, 0], -1))))
                   for p in parts for rr in p)
        assert abs(per - r["Shape_Length"]) / r["Shape_Length"] < 1e-9
        assert abs(area - r["Shape_Area"]) / r["Shape_Area"] < 1e-8


def _iter_rows_at(gdb_path, layer):
    cat = gdb_catalog(gdb_path)
    t = GdbTable(f"{gdb_path}/a{cat[layer]:08x}")
    with open(t.base + ".gdbtable", "rb") as fh:
        for i in range(len(t.offsets)):
            r = t.row(fh, i)
            if r is not None:
                yield r
