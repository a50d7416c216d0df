"""GeoPackage driver conformance (sources/gpkg.py vs OGC GeoPackage 1.3).

Reference: ogr/ogrsf_frmts/gpkg (ogrgeopackagedatasource.cpp metadata
tables, ogrgeopackagetablelayer.cpp GeoPackageBinary) — reimplemented
from the public OGC spec over stdlib sqlite3."""

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources.geojson import geometry_to_wkb
from gdal_ray.sources.gpkg import (
    decode_gpkg_blob,
    encode_gpkg_blob,
    list_layers,
    read_gpkg,
    write_gpkg,
    write_gpkg_parts,
)

GEOMS = [
    {"type": "Point", "coordinates": [2.5, -1.25]},
    {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0.5]]},
    {"type": "Polygon", "coordinates": [
        [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
        [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]],
    ]},
    {"type": "MultiPoint", "coordinates": [[0, 1], [2, 3]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[10, 10], [12, 10], [12, 12], [10, 12], [10, 10]]],
    ]},
]


def _table(n=5):
    wkbs = [geometry_to_wkb(g) for g in GEOMS[:n]]
    return pa.table({
        "fid": pa.array(range(1, n + 1), pa.int64()),
        "wkb": pa.array(wkbs, pa.binary()),
        "name": pa.array([f"feat-{i}" for i in range(n)], pa.string()),
        "score": pa.array([0.5 * i for i in range(n)], pa.float64()),
        "rank": pa.array(list(range(n)), pa.int64()),
        "flag": pa.array([i % 2 == 0 for i in range(n)], pa.bool_()),
    })


def test_blob_roundtrip_le():
    wkb = geometry_to_wkb(GEOMS[2])
    blob = encode_gpkg_blob(wkb, srs_id=4326)
    assert blob[:2] == b"GP" and blob[2] == 0
    srs, out = decode_gpkg_blob(blob)
    assert srs == 4326 and out == wkb
    # envelope indicator 1 => 4 doubles: minx, maxx, miny, maxy
    env = struct.unpack("<4d", blob[8:40])
    assert env == (0.0, 4.0, 0.0, 4.0)


def test_blob_big_endian_header_and_indicators():
    wkb = geometry_to_wkb(GEOMS[0])
    # hand-build a BE-header blob with a full xyzm envelope (indicator 4)
    flags = (4 << 1)  # BE (bit0=0), indicator 4
    blob = (b"GP\x00" + bytes([flags]) + struct.pack(">i", 3857)
            + struct.pack(">8d", *range(8)) + wkb)
    srs, out = decode_gpkg_blob(blob)
    assert srs == 3857 and out == wkb
    # indicator 0: no envelope
    blob0 = b"GP\x00\x01" + struct.pack("<i", 0) + wkb
    assert decode_gpkg_blob(blob0) == (0, wkb)


def test_blob_empty_and_errors():
    assert decode_gpkg_blob(None) == (0, None)
    empty = b"GP\x00" + bytes([0x01 | 0x10]) + struct.pack("<i", 4326)
    assert decode_gpkg_blob(empty)[1] is None
    with pytest.raises(ValueError):
        decode_gpkg_blob(b"XX\x00\x01aaaa")


def test_write_creates_spec_tables(tmp_path):
    path = str(tmp_path / "t.gpkg")
    write_gpkg(_table(), path, layer="roads")
    con = sqlite3.connect(path)
    try:
        assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        assert {"gpkg_spatial_ref_sys", "gpkg_contents",
                "gpkg_geometry_columns", "roads"} <= names
        row = con.execute(
            "SELECT data_type, min_x, min_y, max_x, max_y, srs_id"
            " FROM gpkg_contents WHERE table_name='roads'").fetchone()
        assert row[0] == "features" and row[5] == 4326
        assert (row[1], row[2], row[3], row[4]) == (0.0, -1.25, 12.0, 12.0)
        assert con.execute(
            "SELECT feature_count FROM gpkg_ogr_contents"
            " WHERE table_name='roads'").fetchone()[0] == 5
        gt = con.execute(
            "SELECT geometry_type_name FROM gpkg_geometry_columns"
            " WHERE table_name='roads'").fetchone()[0]
        assert gt == "GEOMETRY"  # mixed types
    finally:
        con.close()


def test_roundtrip_parallel_read(ray_session, tmp_path):
    path = str(tmp_path / "rt.gpkg")
    t = _table()
    write_gpkg(t, path, layer="layer1")
    # rows_per_block=2 => 3 parallel range tasks
    got = (read_gpkg(path, "layer1", rows_per_block=2)
           .to_pandas().sort_values("fid").reset_index(drop=True))
    assert list(got["fid"]) == [1, 2, 3, 4, 5]
    assert [bytes(b) for b in got["wkb"]] == [v.as_py() for v in t.column("wkb")]
    assert list(got["name"]) == [f"feat-{i}" for i in range(5)]
    assert np.allclose(got["score"], [0.0, 0.5, 1.0, 1.5, 2.0])
    assert list(got["rank"]) == [0, 1, 2, 3, 4]
    assert list(got["flag"]) == [True, False, True, False, True]
    assert got["flag"].dtype == bool or got["flag"].dtype == object

    meta = list_layers(path)
    assert meta == [{"name": "layer1", "geometry_col": "wkb",
                     "geometry_type": "GEOMETRY", "srs_id": 4326,
                     "feature_count": 5}]


def test_single_type_layer_name(tmp_path):
    path = str(tmp_path / "pts.gpkg")
    wkbs = [geometry_to_wkb({"type": "Point", "coordinates": [i, i]})
            for i in range(3)]
    t = pa.table({"wkb": pa.array(wkbs, pa.binary())})
    write_gpkg(t, path, layer="pts")
    assert list_layers(path)[0]["geometry_type"] == "POINT"


def test_write_parts(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "parts")
    ds = rd.from_arrow(_table()).repartition(2)
    n = write_gpkg_parts(ds, out, layer="part")
    assert n == 2
    import os
    files = [f for f in os.listdir(out) if f.endswith(".gpkg")]
    assert len(files) == 2
    total = sum(list_layers(f"{out}/{f}")[0]["feature_count"] for f in files)
    assert total == 5


def test_gpkg_curve_geometries_roundtrip(tmp_path):
    """Round-5 curve read path (VERDICT r4 #9): CircularString /
    CompoundCurve / CurvePolygon WKBs stored in a GPKG open and
    linearize into the linear machinery (ogrgeometryfactory.cpp
    curveToLineString semantics, 4-degree max step); measures match the
    analytic circle values within the linearization tolerance."""
    import math

    import numpy as np

    from gdal_ray.geometry.wkb import (decode_wkb, encode_circularstring,
                                       encode_compoundcurve,
                                       encode_curvepolygon,
                                       encode_linestring, polygon_rings)

    circle = encode_circularstring(np.array([[0.0, 0.0], [1.0, 0.0],
                                             [0.0, 0.0]]))
    curve_poly = encode_curvepolygon([circle])
    semi = encode_circularstring(np.array([[0.0, 0.0], [1.0, 1.0],
                                           [2.0, 0.0]]))
    comp = encode_compoundcurve([semi,
                                 encode_linestring(np.array([[2.0, 0.0],
                                                             [0.0, 0.0]]))])
    tbl = pa.table({
        "fid": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["circle", "arc", "compound"]),
        "wkb": pa.array([curve_poly, circle, comp], pa.binary()),
    })
    path = str(tmp_path / "curves.gpkg")
    write_gpkg(tbl, path, layer="curves")

    rows = {r["name"]: r for r in read_gpkg(path).take_all()}
    assert len(rows) == 3
    # CurvePolygon -> polygon rings; area(circle d=1) ~ pi/4
    ring = polygon_rings(rows["circle"]["wkb"])[0]
    x, y = ring[:, 0], ring[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert abs(area - math.pi / 4.0) < 1e-3
    # CircularString -> LineString; perimeter ~ pi
    t, pts = decode_wkb(rows["arc"]["wkb"])
    length = float(np.hypot(*np.diff(pts, axis=0).T).sum())
    assert abs(length - math.pi) < 1e-3
    # CompoundCurve -> closed LineString; length ~ pi + 2
    t2, pts2 = decode_wkb(rows["compound"]["wkb"])
    assert tuple(pts2[0]) == tuple(pts2[-1])
    length2 = float(np.hypot(*np.diff(pts2, axis=0).T).sum())
    assert abs(length2 - (math.pi + 2.0)) < 1e-3
