"""Shapefile driver conformance (sources/shapefile.py vs the ESRI spec).

Reference: ogr/ogrsf_frmts/shape/shape2ogr.cpp (record<->OGR geometry),
ogrshapelayer.cpp (FID, DBF attribute mapping) — reimplemented from the
public Shapefile Technical Description / dBASE layout."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geometry.wkb import decode_wkb, GeomType
from gdal_ray.sources.geojson import geometry_to_wkb, wkb_to_geometry
from gdal_ray.sources.shapefile import (
    decode_shp_records,
    read_dbf_bytes,
    read_shapefile,
    read_shx_offsets,
    write_dbf_bytes,
    write_shapefile,
    write_shp_bytes,
)


GEOMS = [
    {"type": "Point", "coordinates": [2.5, -1.25]},
    {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0.5]]},
    {"type": "Polygon", "coordinates": [
        [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
        [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]],
    ]},
    {"type": "MultiPoint", "coordinates": [[0, 1], [2, 3]]},
    {"type": "MultiLineString", "coordinates": [[[0, 0], [1, 0]], [[5, 5], [6, 6]]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
        [[[10, 10], [12, 10], [12, 12], [10, 12], [10, 10]],
         [[10.5, 10.5], [10.5, 11], [11, 11], [11, 10.5], [10.5, 10.5]]],
    ]},
]


def _norm(geom):
    """Ring orientation + closure are writer's choice — normalize to sets
    of vertex sets per ring for comparison."""
    def ring_key(r):
        pts = [tuple(p) for p in r]
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        return frozenset(pts)

    t = geom["type"]
    c = geom["coordinates"]
    if t == "Polygon":
        return t, frozenset(ring_key(r) for r in c)
    if t == "MultiPolygon":
        return t, frozenset(frozenset(ring_key(r) for r in p) for p in c)
    if t == "MultiPoint":
        return t, frozenset(tuple(p) for p in c)
    return t, tuple(tuple(map(tuple, l)) for l in c) if t == "MultiLineString" else tuple(map(tuple, c)) if t != "Point" else tuple(c)


@pytest.mark.parametrize("geom", GEOMS, ids=[g["type"] for g in GEOMS])
def test_geometry_roundtrip(geom):
    wkb = geometry_to_wkb(geom)
    shp, shx = write_shp_bytes([wkb])
    offs = read_shx_offsets(shx)
    out = decode_shp_records(shp, offs)[0]
    g2 = wkb_to_geometry(out)
    # Polygon with one outer ring may come back as Polygon either way;
    # MultiPolygon survives as MultiPolygon via ring regrouping
    assert _norm(g2) == _norm(geom)


def test_null_shape():
    shp, shx = write_shp_bytes([None, geometry_to_wkb(GEOMS[0])])
    out = decode_shp_records(shp, read_shx_offsets(shx))
    assert out[0] is None and out[1] is not None


def test_shp_header_fields():
    wkb = geometry_to_wkb({"type": "Point", "coordinates": [7.0, 8.0]})
    shp, shx = write_shp_bytes([wkb])
    assert struct.unpack(">i", shp[:4])[0] == 9994
    assert struct.unpack("<i", shp[28:32])[0] == 1000
    assert struct.unpack("<i", shp[32:36])[0] == 1  # point type
    bbox = struct.unpack("<4d", shp[36:68])
    assert bbox == (7.0, 8.0, 7.0, 8.0)
    # declared file length (16-bit words) matches actual size
    assert struct.unpack(">i", shp[24:28])[0] * 2 == len(shp)
    assert struct.unpack(">i", shx[24:28])[0] * 2 == len(shx)


def test_dbf_roundtrip():
    t = pa.table({
        "name": pa.array(["alpha", "b", None], pa.string()),
        "count": pa.array([12, -3, None], pa.int64()),
        "score": pa.array([1.5, None, -0.25], pa.float64()),
        "flag": pa.array([True, False, None], pa.bool_()),
    })
    out = read_dbf_bytes(write_dbf_bytes(t))
    assert out.column("name").to_pylist() == ["alpha", "b", ""]
    assert out.column("count").to_pylist() == [12, -3, None]
    assert out.column("score").to_pylist() == pytest.approx([1.5, None, -0.25])
    assert out.column("flag").to_pylist() == [True, False, None]


def test_dbf_spec_layout():
    t = pa.table({"a": pa.array([1], pa.int64())})
    b = write_dbf_bytes(t)
    assert b[0] == 0x03                      # dBASE III, no memo
    assert struct.unpack("<I", b[4:8])[0] == 1
    hdr = struct.unpack("<H", b[8:10])[0]
    assert b[hdr - 1 - 32 * 1 + 32] == 0x0D  # terminator after 1 descriptor
    assert b[-1] == 0x1A                     # EOF marker


def test_read_shapefile_dataset(tmp_path):
    wkbs = [geometry_to_wkb(g) for g in GEOMS[:3]] * 5
    t = pa.table({
        "wkb": pa.array(wkbs, pa.binary()),
        "label": pa.array([f"row{i}" for i in range(15)], pa.string()),
        "v": pa.array(list(range(15)), pa.int64()),
    })
    base = str(tmp_path / "layer")
    write_shapefile(t, base)
    ds = read_shapefile(base, records_per_block=4)  # forces 4 ranges
    out = ds.to_pandas().sort_values("fid").reset_index(drop=True)
    assert list(out["fid"]) == list(range(15))
    assert list(out["label"]) == [f"row{i}" for i in range(15)]
    assert list(out["v"]) == list(range(15))
    for i in range(15):
        assert _norm(wkb_to_geometry(out["wkb"][i])) == _norm(GEOMS[i % 3])


def test_hand_built_spec_point_file():
    """Decode a .shp built byte-by-byte from the spec (independent of our
    writer): one Point record."""
    content = struct.pack("<i2d", 1, 3.0, 4.0)
    rec = struct.pack(">2i", 1, len(content) // 2) + content
    hdr = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, (100 + len(rec)) // 2)
    hdr += struct.pack("<2i8d", 1000, 1, 3, 4, 3, 4, 0, 0, 0, 0)
    offs = np.array([[100, len(content)]], dtype=np.int64)
    out = decode_shp_records(hdr + rec, offs)
    g = wkb_to_geometry(out[0])
    assert g == {"type": "Point", "coordinates": [3.0, 4.0]}


def test_polygon_z_reads_as_2d():
    """A PolygonZ (type 15) record decodes with Z dropped."""
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=np.float64)
    n = len(ring)
    content = struct.pack("<i", 15)
    content += struct.pack("<4d", 0, 0, 2, 2) + struct.pack("<2i", 1, n)
    content += struct.pack("<i", 0) + ring.astype("<f8").tobytes()
    # Z range + Z values + M range + M values follow; decoder ignores them
    content += struct.pack("<2d", 0, 0) + b"\0" * 8 * n
    out = decode_shp_records(
        b"\0" * 0 + struct.pack(">2i", 1, len(content) // 2) + content,
        np.array([[0, len(content)]], dtype=np.int64))
    g = wkb_to_geometry(out[0])
    assert g["type"] == "Polygon"
    assert _norm(g) == _norm({"type": "Polygon", "coordinates": [ring.tolist()]})
