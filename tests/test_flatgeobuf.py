"""FlatGeobuf driver conformance (sources/flatgeobuf.py vs the public
FlatGeobuf v3 spec).  Reference: ogr/ogrsf_frmts/flatgeobuf
(packedrtree.h packed Hilbert R-tree, ogrflatgeobuflayer.cpp)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geometry.wkb import decode_wkb
from gdal_ray.sources.flatgeobuf import (
    MAGIC,
    NODE_BYTES,
    read_flatgeobuf,
    read_header,
    write_flatgeobuf,
)
from gdal_ray.sources.geojson import geometry_to_wkb, wkb_to_geometry

GEOMS = [
    {"type": "Point", "coordinates": [2.5, -1.25]},
    {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0.5]]},
    {"type": "Polygon", "coordinates": [
        [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
        [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]],
    ]},
    {"type": "MultiPoint", "coordinates": [[0, 1], [2, 3]]},
    {"type": "MultiLineString",
     "coordinates": [[[0, 0], [1, 0]], [[5, 5], [6, 6]]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
        [[[10, 10], [14, 10], [14, 14], [10, 14], [10, 10]],
         [[11, 11], [11, 12], [12, 12], [12, 11], [11, 11]]],
    ]},
]


def _norm(geom):
    t = geom["type"]
    c = geom["coordinates"]

    def ring_key(r):
        pts = [tuple(p) for p in r]
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        return frozenset(pts)

    if t == "Polygon":
        return t, frozenset(ring_key(r) for r in c)
    if t == "MultiPolygon":
        return t, frozenset(frozenset(ring_key(r) for r in p) for p in c)
    if t == "MultiPoint":
        return t, frozenset(tuple(p) for p in c)
    if t == "MultiLineString":
        return t, tuple(tuple(map(tuple, l)) for l in c)
    if t == "Point":
        return t, tuple(c)
    return t, tuple(map(tuple, c))


def _table():
    wkbs = [geometry_to_wkb(g) for g in GEOMS]
    n = len(wkbs)
    return pa.table({
        "wkb": pa.array(wkbs, pa.binary()),
        "name": pa.array([f"f{i}" for i in range(n)], pa.string()),
        "score": pa.array([0.25 * i for i in range(n)], pa.float64()),
        "rank": pa.array(list(range(n)), pa.int64()),
        "ok": pa.array([i % 2 == 0 for i in range(n)], pa.bool_()),
        "blob": pa.array([bytes([i, i + 1]) for i in range(n)], pa.binary()),
    })


def test_header_and_magic(tmp_path):
    p = str(tmp_path / "t.fgb")
    write_flatgeobuf(_table(), p, name="mylayer")
    raw = open(p, "rb").read(8)
    assert raw == MAGIC
    h = read_header(p)
    assert h["name"] == "mylayer"
    assert h["features_count"] == len(GEOMS)
    assert h["geometry_type"] == 0  # mixed -> Unknown
    assert [c["name"] for c in h["columns"]] == \
        ["name", "score", "rank", "ok", "blob"]
    assert h["index_node_size"] == 16
    # envelope covers all features
    assert h["envelope"][0] == 0.0 and h["envelope"][2] == 14.0


def test_roundtrip_geometries_and_attrs(ray_session, tmp_path):
    p = str(tmp_path / "rt.fgb")
    t = _table()
    write_flatgeobuf(t, p)
    got = (read_flatgeobuf(p).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    assert len(got) == len(GEOMS)
    for i in range(len(GEOMS)):
        g = wkb_to_geometry(bytes(got["wkb"][i]))
        assert _norm(g) == _norm(GEOMS[i]), GEOMS[i]["type"]
    assert list(got["name"]) == [f"f{i}" for i in range(len(GEOMS))]
    assert np.allclose(got["score"], [0.25 * i for i in range(len(GEOMS))])
    assert list(got["ok"]) == [i % 2 == 0 for i in range(len(GEOMS))]
    assert [bytes(b) for b in got["blob"]] == \
        [bytes([i, i + 1]) for i in range(len(GEOMS))]


def test_hilbert_sorted_and_parallel_read(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n = 300
    xs = rng.uniform(0, 100, n)
    ys = rng.uniform(0, 100, n)
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(
            {"type": "Point", "coordinates": [float(xs[i]), float(ys[i])]})
            for i in range(n)], pa.binary()),
        "i": pa.array(list(range(n)), pa.int64()),
    })
    p = str(tmp_path / "pts.fgb")
    write_flatgeobuf(t, p)
    got = read_flatgeobuf(p, features_per_block=64).to_pandas()
    assert len(got) == n
    assert set(got["i"]) == set(range(n))
    # spatial ordering: file order is NOT the insert order (hilbert sort)
    assert list(got.sort_values("fid")["i"]) != list(range(n))
    # every point survives bit-exactly
    back = {int(r.i): np.asarray(decode_wkb(bytes(r.wkb))[1]).ravel()
            for r in got.itertuples()}
    for i in range(n):
        assert back[i][0] == xs[i] and back[i][1] == ys[i]


def test_index_leaf_count_matches_levels(tmp_path):
    n = 40  # two index levels: 40 leaves + 3 parents + 1 root
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(
            {"type": "Point", "coordinates": [float(i), 0.0]})
            for i in range(n)], pa.binary()),
    })
    p = str(tmp_path / "ix.fgb")
    write_flatgeobuf(t, p)
    h = read_header(p)
    assert h["index_bytes"] == (40 + 3 + 1) * NODE_BYTES
    assert h["leaf_node_start"] == 4 * NODE_BYTES


def test_null_geometry_row(ray_session, tmp_path):
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(GEOMS[0]), None], pa.binary()),
        "k": pa.array([1, 2], pa.int64()),
    })
    p = str(tmp_path / "n.fgb")
    write_flatgeobuf(t, p)
    got = read_flatgeobuf(p).to_pandas().sort_values("k")
    assert got["wkb"].iloc[1] is None or got["wkb"].iloc[1] != got["wkb"].iloc[0]
    assert set(got["k"]) == {1, 2}


def test_bad_magic(tmp_path):
    p = str(tmp_path / "bad.fgb")
    open(p, "wb").write(b"notfgb__" + b"\x00" * 10)
    with pytest.raises(ValueError):
        read_header(p)


def test_bbox_pushdown_matches_full_scan(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa

    from gdal_ray.sources.flatgeobuf import (
        read_flatgeobuf, read_header, search_index, write_flatgeobuf)
    from gdal_ray.sources.geojson import geometry_to_wkb, wkb_to_geometry

    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 100, (500, 2))
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(
            {"type": "Point", "coordinates": [float(x), float(y)]})
            for x, y in pts], pa.binary()),
        "tag": pa.array([f"f{i}" for i in range(500)], pa.string()),
    })
    p = str(tmp_path / "pts.fgb")
    write_flatgeobuf(t, p)

    bbox = (20.0, 30.0, 45.0, 60.0)
    got = read_flatgeobuf(p, bbox=bbox).to_pandas()
    full = read_flatgeobuf(p).to_pandas()

    def inside(w):
        x, y = wkb_to_geometry(w)["coordinates"]
        return bbox[0] <= x <= bbox[2] and bbox[1] <= y <= bbox[3]

    exp = full[full["wkb"].map(inside)]
    assert len(got) == len(exp) > 10
    assert set(got["tag"]) == set(exp["tag"])
    assert set(got["fid"]) == set(exp["fid"])

    # the index search touches only O(hits) leaves, exact envelopes
    h = read_header(p)
    fids, offs = search_index(p, h, bbox)
    assert len(fids) == len(exp)
    # empty-result bbox
    assert len(read_flatgeobuf(p, bbox=(200, 200, 300, 300)).to_pandas()) == 0


def test_bbox_pushdown_small_blocks(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa

    from gdal_ray.sources.flatgeobuf import read_flatgeobuf, write_flatgeobuf
    from gdal_ray.sources.geojson import geometry_to_wkb

    # grid of points; tiny features_per_block exercises run splitting
    xs, ys = np.meshgrid(np.arange(20.0), np.arange(20.0))
    t = pa.table({"wkb": pa.array([geometry_to_wkb(
        {"type": "Point", "coordinates": [float(x), float(y)]})
        for x, y in zip(xs.ravel(), ys.ravel())], pa.binary())})
    p = str(tmp_path / "grid.fgb")
    write_flatgeobuf(t, p)
    got = read_flatgeobuf(p, bbox=(5.0, 5.0, 9.0, 9.0),
                          features_per_block=7).to_pandas()
    assert len(got) == 25  # 5x5 inclusive grid window
