"""OSM PBF driver (sources/osmpbf.py): packed-varint kernel, DenseNodes
delta/zigzag/granularity wire math, way/relation round trips, distributed
read, way-geometry assembly join."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources import osmpbf as O


def test_packed_varint_roundtrip():
    rng = np.random.default_rng(7)
    v = rng.integers(0, 2**63, 10000, dtype=np.int64).astype(np.uint64)
    v[:6] = [0, 1, 127, 128, 16384, 2**56]
    assert (O.decode_packed_u64(O.encode_packed_u64(v)) == v).all()
    assert O.encode_packed_u64(np.zeros(0, np.uint64)) == b""
    assert len(O.decode_packed_u64(b"")) == 0


def test_packed_varint_wire_bytes():
    # protobuf worked examples: 1 -> 0x01, 300 -> 0xAC 0x02
    assert O.encode_packed_u64(np.array([1], np.uint64)) == b"\x01"
    assert O.encode_packed_u64(np.array([300], np.uint64)) == b"\xac\x02"


def test_sint_delta_roundtrip():
    rng = np.random.default_rng(3)
    ids = np.sort(rng.integers(-10**14, 10**14, 5000))
    assert (O._unpack_sint_delta(O._packed_sint_delta(ids)) == ids).all()
    # zigzag worked examples from the protobuf spec
    assert (O._zz(np.array([0, -1, 1, -2], np.int64))
            == np.array([0, 1, 2, 3], np.uint64)).all()


def _write_fixture(path, n=5000, block_rows=1500):
    node_ids = np.arange(1, n + 1, dtype=np.int64)
    lat = ((node_ids * 700) % 1_000_000) * 100 - 45_000_000_000
    lon = ((node_ids * 1300) % 2_000_000) * 100 - 90_000_000_000
    tags = [{"amenity": ["cafe", "pub", "bank"][i % 3]} if i % 5 == 0
            else {} for i in range(n)]
    ways = [(10_000 + i, list(range(1 + i, 5 + i)),
             {"highway": "residential"}) for i in range(40)]
    rels = [(77, [10_000, 10_001, 5], [1, 1, 0],
             ["outer", "inner", ""], {"type": "multipolygon"})]
    O.write_osm_pbf(path, node_ids=node_ids, lat_nano=lat, lon_nano=lon,
                    node_tags=tags, ways=ways, relations=rels,
                    block_rows=block_rows,
                    bbox_nano=(-90_000_000_000, 110_000_000_000,
                               55_000_000_000, -45_000_000_000))
    return node_ids, lat, lon


def test_file_roundtrip_single_process(tmp_path):
    path = str(tmp_path / "t.osm.pbf")
    node_ids, lat, lon = _write_fixture(path)
    blobs = O.scan_blobs(path)
    assert blobs[0]["type"] == "OSMHeader"
    assert sum(b["type"] == "OSMData" for b in blobs) == 5  # 4 node + 1 way
    parts = {"nodes": [], "ways": [], "relations": []}
    with open(path, "rb") as f:
        for b in blobs:
            if b["type"] != "OSMData":
                continue
            f.seek(b["offset"])
            dec = O.decode_primitive_block(O._blob_payload(f.read(b["size"])))
            for k in parts:
                parts[k].append(dec[k])
    nodes = pa.concat_tables(parts["nodes"])
    assert (nodes.column("node_id").to_numpy() == node_ids).all()
    assert (nodes.column("lat_nano").to_numpy() == lat).all()
    assert (nodes.column("lon_nano").to_numpy() == lon).all()
    t = nodes.column("tags").to_pylist()
    assert t[0] == '{"amenity":"cafe"}' and t[1] == "{}"
    ways = pa.concat_tables(parts["ways"])
    assert ways.column("refs").to_pylist()[0] == [1, 2, 3, 4]
    rels = pa.concat_tables(parts["relations"])
    assert rels.column("member_roles").to_pylist() == [["outer", "inner", ""]]
    assert rels.column("member_ids").to_pylist() == [[10000, 10001, 5]]
    assert rels.column("member_types").to_pylist() == [[1, 1, 0]]


def test_uncompressed_raw_blob(tmp_path):
    path = str(tmp_path / "raw.osm.pbf")
    O.write_osm_pbf(path, node_ids=[5], lat_nano=[1000], lon_nano=[-2000],
                    node_tags=[{"k": "v"}], compress=False)
    info = O.osm_info(path)
    assert info["nodes"] == 1
    with open(path, "rb") as f:
        blob = O.scan_blobs(path)
        f.seek(blob[1]["offset"])
        dec = O.decode_primitive_block(O._blob_payload(f.read(blob[1]["size"])))
    assert dec["nodes"].column("lat_nano").to_pylist() == [1000]
    assert dec["nodes"].column("lon_nano").to_pylist() == [-2000]


def test_granularity_guard():
    with pytest.raises(ValueError):
        O.encode_primitive_block(node_ids=[1], lat_nano=[150],
                                 lon_nano=[100])


def test_read_osm_distributed(ray_session, tmp_path):
    path = str(tmp_path / "d.osm.pbf")
    node_ids, lat, lon = _write_fixture(path, n=4000, block_rows=512)
    nodes = O.read_osm(path, "nodes").to_pandas().sort_values("node_id")
    assert (nodes["node_id"].to_numpy() == node_ids).all()
    assert (nodes["lat_nano"].to_numpy() == lat).all()
    ways = O.read_osm(path, "ways").to_pandas()
    assert len(ways) == 40
    rels = O.read_osm(path, "relations").to_pandas()
    assert len(rels) == 1


def test_way_lines_join(ray_session, tmp_path):
    path = str(tmp_path / "w.osm.pbf")
    _write_fixture(path, n=200, block_rows=64)
    nodes = O.read_osm(path, "nodes")
    ways = O.read_osm(path, "ways")
    lines = O.way_lines(nodes, ways).to_pandas().sort_values("way_id")
    assert len(lines) == 40
    assert (lines["n_pts"] == 4).all()
    # way 10000 has refs [1,2,3,4]; endpoints match the node formulas
    r = lines[lines["way_id"] == 10000].iloc[0]
    assert r["lat0"] == ((1 * 700) % 1_000_000) * 100 - 45_000_000_000
    assert r["lat1"] == ((4 * 700) % 1_000_000) * 100 - 45_000_000_000
    assert r["lon0"] == ((1 * 1300) % 2_000_000) * 100 - 90_000_000_000


def test_osm_info_counts(tmp_path):
    path = str(tmp_path / "i.osm.pbf")
    _write_fixture(path, n=321)
    info = O.osm_info(path)
    assert (info["nodes"], info["ways"], info["relations"]) == (321, 40, 1)
