"""PMTiles v3 archive conformance (state/pmtiles.py vs the public spec).

Reference: frmts/pmtiles (pmtilesdataset.cpp reads the same layout)."""

import gzip
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.state.pmtiles import (
    HEADER_SIZE,
    decode_directory,
    encode_directory,
    read_header,
    read_metadata,
    read_pmtiles,
    tileid_to_zxy,
    write_pmtiles,
    zxy_to_tileid,
)

TS = 8


def test_tileid_spec_values():
    # the PMTiles v3 spec's worked examples
    assert zxy_to_tileid(0, 0, 0) == 0
    assert zxy_to_tileid(1, 0, 0) == 1
    assert zxy_to_tileid(1, 0, 1) == 2
    assert zxy_to_tileid(1, 1, 1) == 3
    assert zxy_to_tileid(1, 1, 0) == 4
    assert zxy_to_tileid(2, 0, 0) == 5


def test_tileid_roundtrip_exhaustive():
    for z in range(5):
        for x in range(1 << z):
            for y in range(1 << z):
                tid = zxy_to_tileid(z, x, y)
                assert tileid_to_zxy(tid) == (z, x, y)
    # ids are dense per zoom: z covers [base, base+4^z)
    ids = sorted(zxy_to_tileid(3, x, y) for x in range(8) for y in range(8))
    assert ids == list(range(21, 21 + 64))


def test_tileid_out_of_range():
    with pytest.raises(ValueError):
        zxy_to_tileid(2, 4, 0)


def test_directory_codec_roundtrip():
    entries = [(5, 0, 100, 1), (6, 100, 50, 1), (9, 150, 75, 2),
               (40, 1000, 10, 1)]
    buf = encode_directory(entries)
    assert decode_directory(buf) == entries
    # contiguous entries encode offset byte 0 (delta form)
    assert decode_directory(encode_directory([(1, 0, 7, 1), (2, 7, 3, 1)])) \
        == [(1, 0, 7, 1), (2, 7, 3, 1)]


def _tiles_table():
    rng = np.random.Generator(np.random.PCG64(3))
    rows = {"z": [], "x": [], "y": [], "rgb": [], "alpha": []}
    for (z, x, y) in [(2, 0, 0), (2, 1, 3), (3, 5, 2), (3, 0, 7)]:
        rows["z"].append(z)
        rows["x"].append(x)
        rows["y"].append(y)
        rows["rgb"].append(
            rng.integers(0, 256, size=(TS, TS, 3), dtype=np.uint8).tobytes())
        rows["alpha"].append(np.full((TS, TS), 255, np.uint8).tobytes())
    return pa.table({k: pa.array(v, pa.int64() if k in "zxy" else pa.binary())
                     for k, v in rows.items()})


def test_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    path = str(tmp_path / "t.pmtiles")
    t = _tiles_table()
    n = write_pmtiles(rd.from_arrow(t), path, tile_size=TS,
                      metadata={"name": "pm-test"})
    assert n == 4

    h = read_header(path)
    assert h["min_zoom"] == 2 and h["max_zoom"] == 3
    assert h["n_entries"] == 4 and h["clustered"]
    assert read_metadata(path)["name"] == "pm-test"

    got = (read_pmtiles(path).to_pandas()
           .sort_values(["z", "x", "y"]).reset_index(drop=True))
    assert list(zip(got["z"], got["x"], got["y"])) == \
        sorted(zip(t.column("z").to_pylist(), t.column("x").to_pylist(),
                   t.column("y").to_pylist()))
    # pixel equality through the PNG codec
    from gdal_ray.codecs.png import decode_png
    src = t.to_pandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
    for i in range(4):
        img = decode_png(bytes(got["png"][i]))
        rgb = img[:, :, :3] if img.ndim == 3 else np.dstack([img] * 3)
        assert rgb.tobytes() == bytes(src["rgb"][i])


def test_header_layout_bytes(ray_session, tmp_path):
    import ray.data as rd

    path = str(tmp_path / "h.pmtiles")
    write_pmtiles(rd.from_arrow(_tiles_table()), path, tile_size=TS)
    raw = open(path, "rb").read(HEADER_SIZE)
    assert raw[0:7] == b"PMTiles" and raw[7] == 3
    root_off, root_len = struct.unpack_from("<2Q", raw, 8)
    assert root_off == HEADER_SIZE
    # root dir is gzip (internal_compression=2) and decodes to 4 entries
    assert raw[97] == 2
    dirbuf = gzip.decompress(open(path, "rb").read()[root_off:root_off + root_len])
    assert len(decode_directory(dirbuf)) == 4


def test_parallel_read_blocks(ray_session, tmp_path):
    import ray.data as rd

    path = str(tmp_path / "p.pmtiles")
    rng = np.random.Generator(np.random.PCG64(5))
    rows = {"z": [], "x": [], "y": [], "rgb": [], "alpha": []}
    for x in range(10):
        rows["z"].append(4)
        rows["x"].append(x)
        rows["y"].append(x % 3)
        rows["rgb"].append(
            rng.integers(0, 256, size=(TS, TS, 3), dtype=np.uint8).tobytes())
        rows["alpha"].append(np.full((TS, TS), 255, np.uint8).tobytes())
    t = pa.table({k: pa.array(v, pa.int64() if k in "zxy" else pa.binary())
                  for k, v in rows.items()})
    write_pmtiles(rd.from_arrow(t), path, tile_size=TS)
    got = read_pmtiles(path, entries_per_block=3).to_pandas()
    assert len(got) == 10
    assert set(zip(got["z"], got["x"], got["y"])) == \
        set(zip(rows["z"], rows["x"], rows["y"]))


def test_duplicate_tiles_rejected(ray_session, tmp_path):
    import ray.data as rd

    t = _tiles_table()
    dup = pa.concat_tables([t, t.slice(0, 1)])
    with pytest.raises(Exception):
        write_pmtiles(rd.from_arrow(dup), str(tmp_path / "d.pmtiles"),
                      tile_size=TS)


def test_leaf_directories_100k_tiles(ray_session, tmp_path):
    """Round-4 gate removal (VERDICT #6): >16,384 entries must spill into
    leaf directories (root entries with run_length 0 pointing into the
    leaf section) and read back exactly — 100k tiles, already-encoded
    blobs keyed to their tile id."""
    import ray.data as rd

    from gdal_ray.state import pmtiles as pm

    n = 100_000
    z = 9  # 512x512 grid = 262,144 slots >= 100k
    tid0 = pm.zxy_to_tileid(z, 0, 0)
    xs, ys = zip(*(pm._hilbert_d_to_xy(z, d) for d in range(0, 2 * n, 2)))
    blobs = [str(tid0 + 2 * i).encode() for i in range(n)]
    tiles = pa.table({
        "z": pa.array([z] * n, pa.int64()),
        "x": pa.array(xs, pa.int64()),
        "y": pa.array(ys, pa.int64()),
        "png": pa.array(blobs, pa.binary()),
    })
    path = str(tmp_path / "leafy.pmtiles")
    count = write_pmtiles(rd.from_arrow(tiles), path, tile_size=TS,
                          already_encoded=True)
    assert count == n
    h = read_header(path)
    assert h["leaf_len"] > 0 and h["n_entries"] == n
    # root holds leaf pointers only (run_length 0), well under the bound
    root = decode_directory(
        gzip.decompress(open(path, "rb").read()[h["root_off"]:h["root_off"] + h["root_len"]]))
    assert len(root) == -(-n // pm.LEAF_ENTRIES)
    assert all(e[3] == 0 for e in root)
    back = read_pmtiles(path).to_pandas()
    assert len(back) == n
    got = {pm.zxy_to_tileid(int(r.z), int(r.x), int(r.y)): bytes(r.png)
           for r in back.itertuples()}
    for i in range(0, n, 9973):  # sampled content equality
        tid = tid0 + 2 * i
        assert got[tid] == str(tid).encode()
