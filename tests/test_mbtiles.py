"""MBTiles sink/source conformance (state/mbtiles.py vs the MBTiles spec).

Reference: frmts/mbtiles/mbtilesdataset.cpp — metadata + tiles tables,
TMS tile_row flip vs XYZ."""

import sqlite3

import numpy as np
import pyarrow as pa

from gdal_ray.state.mbtiles import read_mbtiles, read_metadata, write_mbtiles

TS = 8


def _tiles_table():
    rng = np.random.Generator(np.random.PCG64(11))
    rows = {"z": [], "x": [], "y": [], "rgb": [], "alpha": []}
    for (z, x, y) in [(2, 0, 0), (2, 1, 3), (3, 5, 2)]:
        rgb = rng.integers(0, 256, size=(TS, TS, 3), dtype=np.uint8)
        alpha = np.full((TS, TS), 255, np.uint8)
        if y == 3:
            alpha[0, 0] = 128  # one translucent tile -> RGBA png path
        rows["z"].append(z)
        rows["x"].append(x)
        rows["y"].append(y)
        rows["rgb"].append(rgb.tobytes())
        rows["alpha"].append(alpha.tobytes())
    return pa.table({
        "z": pa.array(rows["z"], pa.int64()),
        "x": pa.array(rows["x"], pa.int64()),
        "y": pa.array(rows["y"], pa.int64()),
        "rgb": pa.array(rows["rgb"], pa.binary()),
        "alpha": pa.array(rows["alpha"], pa.binary()),
    })


def test_roundtrip_and_tms_flip(ray_session, tmp_path):
    import ray.data as rd

    path = str(tmp_path / "t.mbtiles")
    t = _tiles_table()
    n = write_mbtiles(rd.from_arrow(t), path, tile_size=TS, name="test")
    assert n == 3

    # spec-level: tile_row is TMS-flipped
    con = sqlite3.connect(path)
    try:
        rows = set(con.execute(
            "SELECT zoom_level, tile_column, tile_row FROM tiles"))
        assert rows == {(2, 0, 3), (2, 1, 0), (3, 5, 5)}
    finally:
        con.close()

    meta = read_metadata(path)
    assert meta["format"] == "png" and meta["name"] == "test"
    assert meta["minzoom"] == "2" and meta["maxzoom"] == "3"

    got = (read_mbtiles(path, decode=True)
           .to_pandas().sort_values(["z", "x", "y"]).reset_index(drop=True))
    src = t.to_pandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
    assert list(got["z"]) == list(src["z"])
    assert list(got["x"]) == list(src["x"])
    assert list(got["y"]) == list(src["y"])
    for i in range(3):
        assert bytes(got["rgb"][i]) == bytes(src["rgb"][i])
        assert bytes(got["alpha"][i]) == bytes(src["alpha"][i])


def test_parallel_range_read(ray_session, tmp_path):
    import ray.data as rd

    path = str(tmp_path / "many.mbtiles")
    base = _tiles_table()
    many = pa.concat_tables([base] * 4)
    # make (z,x,y) unique across copies by shifting x
    xs = many.column("x").to_numpy() + np.repeat(np.arange(4) * 100, 3)
    many = many.set_column(1, "x", pa.array(xs, pa.int64()))
    write_mbtiles(rd.from_arrow(many), path, tile_size=TS)
    ds = read_mbtiles(path, rows_per_block=5)
    got = ds.to_pandas()
    assert len(got) == 12
    assert set(zip(got["z"], got["x"], got["y"])) == set(
        zip(many.column("z").to_pylist(), xs.tolist(),
            many.column("y").to_pylist()))
