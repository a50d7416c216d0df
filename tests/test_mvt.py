"""MVT (Mapbox Vector Tiles) encoder/decoder tests — wire round trips per
the public MVT 2.1 spec (reference semantics: ogr/ogrsf_frmts/mvt/
mvt_tile.cpp command stream, mvtutils.cpp layer schema)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import mvt


def test_geometry_roundtrip_all_types():
    outer = np.array([[0, 0], [4095, 0], [4095, 4095], [0, 4095]])
    hole = np.array([[100, 100], [100, 200], [200, 200]])
    line = np.array([[5, 5], [100, 50], [2000, 3000]])
    for gtype, parts in [
        (mvt.GEOM_POLYGON, [outer, hole]),
        (mvt.GEOM_LINESTRING, [line]),
        (mvt.GEOM_POINT, [np.array([[1, 1]]), np.array([[2, 2]])]),
    ]:
        stream = mvt.encode_geometry(gtype, parts)
        back = mvt.decode_geometry(gtype, stream)
        assert len(back) == len(parts)
        for a, b in zip(parts, back):
            assert np.array_equal(a, b)


def test_geometry_negative_deltas_zigzag():
    # walks west/north — negative deltas exercise zigzag encoding
    line = np.array([[4000, 4000], [100, 3900], [50, 10]])
    back = mvt.decode_geometry(
        mvt.GEOM_LINESTRING,
        mvt.encode_geometry(mvt.GEOM_LINESTRING, [line]))
    assert np.array_equal(back[0], line)


def test_layer_roundtrip_props_and_value_dedup():
    feats = [
        {"type": mvt.GEOM_POINT, "parts": [np.array([[i, 2 * i]])],
         "id": 100 + i,
         "props": {"name": f"p{i % 2}", "score": 1.5, "n": -i, "ok": i % 2 == 0}}
        for i in range(4)
    ]
    blob = mvt.encode_tile({"pts": feats})
    (layer,) = mvt.decode_tile(blob)
    assert layer["version"] == 2
    assert layer["name"] == "pts"
    assert layer["extent"] == 4096
    assert [f["id"] for f in layer["features"]] == [100, 101, 102, 103]
    for i, f in enumerate(layer["features"]):
        assert f["props"] == {"name": f"p{i % 2}", "score": 1.5,
                              "n": -i, "ok": i % 2 == 0}
    # value table deduplicates: names {p0,p1}, score {1.5}, n {0,-1,-2,-3},
    # ok {True,False} -> 9 distinct values, 4 keys
    assert len(layer["keys"]) == 4
    assert len(layer["values"]) == 9


def test_custom_extent_and_multilayer():
    f = [{"type": mvt.GEOM_POINT, "parts": [np.array([[7, 9]])], "id": 1}]
    blob = mvt.encode_tile({"a": f, "b": f}, extent=512)
    layers = mvt.decode_tile(blob)
    assert [L["name"] for L in layers] == ["a", "b"]
    assert all(L["extent"] == 512 for L in layers)


def test_quantize_points_matches_tile_assign():
    from gdal_ray import tilemath as tm

    rng = np.random.default_rng(7)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-84, 84, 500)
    b = pa.table({"px": pa.array(lon), "py": pa.array(lat),
                  "point_id": pa.array(np.arange(500), pa.int64())})
    q = mvt.quantize_points_batch(b, zoom=5, keep=["point_id"])
    x_ref, y_ref = tm.lonlat_to_tile_xyz(lon, lat, np.int64(5))
    assert np.array_equal(q.column("x").to_numpy(), x_ref)
    assert np.array_equal(q.column("y").to_numpy(), y_ref)
    qx = q.column("qx").to_numpy()
    qy = q.column("qy").to_numpy()
    assert qx.min() >= 0 and qx.max() < 4096
    assert qy.min() >= 0 and qy.max() < 4096


def test_point_tiles_into_pmtiles_archive(ray_session, tmp_path):
    import ray.data as rd

    from gdal_ray.state import pmtiles

    n = 200
    ids = np.arange(n, dtype=np.int64)
    lon = ((ids * 7919) % 36000) / 100.0 - 180.0 + 0.005
    lat = ((ids * 104729) % 17000) / 100.0 - 85.0 + 0.005
    src = rd.from_arrow(pa.table({
        "px": pa.array(lon), "py": pa.array(lat),
        "point_id": pa.array(ids),
    }))
    pts = src.map_batches(
        lambda b: mvt.quantize_points_batch(b, zoom=2, keep=["point_id"]),
        batch_format="pyarrow")
    tiles = mvt.encode_point_tiles(pts, zoom=2)
    path = str(tmp_path / "vec.pmtiles")
    n_tiles = pmtiles.write_pmtiles(
        tiles.map_batches(lambda t: t.rename_columns(["z", "x", "y", "png"]),
                          batch_format="pyarrow"),
        path, already_encoded=True, tile_type=pmtiles.TILETYPE_MVT)
    assert n_tiles == tiles.count()
    h = pmtiles.read_header(path)
    assert h["tile_type"] == pmtiles.TILETYPE_MVT
    back = pmtiles.read_pmtiles(path).to_pandas()
    got_ids = set()
    for blob in back["png"]:
        (layer,) = mvt.decode_tile(blob)
        got_ids |= {f["id"] for f in layer["features"]}
    assert got_ids == set(range(n))


def test_point_tiles_into_mbtiles(ray_session, tmp_path):
    import ray.data as rd

    from gdal_ray.state import mbtiles

    ids = np.arange(50, dtype=np.int64)
    src = rd.from_arrow(pa.table({
        "px": pa.array(ids * 7.0 - 170.0), "py": pa.array(ids * 3.0 - 80.0),
        "point_id": pa.array(ids),
    }))
    pts = src.map_batches(
        lambda b: mvt.quantize_points_batch(b, zoom=3, keep=["point_id"]),
        batch_format="pyarrow")
    tiles = mvt.encode_point_tiles(pts, zoom=3).map_batches(
        lambda t: t.rename_columns(["z", "x", "y", "mvt"]),
        batch_format="pyarrow")
    path = str(tmp_path / "vec.mbtiles")
    n = mbtiles.write_mbtiles(tiles, path, tile_size=256,
                              already_encoded=True, fmt="pbf",
                              blob_col="mvt")
    assert n > 0
    assert mbtiles.read_metadata(path)["format"] == "pbf"
