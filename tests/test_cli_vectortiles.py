"""vectortiles CLI door: vector -> MVT pyramid in MBTiles/PMTiles,
plus the cover/clip/quantize stage kernels."""

import json

import numpy as np
import pyarrow as pa

from gdal_ray.sources.geojson import geometry_to_wkb
from gdal_ray.stages.mvt import (build_mixed_tile, decode_tile,
                                 geometry_cover_batch)


def _batch(geoms, props=None):
    cols = {"wkb": pa.array([geometry_to_wkb(g) for g in geoms],
                            pa.binary())}
    for k, vals in (props or {}).items():
        cols[k] = pa.array(vals)
    return pa.table(cols)


def test_cover_point_line_polygon_roundtrip():
    geoms = [
        {"type": "Point", "coordinates": [0.1, 0.1]},
        {"type": "LineString",
         "coordinates": [[-120.0, 30.0], [120.0, 30.0]]},
        {"type": "Polygon",
         "coordinates": [[[-40.0, -30.0], [40.0, -30.0], [40.0, 30.0],
                          [-40.0, 30.0], [-40.0, -30.0]]]},
    ]
    b = _batch(geoms, {"name": ["pt", "ln", "pg"]})
    cov = geometry_cover_batch(b, zoom=2, props=["name"])
    # the long line and the big polygon must span multiple tiles
    names = cov.column("props").to_pylist()
    assert sum("ln" in s for s in names) >= 3
    assert sum("pg" in s for s in names) >= 2
    assert sum("pt" in s for s in names) == 1

    # build each tile and decode: every feature survives with its props
    import pyarrow.compute as pc
    keys = set(zip(cov.column("x").to_pylist(), cov.column("y").to_pylist()))
    build = build_mixed_tile("test")
    total = 0
    for x, y in keys:
        g = cov.filter(pc.and_(pc.equal(cov.column("x"), x),
                               pc.equal(cov.column("y"), y)))
        out = build(g)
        layers = decode_tile(out.column("mvt")[0].as_py())
        assert layers[0]["name"] == "test"
        total += len(layers[0]["features"])
        for f in layers[0]["features"]:
            assert f["props"]["name"] in ("pt", "ln", "pg")
            for p in f["parts"]:
                assert (p >= 0).all() and (p <= 4096).all()
    assert total == len(cov)


def test_cli_vectortiles_mbtiles(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.state.mbtiles import read_metadata

    import sqlite3

    feats = [{"type": "Feature", "properties": {"name": f"f{i}"},
              "geometry": {"type": "Point",
                           "coordinates": [i * 30.0 - 60.0, 10.0]}}
             for i in range(4)]
    feats.append({"type": "Feature", "properties": {"name": "box"},
                  "geometry": {"type": "Polygon",
                               "coordinates": [[[-50.0, -20.0],
                                                [50.0, -20.0],
                                                [50.0, 20.0],
                                                [-50.0, 20.0],
                                                [-50.0, -20.0]]]}})
    src = tmp_path / "v.geojson"
    src.write_text(json.dumps(
        {"type": "FeatureCollection", "features": feats}))
    out = tmp_path / "v.mbtiles"
    rc = main(["vectortiles", str(src), str(out), "--zoom", "0-2",
               "--layer", "demo", "--props", "name"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_tiles"] >= 3          # z0 has 1 tile, z1/z2 more
    assert read_metadata(str(out))["format"] == "pbf"

    con = sqlite3.connect(str(out))
    rows = con.execute(
        "select zoom_level, tile_column, tile_row, tile_data from tiles"
        " where zoom_level=0").fetchall()
    con.close()
    assert len(rows) == 1
    layers = decode_tile(rows[0][3])
    assert layers[0]["name"] == "demo"
    names = {f["props"]["name"] for f in layers[0]["features"]}
    assert names == {"f0", "f1", "f2", "f3", "box"}


def test_cli_vectortiles_pmtiles(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.state.pmtiles import read_pmtiles

    feats = [{"type": "Feature", "properties": {},
              "geometry": {"type": "LineString",
                           "coordinates": [[-100.0, 0.0], [100.0, 40.0]]}}]
    src = tmp_path / "l.geojson"
    src.write_text(json.dumps(
        {"type": "FeatureCollection", "features": feats}))
    out = tmp_path / "l.pmtiles"
    rc = main(["vectortiles", str(src), str(out), "--zoom", "3"])
    assert rc == 0
    tiles = read_pmtiles(str(out)).take_all()
    assert len(tiles) >= 4              # the line crosses several z3 tiles
    blob_col = "png" if "png" in tiles[0] else "blob"
    for t in tiles:
        layers = decode_tile(t[blob_col])
        assert len(layers[0]["features"]) >= 1
