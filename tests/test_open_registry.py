"""Driver registry (sources.open_vector / open_raster — the GDALOpen /
OGROpen analogue) and GDALG lazy-pipeline documents (frmts/gdalg)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources import open_raster, open_vector
from gdal_ray.sources.geojson import geometry_to_wkb


def _pts_table(n=4):
    return pa.table({
        "wkb": pa.array([geometry_to_wkb(
            {"type": "Point", "coordinates": [float(i), float(i) / 2]})
            for i in range(n)], pa.binary()),
        "tag": pa.array([f"t{i}" for i in range(n)], pa.string()),
    })


def test_open_vector_dispatch(ray_session, tmp_path):
    from gdal_ray.sources.flatgeobuf import write_flatgeobuf
    from gdal_ray.sources.gpkg import write_gpkg
    from gdal_ray.sources.shapefile import write_shapefile

    t = _pts_table()
    paths = {}
    write_gpkg(t, str(tmp_path / "v.gpkg"))
    paths["gpkg"] = str(tmp_path / "v.gpkg")
    write_shapefile(t, str(tmp_path / "v"))
    paths["shp"] = str(tmp_path / "v.shp")
    write_flatgeobuf(t, str(tmp_path / "v.fgb"))
    paths["fgb"] = str(tmp_path / "v.fgb")
    for kind, p in paths.items():
        got = open_vector(p).to_pandas()
        assert len(got) == 4, kind
        assert "wkb" in got.columns and "tag" in got.columns, kind
        assert set(got["tag"]) == {"t0", "t1", "t2", "t3"}, kind
    with pytest.raises(ValueError):
        open_vector("x.unknown")


def test_open_raster_dispatch(ray_session, tmp_path):
    from gdal_ray.codecs.tiff import encode_geotiff
    from gdal_ray.sources.zarr import write_zarr

    arr = np.arange(64 * 48, dtype=np.uint8).reshape(48, 64)
    tp = str(tmp_path / "r.tif")
    open(tp, "wb").write(encode_geotiff(arr, tile_size=32))
    rows = open_raster(tp).to_pandas()
    assert rows["h"].sum() * 0 == 0 and len(rows) == 4

    zp = str(tmp_path / "r.zarr")
    write_zarr(arr, zp, chunks=(16, 16))
    rows = open_raster(zp).to_pandas()
    assert len(rows) == 3 * 4
    with pytest.raises(ValueError):
        open_raster("x.unknown")


def test_gdalg_roundtrip(ray_session, tmp_path):
    from gdal_ray.pipeline import open_gdalg, run_pipeline, save_gdalg

    text = "read --limit=8 --kind=dem ! hillshade"
    p = str(tmp_path / "pipe.gdalg.json")
    save_gdalg(text, p)
    doc = json.load(open(p))
    assert doc["type"] == "gdal_streamed_alg"
    assert doc["command_line"] == text

    sf = "/root/testdata/sf0.001"
    direct = run_pipeline(text, sf).to_pandas()
    lazy = open_gdalg(p, sf)  # nothing executed yet (lazy Dataset)
    got = lazy.to_pandas()
    assert got.equals(direct)


def test_gdalg_rejects_bad_docs(tmp_path):
    from gdal_ray.pipeline import open_gdalg, save_gdalg

    with pytest.raises(ValueError):
        save_gdalg("hillshade ! write", str(tmp_path / "x.json"))  # no read
    p = str(tmp_path / "y.json")
    json.dump({"type": "other"}, open(p, "w"))
    with pytest.raises(ValueError):
        open_gdalg(p, "/root/testdata/sf0.001")


def test_cli_sql_over_vector_file(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.sources.gpkg import write_gpkg

    t = _pts_table(6)
    write_gpkg(t, str(tmp_path / "v.gpkg"))
    rc = main(["sql",
               "SELECT tag, LENGTH(tag) AS n FROM v WHERE tag <> 't0' "
               "ORDER BY tag LIMIT 3",
               "--table", f"v={tmp_path}/v.gpkg"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "tag,n"
    assert out[1:] == ["t1,2", "t2,2", "t3,2"]


def test_cli_ogr2ogr_gpkg_to_fgb(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.sources import open_vector
    from gdal_ray.sources.gpkg import write_gpkg

    write_gpkg(_pts_table(8), str(tmp_path / "s.gpkg"))
    rc = main(["ogr2ogr", str(tmp_path / "s.gpkg"), str(tmp_path / "d.fgb"),
               "--where", "tag <> 't0'"])
    assert rc == 0
    got = open_vector(str(tmp_path / "d.fgb")).to_pandas()
    assert len(got) == 7 and "t0" not in set(got["tag"])


def test_save_vector_geojson_roundtrip(ray_session, tmp_path):
    from gdal_ray.sources import open_vector, save_vector

    t = _pts_table(5)
    p = str(tmp_path / "o.geojson")
    save_vector(t, p)
    got = open_vector(p).to_pandas()
    assert len(got) == 5 and set(got["tag"]) == {f"t{i}" for i in range(5)}


def test_cli_pipeline_string(ray_session, capsys):
    from gdal_ray.cli import main

    rc = main(["pipeline", "read --limit=4 --kind=dem ! hillshade",
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0
