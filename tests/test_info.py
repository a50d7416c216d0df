"""gdalinfo/ogrinfo analogue (gdal_ray/info.py describe) across every
driver.  Reference: apps/gdalinfo_lib.cpp, apps/ogrinfo_lib.cpp."""

import json

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.info import describe


def test_tiff_and_cog(tmp_path):
    from gdal_ray.codecs.tiff import encode_cog, encode_geotiff

    arr = np.arange(40 * 60, dtype=np.uint8).reshape(40, 60)
    p = str(tmp_path / "a.tif")
    open(p, "wb").write(encode_geotiff(
        arr, geotransform=(1.0, 0.25, 0, 9.0, 0, -0.25), epsg=4326, nodata=0))
    d = describe(p, stats=True)
    assert d["driver"] == "GTiff" and (d["width"], d["height"]) == (60, 40)
    assert d["epsg"] == 4326 and d["nodata"] == 0.0
    assert d["geotransform"] == [1.0, 0.25, 0, 9.0, 0, -0.25]
    assert d["stats"][0]["min"] == 0.0 and d["stats"][0]["max"] == 255.0

    big = np.zeros((600, 600), np.uint8)
    p2 = str(tmp_path / "c.tif")
    open(p2, "wb").write(encode_cog(big, tile_size=256))
    d2 = describe(p2)
    assert d2["driver"] == "COG" and len(d2["overviews"]) == 2


def test_png(tmp_path):
    from gdal_ray.codecs.png import encode_png

    rgb = np.full((8, 9, 3), 5, np.uint8)
    p = str(tmp_path / "x.png")
    open(p, "wb").write(encode_png(rgb))
    d = describe(p)
    assert d["driver"] == "PNG" and d["bands"] == 3 and d["width"] == 9


def test_gpkg(tmp_path):
    from gdal_ray.sources.geojson import geometry_to_wkb
    from gdal_ray.sources.gpkg import write_gpkg

    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(
            {"type": "Point", "coordinates": [3.0, 4.0]})], pa.binary()),
        "name": pa.array(["a"], pa.string()),
    })
    p = str(tmp_path / "v.gpkg")
    write_gpkg(t, p, layer="pts")
    d = describe(p)
    assert d["driver"] == "GPKG"
    assert d["layers"][0]["name"] == "pts"
    assert d["layers"][0]["feature_count"] == 1
    assert d["layers"][0]["extent"] == [3.0, 4.0, 3.0, 4.0]


def test_shapefile(tmp_path):
    from gdal_ray.sources.geojson import geometry_to_wkb
    from gdal_ray.sources.shapefile import write_shapefile

    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(
            {"type": "Point", "coordinates": [float(i), 2.0]})
            for i in range(3)], pa.binary()),
        "tag": pa.array(["a", "b", "c"], pa.string()),
    })
    base = str(tmp_path / "pts")
    write_shapefile(t, base)
    d = describe(base + ".shp")
    assert d["driver"] == "ESRI Shapefile" and d["shape_type"] == "Point"
    assert d["features"] == 3
    assert d["fields"][0]["name"] == "tag"


def test_geojson_both_forms(tmp_path):
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [0, 0]},
         "properties": {}},
        {"type": "Feature", "geometry": {"type": "Polygon", "coordinates":
            [[[0, 0], [1, 0], [1, 1], [0, 0]]]}, "properties": {}},
    ]}
    p = str(tmp_path / "f.geojson")
    json.dump(fc, open(p, "w"))
    d = describe(p)
    assert d["driver"] == "GeoJSON" and d["features"] == 2
    assert d["geometry_types"] == {"Point": 1, "Polygon": 1}

    p2 = str(tmp_path / "f.geojsonl")
    with open(p2, "w") as f:
        for ft in fc["features"]:
            f.write(json.dumps(ft) + "\n")
    d2 = describe(p2)
    assert d2["driver"] == "GeoJSONSeq" and d2["features"] == 2


def test_parquet_mbtiles_pmtiles_zarr_netcdf(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    # parquet
    pqp = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": [1, 2, 3]}), pqp)
    d = describe(pqp)
    assert d["driver"] == "Parquet" and d["rows"] == 3

    # tiles fixtures
    ts = 8
    t = pa.table({
        "z": pa.array([2], pa.int64()), "x": pa.array([1], pa.int64()),
        "y": pa.array([1], pa.int64()),
        "rgb": pa.array([np.zeros((ts, ts, 3), np.uint8).tobytes()], pa.binary()),
        "alpha": pa.array([np.full((ts, ts), 255, np.uint8).tobytes()], pa.binary()),
    })
    from gdal_ray.state.mbtiles import write_mbtiles
    from gdal_ray.state.pmtiles import write_pmtiles

    mb = str(tmp_path / "t.mbtiles")
    write_mbtiles(rd.from_arrow(t), mb, tile_size=ts)
    d = describe(mb)
    assert d["driver"] == "MBTiles" and d["tiles"] == 1 and d["min_zoom"] == 2

    pm = str(tmp_path / "t.pmtiles")
    write_pmtiles(rd.from_arrow(t), pm, tile_size=ts)
    d = describe(pm)
    assert d["driver"] == "PMTiles" and d["tiles"] == 1

    # zarr
    from gdal_ray.sources.zarr import write_zarr

    zp = str(tmp_path / "z.zarr")
    write_zarr(np.zeros((4, 4), np.uint8), zp, chunks=(2, 2))
    d = describe(zp)
    assert d["driver"] == "Zarr" and d["shape"] == [4, 4]

    # netcdf
    from gdal_ray.sources.netcdf3 import write_netcdf

    ncp = str(tmp_path / "t.nc")
    write_netcdf(ncp, dims={"x": 3},
                 variables={"v": (("x",), np.array([1, 2, 3], np.int32), {})},
                 gatts={"title": "t"})
    d = describe(ncp)
    assert d["driver"] == "netCDF" and d["dimensions"] == {"x": 3}
    assert d["global_attributes"]["title"] == "t"


def test_unknown_format(tmp_path):
    p = str(tmp_path / "x.xyz")
    open(p, "w").write("?")
    with pytest.raises(ValueError):
        describe(p)


def test_cli_info(tmp_path, capsys):
    from gdal_ray.cli import main

    from gdal_ray.codecs.png import encode_png

    p = str(tmp_path / "x.png")
    open(p, "wb").write(encode_png(np.zeros((4, 4), np.uint8)))
    assert main(["info", p]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["driver"] == "PNG"


def test_describe_vrt_and_aaigrid(tmp_path):
    import numpy as np

    from gdal_ray.codecs.tiff import encode_geotiff
    from gdal_ray.info import describe
    from gdal_ray.sources.aaigrid import write_aaigrid
    from gdal_ray.sources.vrt import save_vrt

    p = str(tmp_path / "a.tif")
    open(p, "wb").write(encode_geotiff(
        np.zeros((10, 20), np.uint8),
        geotransform=(0.0, 1.0, 0.0, 10.0, 0.0, -1.0)))
    vp = str(tmp_path / "m.vrt")
    save_vrt([p], vp)
    d = describe(vp)
    assert d["format"] == "VRT" and (d["width"], d["height"]) == (20, 10)
    assert d["n_sources"] == 1

    ap = str(tmp_path / "g.asc")
    write_aaigrid(np.ones((5, 7)), ap, xll=2.0, yll=3.0, cellsize=0.5,
                  nodata=-9.0)
    d = describe(ap)
    assert d["format"] == "AAIGrid" and (d["width"], d["height"]) == (7, 5)
    assert d["geotransform"] == [2.0, 0.5, 0.0, 5.5, 0.0, -0.5]
    assert d["nodata"] == -9.0


def test_describe_kml_gpx(tmp_path):
    import pyarrow as pa

    from gdal_ray.info import describe
    from gdal_ray.sources.geojson import geometry_to_wkb
    from gdal_ray.sources.kmlgpx import write_gpx, write_kml

    t = pa.table({"wkb": pa.array([geometry_to_wkb(
        {"type": "Point", "coordinates": [1.0, 2.0]})] * 3, pa.binary())})
    write_kml(t, str(tmp_path / "v.kml"))
    assert describe(str(tmp_path / "v.kml")) == {
        "format": "KML", "n_features": 3}
    write_gpx(t, str(tmp_path / "v.gpx"))
    assert describe(str(tmp_path / "v.gpx"))["layers"] == {
        "waypoints": 3, "tracks": 0}
