"""WKT1 CRS strings (crs_wkt.py): parse -> proj front end, emit, and
round-trip through the transform machinery.  Reference surface:
OGRSpatialReference importFromWkt/exportToWkt."""

import numpy as np
import pytest

from gdal_ray.crs import proj_pair, transform_fn
from gdal_ray.crs_wkt import epsg_to_wkt, parse_wkt, wkt_pair, wkt_to_proj

UTM33N = epsg_to_wkt(32633)

ESRI_LCC = (
    'PROJCS["NAD83_Conus_Albers_like",GEOGCS["GCS_North_American_1983",'
    'DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,'
    '298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",'
    '0.0174532925199433]],PROJECTION["Albers_Conic_Equal_Area"],'
    'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
    'PARAMETER["Central_Meridian",-96.0],'
    'PARAMETER["Standard_Parallel_1",29.5],'
    'PARAMETER["Standard_Parallel_2",45.5],'
    'PARAMETER["Latitude_Of_Origin",23.0],UNIT["Meter",1.0]]'
)


def test_parse_tree():
    node = parse_wkt(UTM33N)
    assert node.name == "PROJCS"
    assert node.child("GEOGCS") is not None
    assert node.child("PROJECTION").strings() == ["Transverse_Mercator"]
    params = {p.strings()[0]: p.numbers()[0]
              for p in node.children("PARAMETER")}
    assert params["central_meridian"] == 15.0
    assert params["scale_factor"] == 0.9996


def test_utm_wkt_matches_epsg_transform():
    fwd, inv = wkt_pair(UTM33N)
    f2 = transform_fn("EPSG:4326", "EPSG:32633")
    lon = np.array([12.0, 15.0, 18.2])
    lat = np.array([41.9, 52.5, 59.3])
    e1, n1 = fwd(lon, lat)
    e2, n2 = f2(lon, lat)
    assert np.abs(e1 - e2).max() < 1e-6
    assert np.abs(n1 - n2).max() < 1e-6
    blon, blat = inv(e1, n1)
    assert np.abs(blon - lon).max() < 1e-9


def test_albers_esri_flavor_parses():
    # ESRI-style names (Latitude_Of_Origin etc.) + GRS80 from SPHEROID
    proj = wkt_to_proj(ESRI_LCC)
    assert "+proj=aea" in proj and "+lat_1=29.5" in proj
    fwd, inv = proj_pair(proj)
    lon = np.array([-96.0, -120.0, -75.0])
    lat = np.array([23.0, 40.0, 45.0])
    blon, blat = inv(*fwd(lon, lat))
    assert np.abs(blon - lon).max() < 1e-9
    assert np.abs(blat - lat).max() < 1e-9
    # the CRS origin maps to the false origin (0, 0)
    e, n = fwd(np.array([-96.0]), np.array([23.0]))
    assert abs(e[0]) < 1e-6 and abs(n[0]) < 1e-6


def test_geogcs_only():
    proj = wkt_to_proj(epsg_to_wkt(4326))
    assert proj.startswith("+proj=longlat")
    fwd, inv = wkt_pair(epsg_to_wkt(4326))
    lon, lat = fwd(np.array([10.0]), np.array([20.0]))
    assert lon[0] == 10.0 and lat[0] == 20.0


def test_unsupported_projection_raises():
    bad = UTM33N.replace("Transverse_Mercator", "Bonne_Weird_Method")
    with pytest.raises(NotImplementedError):
        wkt_to_proj(bad)


def test_shapefile_prj_sidecar(tmp_path):
    import struct

    import pyarrow as pa

    from gdal_ray.info import describe
    from gdal_ray.sources.shapefile import read_prj, write_shapefile

    pt = b"\x01\x01\x00\x00\x00" + struct.pack("<2d", 15.0, 52.0)
    tbl = pa.table({
        "wkb": pa.array([pt], pa.binary()),
        "name": pa.array(["a"], pa.string()),
    })
    base = str(tmp_path / "pts")
    write_shapefile(tbl, base, epsg=32633)
    proj = read_prj(base)
    assert proj and "+proj=tmerc" in proj and "+lon_0=15" in proj
    meta = describe(base + ".shp")
    assert "crs_proj" in meta and "+proj=tmerc" in meta["crs_proj"]


def test_transform_fn_accepts_wkt():
    f1 = transform_fn(epsg_to_wkt(4326), epsg_to_wkt(32633))
    f2 = transform_fn("EPSG:4326", "EPSG:32633")
    lon = np.array([14.2, 15.9])
    lat = np.array([50.1, 47.3])
    e1, n1 = f1(lon, lat)
    e2, n2 = f2(lon, lat)
    assert np.abs(e1 - e2).max() < 1e-6
    assert np.abs(n1 - n2).max() < 1e-6


def test_srsinfo_cli_door(capsys):
    from gdal_ray.cli import main

    assert main(["srsinfo", "EPSG:32633"]) == 0
    out = capsys.readouterr().out
    assert "Transverse_Mercator" in out and '"epsg": 32633' in out
    assert main(["srsinfo", "+proj=moll +R=6371000"]) == 0
    assert main(["srsinfo", UTM33N]) == 0
    out = capsys.readouterr().out
    assert "+proj=tmerc" in out
