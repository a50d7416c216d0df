"""KML + GPX vector drivers (sources/kmlgpx.py) — ogr/ogrsf_frmts/kml,
ogr/ogrsf_frmts/gpx.  Byte-scan element spans, parallel parse."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources.geojson import geometry_to_wkb, wkb_to_geometry
from gdal_ray.sources.kmlgpx import (
    _element_spans,
    read_gpx,
    read_kml,
    write_gpx,
    write_kml,
)


def _table():
    geoms = [
        {"type": "Point", "coordinates": [1.5, 2.5]},
        {"type": "LineString", "coordinates": [[0.0, 0.0], [3.0, 4.0]]},
        {"type": "Polygon", "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [2.0, 1.0], [1.0, 2.0], [1.0, 1.0]],
        ]},
    ]
    return pa.table({
        "wkb": pa.array([geometry_to_wkb(g) for g in geoms], pa.binary()),
        "name": pa.array(["p & q", "line<1>", "poly"], pa.string()),
        "grade": pa.array([7, None, 9], pa.int64()),
    })


def test_kml_roundtrip(ray_session, tmp_path):
    t = _table()
    p = str(tmp_path / "v.kml")
    write_kml(t, p, name_col="name")
    df = read_kml(p).to_pandas()
    assert list(df["name"]) == ["p & q", "line<1>", "poly"]
    assert df["grade"].tolist() == ["7", None, "9"]  # ExtendedData is text
    geoms = [wkb_to_geometry(w) for w in df["wkb"]]
    assert geoms[0] == {"type": "Point", "coordinates": [1.5, 2.5]}
    assert geoms[1]["coordinates"] == [[0.0, 0.0], [3.0, 4.0]]
    assert len(geoms[2]["coordinates"]) == 2  # outer + inner ring survive


def test_gpx_roundtrip_both_layers(ray_session, tmp_path):
    t = _table()
    p = str(tmp_path / "v.gpx")
    write_gpx(t.slice(0, 2), p, name_col="name")
    wpts = read_gpx(p, layer="waypoints").to_pandas()
    assert len(wpts) == 1 and wpts["name"].iloc[0] == "p & q"
    assert wkb_to_geometry(wpts["wkb"].iloc[0])["coordinates"] == [1.5, 2.5]
    trks = read_gpx(p, layer="tracks").to_pandas()
    assert len(trks) == 1
    assert wkb_to_geometry(trks["wkb"].iloc[0])["coordinates"] == \
        [[0.0, 0.0], [3.0, 4.0]]


def test_gpx_rejects_polygon(tmp_path):
    t = _table()
    with pytest.raises(NotImplementedError):
        write_gpx(t, str(tmp_path / "x.gpx"))


def test_element_spans_ignores_longer_tags(tmp_path):
    p = str(tmp_path / "s.xml")
    open(p, "w").write("<gpx><wpt lat='1' lon='2'></wpt>"
                       "<trk><trkseg><trkpt lat='3' lon='4'></trkpt>"
                       "</trkseg></trk></gpx>")
    assert len(_element_spans(p, "wpt")) == 1
    assert len(_element_spans(p, "trk")) == 1


def test_open_vector_dispatch_xml(ray_session, tmp_path):
    from gdal_ray.sources import open_vector

    t = _table()
    write_kml(t, str(tmp_path / "v.kml"), name_col="name")
    assert len(open_vector(str(tmp_path / "v.kml")).to_pandas()) == 3
    write_gpx(t.slice(0, 1), str(tmp_path / "v.gpx"), name_col="name")
    assert len(open_vector(str(tmp_path / "v.gpx")).to_pandas()) == 1


def test_kml_parallel_many_placemarks(ray_session, tmp_path):
    n = 600
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(
            {"type": "Point", "coordinates": [float(i), float(-i)]})
            for i in range(n)], pa.binary()),
        "name": pa.array([f"pt{i}" for i in range(n)], pa.string()),
    })
    p = str(tmp_path / "big.kml")
    write_kml(t, p, name_col="name")
    assert len(_element_spans(p, "Placemark")) == n
    ds = read_kml(p, spans_per_block=64)  # -> ceil(600/64) parallel tasks
    assert ds.materialize().num_blocks() > 1  # genuinely parallel parse
    df = ds.to_pandas()
    assert len(df) == n
    xs = sorted(wkb_to_geometry(w)["coordinates"][0] for w in df["wkb"])
    assert xs == [float(i) for i in range(n)]
