"""GML simple-features driver: 3.2 + 2.1 fixtures, round-trips, parallel
member-span reads."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geometry.wkb import encode_point, encode_polygon, polygon_parts
from gdal_ray.sources.gml import read_gml, read_gml_meta, write_gml


def _tbl():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    hole = np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0]])
    return pa.table({
        "wkb": pa.array([encode_point(12.5, -3.75),
                         encode_polygon([outer, hole])], pa.binary()),
        "name": pa.array(["pt", "donut"]),
    })


def test_roundtrip(tmp_path, ray_session):
    p = str(tmp_path / "fc.gml")
    write_gml(p, _tbl())
    m = read_gml_meta(p)
    assert m["n_features"] == 2
    rows = sorted(read_gml(p).take_all(), key=lambda r: r["fid"])
    assert [r["name"] for r in rows] == ["pt", "donut"]
    x, y = np.frombuffer(rows[0]["wkb"][5:21], "<f8")
    assert (x, y) == (12.5, -3.75)
    parts = polygon_parts(rows[1]["wkb"])
    assert len(parts[0]) == 2  # exterior + interior survive
    np.testing.assert_array_equal(
        parts[0][0][:4], np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float))


def test_gml2_coordinates_flavor(tmp_path, ray_session):
    gml = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
  <gml:featureMember>
    <f><label>a</label>
    <gml:Point><gml:coordinates>3.5,7.25</gml:coordinates></gml:Point></f>
  </gml:featureMember>
  <gml:featureMember>
    <f><label>b</label>
    <gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>
    <gml:coordinates>0,0 2,0 2,2 0,2</gml:coordinates>
    </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon></f>
  </gml:featureMember>
  <gml:featureMember>
    <f><label>line</label>
    <gml:LineString><gml:posList>0 0 1 1 2 0</gml:posList>
    </gml:LineString></f>
  </gml:featureMember>
</gml:FeatureCollection>
"""
    p = tmp_path / "g2.gml"
    p.write_text(gml)
    rows = sorted(read_gml(str(p)).take_all(), key=lambda r: r["fid"])
    assert [r["label"] for r in rows] == ["a", "b", "line"]
    x, y = np.frombuffer(rows[0]["wkb"][5:21], "<f8")
    assert (x, y) == (3.5, 7.25)
    assert int.from_bytes(rows[1]["wkb"][1:5], "little") & 0xFF == 3
    w = rows[2]["wkb"]
    assert int.from_bytes(w[1:5], "little") & 0xFF == 2
    assert int.from_bytes(w[5:9], "little") == 3  # 3 vertices


def test_open_vector_door(tmp_path, ray_session):
    from gdal_ray.sources import open_vector

    p = str(tmp_path / "door.gml")
    write_gml(p, _tbl())
    assert len(open_vector(p).take_all()) == 2


def test_gml_curve_segments(tmp_path, ray_session):
    """Round-5: gml:Curve segments (Arc / ArcString / Circle /
    LineStringSegment) linearize through the WKB arc kernel; a
    Ring/Curve polygon boundary takes the same path
    (gml2ogrgeometry.cpp Arc semantics)."""
    import math

    import numpy as np

    from gdal_ray.geometry.wkb import decode_wkb, polygon_rings
    from gdal_ray.sources.gml import read_gml

    gml = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2">
 <gml:featureMember>
  <f><name>circlepoly</name>
   <geom><gml:Polygon><gml:exterior><gml:Ring><gml:curveMember>
    <gml:Curve><gml:segments>
      <gml:Circle><gml:posList>0 0 1 1 2 0</gml:posList></gml:Circle>
    </gml:segments></gml:Curve>
   </gml:curveMember></gml:Ring></gml:exterior></gml:Polygon></geom></f>
 </gml:featureMember>
 <gml:featureMember>
  <f><name>arcline</name>
   <geom><gml:Curve><gml:segments>
     <gml:Arc><gml:posList>0 0 1 1 2 0</gml:posList></gml:Arc>
     <gml:LineStringSegment><gml:posList>2 0 3 0</gml:posList>
     </gml:LineStringSegment>
   </gml:segments></gml:Curve></geom></f>
 </gml:featureMember>
</gml:FeatureCollection>"""
    p = str(tmp_path / "curves.gml")
    with open(p, "w") as f:
        f.write(gml)
    rows = {r["name"]: r for r in read_gml(p).take_all()}
    assert set(rows) == {"circlepoly", "arcline"}
    # unit circle through (0,0),(1,1),(2,0): area pi, within 4° chords
    ring = polygon_rings(rows["circlepoly"]["wkb"])[0]
    x, y = ring[:, 0], ring[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert abs(area - math.pi) < 5e-3
    # semicircle (len pi) + unit segment
    _, pts = decode_wkb(rows["arcline"]["wkb"])
    length = float(np.hypot(*np.diff(pts, axis=0).T).sum())
    assert abs(length - (math.pi + 1.0)) < 2e-3
