"""GeoJSON / GeoJSONSeq source + sink (OGR GeoJSON driver semantics,
ogr/ogrsf_frmts/geojson): geometry<->WKB conversion fidelity, property
schema union, whole-file + line-delimited reads, streamed sink round-trip."""

import json

import numpy as np
import pytest

from gdal_ray.sources.geojson import (
    geometry_to_wkb,
    read_geojson,
    read_geojsonseq,
    wkb_to_geometry,
    write_geojsonseq,
)

GEOMS = [
    {"type": "Point", "coordinates": [1.5, -2.25]},
    {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0.5]]},
    {"type": "Polygon", "coordinates": [
        [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
        [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]},
    {"type": "MultiPoint", "coordinates": [[0, 1], [2, 3]]},
    {"type": "MultiLineString", "coordinates": [[[0, 0], [1, 0]], [[5, 5], [6, 6]]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[0, 0], [1, 0], [1, 1], [0, 0]]],
        [[[9, 9], [10, 9], [10, 10], [9, 10], [9, 9]]]]},
]


def _coords_equal(a, b):
    if isinstance(a, (int, float)):
        return isinstance(b, (int, float)) and float(a) == float(b)
    return len(a) == len(b) and all(_coords_equal(x, y) for x, y in zip(a, b))


@pytest.mark.parametrize("geom", GEOMS, ids=[g["type"] for g in GEOMS])
def test_geometry_wkb_roundtrip(geom):
    back = wkb_to_geometry(geometry_to_wkb(geom))
    assert back["type"] == geom["type"]
    assert _coords_equal(back["coordinates"], geom["coordinates"])


def test_unsupported_geometry_gate():
    with pytest.raises(ValueError):
        geometry_to_wkb({"type": "GeometryCollection", "geometries": []})


def _fc(features):
    return {"type": "FeatureCollection", "features": features}


def test_read_featurecollection_and_property_union(ray_session, tmp_path):
    feats = [
        {"type": "Feature", "geometry": GEOMS[0], "properties": {"a": 1, "b": "x"}},
        {"type": "Feature", "geometry": GEOMS[2], "properties": {"a": 2, "c": 3.5}},
    ]
    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps(_fc(feats)))
    df = read_geojson(str(p)).to_pandas()
    assert len(df) == 2
    assert {"wkb", "a", "b", "c"} <= set(df.columns)
    assert df["a"].tolist() == [1, 2]
    assert df["b"].tolist()[1] is None
    assert wkb_to_geometry(df["wkb"][1])["type"] == "Polygon"


def test_geojsonseq_roundtrip(ray_session, tmp_path):
    src = tmp_path / "in.geojsonl"
    lines = []
    for i, g in enumerate(GEOMS):
        lines.append(json.dumps(
            {"type": "Feature", "geometry": g, "properties": {"fid": i}}))
    src.write_text("\n".join(lines) + "\n")

    ds = read_geojsonseq(str(src))
    df = ds.to_pandas().sort_values("fid").reset_index(drop=True)
    assert len(df) == len(GEOMS)
    for i, g in enumerate(GEOMS):
        assert wkb_to_geometry(df["wkb"][i])["type"] == g["type"]

    out = tmp_path / "out"
    n = write_geojsonseq(ds, str(out))
    assert n == len(GEOMS)
    back = read_geojsonseq([str(f) for f in sorted(out.glob("*.geojsonl"))])
    df2 = back.to_pandas().sort_values("fid").reset_index(drop=True)
    assert df2["fid"].tolist() == list(range(len(GEOMS)))
    for i, g in enumerate(GEOMS):
        got = wkb_to_geometry(df2["wkb"][i])
        assert got["type"] == g["type"]
        assert json.dumps(got["coordinates"]) == json.dumps(
            wkb_to_geometry(df["wkb"][i])["coordinates"])


def test_write_is_deterministic_and_atomic(ray_session, tmp_path):
    import ray.data
    import pandas as pd

    rows = pd.DataFrame({
        "wkb": [geometry_to_wkb(GEOMS[0]), geometry_to_wkb(GEOMS[1])],
        "name": ["p", "l"],
    })
    ds = ray.data.from_pandas(rows)
    out = tmp_path / "sink"
    n1 = write_geojsonseq(ds, str(out))
    files1 = sorted(f.name for f in out.glob("*.geojsonl"))
    n2 = write_geojsonseq(ds, str(out))  # re-run: identical content hash
    files2 = sorted(f.name for f in out.glob("*.geojsonl"))
    assert n1 == n2 == 2
    assert files1 == files2
    assert not list(out.glob("*.tmp.*"))
