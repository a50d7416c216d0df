"""ogr_layer_algebra door: Union/Identity/Erase/SymDifference piece
tables over two GeoJSON layers, hand-computed exact areas."""

import json

import pandas as pd


def _fc(features):
    return json.dumps({"type": "FeatureCollection", "features": features})


def _sq(fid, x0, y0, x1, y1):
    ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
    return {"type": "Feature", "properties": {"fid": fid},
            "geometry": {"type": "Polygon", "coordinates": [ring]}}


def _run(op, a_path, b_path, out):
    from gdal_ray.cli import main

    assert main(["layeralgebra", op, str(a_path), str(b_path), str(out)]) == 0
    return pd.read_csv(out, keep_default_na=False)


def test_union_identity_erase_symdifference(ray_session, tmp_path, capsys):
    # A: 2x2-degree squares at (0,0)-(2,2) and (3,0)-(5,2)
    # B: one 2x2 square at (1,0)-(3,2): overlaps A0 by 1x2, touches A1
    a = tmp_path / "a.geojson"
    b = tmp_path / "b.geojson"
    a.write_text(_fc([_sq(0, 0, 0, 2, 2), _sq(1, 3, 0, 5, 2)]))
    b.write_text(_fc([_sq(0, 1, 0, 3, 2)]))
    # unit = 0.01 degrees; area2_u = 2 * area_deg2 * 100^2
    FULL = 2 * 200 * 200     # 2x2 deg square
    HALF = 2 * 100 * 200     # 1x2 deg piece

    u = _run("union", a, b, tmp_path / "u.csv")
    capsys.readouterr()
    rows = {(r.cls, r.a_id, str(r.b_id)): r.area2_u for r in u.itertuples()}
    assert rows[("both", 0, "0")] == HALF
    assert rows[("a_only", 0, "")] == FULL - HALF
    assert rows[("a_only", 1, "")] == FULL  # edge touch = zero-area overlap
    assert rows[("b_only", -1, "0")] == FULL - HALF
    assert len(u) == 4

    i = _run("identity", a, b, tmp_path / "i.csv")
    capsys.readouterr()
    assert set(i["cls"]) == {"both", "a_only"} and len(i) == 3

    e = _run("erase", a, b, tmp_path / "e.csv")
    capsys.readouterr()
    assert set(e["cls"]) == {"a_only"} and len(e) == 2
    assert sorted(e["area2_u"]) == [FULL - HALF, FULL]

    s = _run("symdifference", a, b, tmp_path / "s.csv")
    capsys.readouterr()
    assert set(s["cls"]) == {"a_only", "b_only"} and len(s) == 3


def test_parquet_output_and_holes(ray_session, tmp_path, capsys):
    """Method feature with a hole: piece areas honor inclusion-exclusion."""
    a = tmp_path / "a.geojson"
    b = tmp_path / "b.geojson"
    a.write_text(_fc([_sq(7, 0, 0, 4, 4)]))
    # B = 4x4 square with a centered 2x2 hole (donut), same extent as A
    outer = [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
    inner = [[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]]
    b.write_text(_fc([{
        "type": "Feature", "properties": {"fid": 9},
        "geometry": {"type": "Polygon", "coordinates": [outer, inner]},
    }]))
    from gdal_ray.cli import main

    outdir = tmp_path / "out.parquet"
    assert main(["layeralgebra", "union", str(a), str(b),
                 str(outdir) + "/"]) == 0
    capsys.readouterr()
    import ray.data as rd

    df = rd.read_parquet(str(outdir)).to_pandas()
    rows = {(r.cls, r.a_id, str(r.b_id)): r.area2_u for r in df.itertuples()}
    donut = 2 * (400 * 400 - 200 * 200)
    hole = 2 * 200 * 200
    assert rows[("both", 7, "9")] == donut
    assert rows[("a_only", 7, "")] == hole  # A minus donut = the hole
    assert ("b_only", -1, "9") not in rows  # donut fully covered by A
