"""ogrmerge + gdalmanage-identify CLI doors."""

import json

import numpy as np


def _geojson(path, pts, prop):
    feats = [{"type": "Feature",
              "properties": {prop: int(i)},
              "geometry": {"type": "Point", "coordinates": [x, y]}}
             for i, (x, y) in enumerate(pts)]
    path.write_text(json.dumps(
        {"type": "FeatureCollection", "features": feats}))


def test_cli_ogrmerge(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    a = tmp_path / "a.geojson"
    b = tmp_path / "b.geojson"
    _geojson(a, [(0.0, 0.0), (1.0, 1.0)], "val")
    _geojson(b, [(2.0, 2.0), (3.0, 3.0), (4.0, 4.0)], "val")
    dst = tmp_path / "m.geojson"
    rc = main(["ogrmerge", str(dst), str(a), str(b),
               "--src-field", "source"])
    assert rc == 0
    fc = json.loads(dst.read_text())
    assert len(fc["features"]) == 5
    srcs = sorted({f["properties"]["source"] for f in fc["features"]})
    assert srcs == ["a", "b"]
    xs = sorted(f["geometry"]["coordinates"][0] for f in fc["features"])
    assert xs == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_cli_identify(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.codecs.tiff import encode_geotiff

    t = tmp_path / "r.tif"
    t.write_bytes(encode_geotiff(np.zeros((8, 8), dtype=np.uint8)))
    g = tmp_path / "v.geojson"
    _geojson(g, [(0.0, 0.0)], "val")
    junk = tmp_path / "x.bin"
    junk.write_bytes(b"\x00\x01\x02")
    rc = main(["identify", str(t), str(g), str(junk)])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    rep = {ln.rsplit(": ", 1)[0]: ln.rsplit(": ", 1)[1] for ln in lines}
    assert "tif" in rep[str(t)].lower() or "gtiff" in rep[str(t)].lower()
    assert "json" in rep[str(g)].lower()
    assert rep[str(junk)] in ("unrecognized", "unknown")


def test_cli_transform(capsys):
    from gdal_ray.cli import main

    rc = main(["transform", "-s_srs", "EPSG:4326", "-t_srs", "EPSG:3857",
               "0", "0", "90", "45"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    x0, y0 = (float(v) for v in lines[0].split())
    assert abs(x0) < 1e-6 and abs(y0) < 1e-6
    x1, y1 = (float(v) for v in lines[1].split())
    assert abs(x1 - 10018754.171394622) < 1e-3
    assert abs(y1 - 5621521.486192067) < 1e-3

    # round-trip through a UTM zone
    rc = main(["transform", "-s_srs", "EPSG:32633", "-t_srs", "EPSG:4326",
               "500000", "0"])
    lines = capsys.readouterr().out.strip().splitlines()
    lon, lat = (float(v) for v in lines[-1].split())
    assert abs(lon - 15.0) < 1e-9 and abs(lat) < 1e-9
