"""MapInfo MIF/MID driver: round-trips, MULTIPLE plines, regions with
holes, attribute typing, parallel record-span reads."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geometry.wkb import polygon_parts
from gdal_ray.sources.mifmid import read_mif_meta, read_mifmid, write_mifmid


def _poly_tbl():
    from gdal_ray.geometry.wkb import encode_point, encode_polygon

    outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    hole = np.array([[4.0, 4.0], [4.0, 6.0], [6.0, 6.0], [6.0, 4.0]])
    return pa.table({
        "wkb": pa.array([encode_point(1.5, -2.25),
                         encode_polygon([outer]),
                         encode_polygon([outer, hole]),
                         None], pa.binary()),
        "name": pa.array(["pt", "box", "donut", "empty"]),
        "rank": pa.array([3, 1, 2, 0], pa.int64()),
        "score": pa.array([0.5, 1.25, -3.5, 0.0], pa.float64()),
    })


def test_roundtrip(tmp_path, ray_session):
    tbl = _poly_tbl()
    base = str(tmp_path / "layer")
    write_mifmid(base + ".mif", tbl)
    m = read_mif_meta(base + ".mif")
    assert m["n_features"] == 4
    assert [c[0] for c in m["columns"]] == ["name", "rank", "score"]
    rows = sorted(read_mifmid(base + ".mif").take_all(),
                  key=lambda r: r["fid"])
    assert [r["name"] for r in rows] == ["pt", "box", "donut", "empty"]
    assert [r["rank"] for r in rows] == [3, 1, 2, 0]
    assert rows[3]["wkb"] is None
    # point coordinates survive
    x, y = np.frombuffer(rows[0]["wkb"][5:21], "<f8")
    assert (x, y) == (1.5, -2.25)
    # donut: exterior + hole regrouped
    parts = polygon_parts(rows[2]["wkb"])
    assert len(parts) == 1 and len(parts[0]) == 2


def test_hand_written_mif_pline_multiple(tmp_path, ray_session):
    mif = "\n".join([
        "VERSION 300",
        'DELIMITER ","',
        "COLUMNS 1",
        "  label Char(10)",
        "DATA",
        "PLINE MULTIPLE 2",
        "  2",
        "0 0",
        "1 1",
        "  3",
        "2 2",
        "3 3",
        "4 4",
        "PEN (1,2,0)",
        "POINT 7 8",
        "SYMBOL (34,0,12)",
    ]) + "\n"
    (tmp_path / "h.mif").write_text(mif)
    (tmp_path / "h.mid").write_text('"ml"\n"pt"\n')
    rows = sorted(read_mifmid(str(tmp_path / "h.mif")).take_all(),
                  key=lambda r: r["fid"])
    assert len(rows) == 2
    assert rows[0]["label"] == "ml"
    # multilinestring wkb: type 5 with 2 parts
    w = rows[0]["wkb"]
    assert int.from_bytes(w[1:5], "little") == 5
    assert int.from_bytes(w[5:9], "little") == 2
    assert rows[1]["label"] == "pt"
    x, y = np.frombuffer(rows[1]["wkb"][5:21], "<f8")
    assert (x, y) == (7.0, 8.0)


def test_open_vector_door(tmp_path, ray_session):
    from gdal_ray.sources import open_vector

    tbl = _poly_tbl()
    base = str(tmp_path / "door")
    write_mifmid(base + ".mif", tbl)
    rows = open_vector(base + ".mif").take_all()
    assert len(rows) == 4
