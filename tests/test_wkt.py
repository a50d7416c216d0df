"""WKT codec (OGRGeometry import/exportToWkt subset) + CSV/WKT driver."""

import numpy as np
import pytest

from gdal_ray.geometry.wkt import wkb_to_wkt, wkt_to_wkb
from gdal_ray.geometry.wkb import decode_wkb, GeomType

CASES = [
    "POINT (1.5 -2.25)",
    "LINESTRING (0 0,1 1,2 0.5)",
    "POLYGON ((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
    "MULTIPOINT ((0 1),(2 3))",
    "MULTILINESTRING ((0 0,1 0),(5 5,6 6))",
    "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),((9 9,10 9,10 10,9 10,9 9)))",
]


@pytest.mark.parametrize("wkt", CASES, ids=[c.split(" ")[0] for c in CASES])
def test_wkt_roundtrip(wkt):
    wkb = wkt_to_wkb(wkt)
    assert wkb_to_wkt(wkb) == wkt
    # and through a second cycle (stability)
    assert wkb_to_wkt(wkt_to_wkb(wkb_to_wkt(wkb))) == wkt


def test_wkt_whitespace_and_bare_multipoint():
    a = wkt_to_wkb("  point( 3   4 )")
    assert decode_wkb(a)[0] == GeomType.POINT
    bare = wkt_to_wkb("MULTIPOINT (0 1,2 3)")
    wrapped = wkt_to_wkb("MULTIPOINT ((0 1),(2 3))")
    assert bare == wrapped


def test_wkt_scientific_numbers():
    wkb = wkt_to_wkb("POINT (1e3 -2.5E-2)")
    _, p = decode_wkb(wkb)
    assert p[0] == 1000.0 and p[1] == -0.025


def test_wkt_errors():
    with pytest.raises(ValueError):
        wkt_to_wkb("GEOMETRYCOLLECTION (POINT (0 0))")
    with pytest.raises(ValueError):
        wkt_to_wkb("POINT EMPTY")
    with pytest.raises(ValueError):
        wkt_to_wkb("POLYGON ((0 0,1 junk))")
    with pytest.raises(ValueError):
        wkt_to_wkb("LINESTRING (0 0,1 1")


def test_duckdb_reads_our_wkt():
    # DuckDB parses the WKT we emit (format-compat oracle without PROJ)
    import duckdb
    con = duckdb.connect()
    try:
        con.execute("install spatial; load spatial")
    except Exception:
        pytest.skip("duckdb spatial extension unavailable offline")
    for wkt in CASES:
        area = con.execute(f"select st_area(st_geomfromtext('{wkt}'))").fetchone()
        assert area is not None


def test_csv_wkt_roundtrip(ray_session, tmp_path):
    import pandas as pd
    import ray.data
    from gdal_ray.sources.csvwkt import read_csv_wkt, write_csv_wkt

    src = tmp_path / "layer.csv"
    pd.DataFrame({
        "WKT": CASES,
        "fid": range(len(CASES)),
        "name": [c.split(" ")[0].lower() for c in CASES],
    }).to_csv(src, index=False)

    ds = read_csv_wkt(str(src))
    df = ds.to_pandas().sort_values("fid").reset_index(drop=True)
    assert len(df) == len(CASES)
    assert [wkb_to_wkt(w) for w in df["wkb"]] == CASES

    out = tmp_path / "out"
    write_csv_wkt(ds, str(out))
    back = read_csv_wkt([str(f) for f in sorted(out.glob("*.csv"))])
    df2 = back.to_pandas().sort_values("fid").reset_index(drop=True)
    assert [wkb_to_wkt(w) for w in df2["wkb"]] == CASES
    assert df2["name"].tolist() == df["name"].tolist()
