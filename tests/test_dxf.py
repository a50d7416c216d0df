"""DXF vector driver: entity-span scan, OGR geometry semantics
(closed polylines, arc tessellation, SOLID corner swap), round trip."""

import numpy as np
import pytest

from gdal_ray.geometry.wkb import GeomType, decode_wkb

FIXTURE = """0
SECTION
2
HEADER
9
$ACADVER
1
AC1015
0
ENDSEC
0
SECTION
2
ENTITIES
0
POINT
8
sites
10
3.5
20
-1.25
0
LINE
8
roads
10
0.0
20
0.0
11
10.0
21
5.0
0
LWPOLYLINE
8
parcels
90
4
70
1
10
0.0
20
0.0
10
4.0
20
0.0
10
4.0
20
3.0
10
0.0
20
3.0
0
POLYLINE
8
rivers
70
0
0
VERTEX
10
1.0
20
1.0
0
VERTEX
10
2.0
20
4.0
0
VERTEX
10
5.0
20
4.5
0
SEQEND
0
CIRCLE
8
wells
10
2.0
20
2.0
40
1.5
0
ARC
8
curves
10
0.0
20
0.0
40
2.0
50
0.0
51
90.0
0
TEXT
8
labels
10
7.0
20
8.0
1
Depot
0
SOLID
8
fills
10
0.0
20
0.0
11
1.0
21
0.0
12
0.0
22
1.0
13
1.0
23
1.0
0
ENDSEC
0
EOF
"""


@pytest.fixture()
def dxf_file(tmp_path):
    p = tmp_path / "t.dxf"
    p.write_text(FIXTURE)
    return str(p)


def test_read_entities(ray_session, dxf_file):
    from gdal_ray.sources import open_vector

    df = open_vector(dxf_file).to_pandas().sort_values("fid")
    assert list(df["etype"]) == ["POINT", "LINE", "LWPOLYLINE", "POLYLINE",
                                 "CIRCLE", "ARC", "TEXT", "SOLID"]
    assert list(df["layer"]) == ["sites", "roads", "parcels", "rivers",
                                 "wells", "curves", "labels", "fills"]
    by = {r.etype: bytes(r.wkb) for r in df.itertuples()}

    g, pt = decode_wkb(by["POINT"])
    assert g == GeomType.POINT and list(pt) == [3.5, -1.25]

    g, ln = decode_wkb(by["LINE"])
    assert g == GeomType.LINESTRING and ln.tolist() == [[0, 0], [10, 5]]

    g, poly = decode_wkb(by["LWPOLYLINE"])  # closed flag -> closing vertex
    assert g == GeomType.LINESTRING
    assert poly.tolist()[0] == poly.tolist()[-1] and len(poly) == 5

    g, riv = decode_wkb(by["POLYLINE"])
    assert riv.tolist() == [[1, 1], [2, 4], [5, 4.5]]

    g, circ = decode_wkb(by["CIRCLE"])  # 4-degree steps, endpoints exact
    assert len(circ) == 91
    np.testing.assert_allclose(np.hypot(circ[:, 0] - 2, circ[:, 1] - 2), 1.5)

    g, arc = decode_wkb(by["ARC"])  # CCW quarter circle
    np.testing.assert_allclose(arc[0], [2.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(arc[-1], [0.0, 2.0], atol=1e-12)

    g, sld = decode_wkb(by["SOLID"])  # corner order 1,2,4,3 -> convex ring
    ring = sld[0]
    assert ring.tolist() == [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]

    txt = df[df.etype == "TEXT"].iloc[0]
    assert txt["text"] == "Depot"


def test_roundtrip_write_read(ray_session, dxf_file, tmp_path):
    from gdal_ray.sources import open_vector
    from gdal_ray.sources.dxf import write_dxf

    df = open_vector(dxf_file).to_pandas()
    out = tmp_path / "rt.dxf"
    n = write_dxf(df, str(out))
    assert n == len(df)
    df2 = open_vector(str(out)).to_pandas()

    # coordinates survive exactly; polygons come back as closed
    # LWPOLYLINE rings (the writer's documented mapping)
    def coords(wkb):
        g, payload = decode_wkb(bytes(wkb))
        if g == GeomType.POINT:
            return [payload.tolist()]
        if g == GeomType.LINESTRING:
            return payload.tolist()
        return payload[0].tolist()  # polygon exterior

    a = sorted(map(str, (coords(w) for w in df["wkb"])))
    b = sorted(map(str, (coords(w) for w in df2["wkb"])))
    assert a == b
    assert set(df2["etype"]) == {"POINT", "LWPOLYLINE"}


def test_info_door(dxf_file):
    from gdal_ray.info import describe

    out = describe(dxf_file)
    assert out["driver"] == "DXF" and out["n_entities"] == 8
