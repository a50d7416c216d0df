"""ogr2ogr-style vector_translate (apps/ogr2ogr_lib.cpp semantics):
where/select/clip/reproject composition over a WKB polygon Dataset."""

import numpy as np
import pytest

from gdal_ray.vector import vector_translate
from gdal_ray.geometry.wkb import polygon_parts
from gdal_ray.geometry.ops import polygon_area2_units


@pytest.fixture(scope="module")
def polys(ray_session):
    import ray.data
    from gdal_ray.synth import make_polygon_table

    return ray.data.from_arrow(make_polygon_table(50))


def test_where_filter(polys):
    out = vector_translate(polys, where="poly_id LIKE 'poly-000%'").to_pandas()
    assert len(out) > 0
    assert all(p.startswith("poly-000") for p in out["poly_id"])


def test_select_projects_columns(polys):
    out = vector_translate(polys, select=["poly_id"]).to_pandas()
    assert set(out.columns) == {"wkb", "poly_id"}
    with pytest.raises(Exception):
        vector_translate(polys, select=["nope"]).to_pandas()


def test_clip_drops_outside_and_shrinks_area(polys):
    df_all = polys.to_pandas()
    bbox = (-60.0, -40.0, 60.0, 40.0)
    out = vector_translate(polys, clip_bbox=bbox).to_pandas()
    assert 0 < len(out) < len(df_all)
    for wkb in out["wkb"]:
        for rings in polygon_parts(wkb):
            for r in rings:
                assert r[:, 0].min() >= bbox[0] - 1e-9
                assert r[:, 0].max() <= bbox[2] + 1e-9
                assert r[:, 1].min() >= bbox[1] - 1e-9
                assert r[:, 1].max() <= bbox[3] + 1e-9
    # area never grows under clipping
    areas_in = {p: polygon_area2_units(polygon_parts(w))
                for p, w in zip(df_all["poly_id"], df_all["wkb"])}
    for p, w in zip(out["poly_id"], out["wkb"]):
        assert polygon_area2_units(polygon_parts(w)) <= areas_in[p]


def test_reproject_round_trip(polys):
    fwd = vector_translate(polys, t_srs="EPSG:3857")
    back = vector_translate(fwd, s_srs="EPSG:3857", t_srs="EPSG:4326").to_pandas()
    orig = polys.to_pandas().set_index("poly_id")
    for pid, wkb in zip(back["poly_id"], back["wkb"]):
        got = polygon_parts(wkb)
        want = polygon_parts(orig.loc[pid, "wkb"])
        assert len(got) == len(want)
        for rg, rw in zip(got, want):
            for a, b in zip(rg, rw):
                np.testing.assert_allclose(a, b, atol=1e-9)


def test_full_chain_matches_sequential_composition(polys):
    combined = vector_translate(
        polys, where="poly_id LIKE 'poly-00%'",
        clip_bbox=(-20.0, -20.0, 20.0, 20.0), t_srs="EPSG:3857",
        select=["poly_id"]).to_pandas().sort_values("poly_id").reset_index(drop=True)
    step = vector_translate(polys, where="poly_id LIKE 'poly-00%'")
    step = vector_translate(step, clip_bbox=(-20.0, -20.0, 20.0, 20.0))
    step = vector_translate(step, t_srs="EPSG:3857", select=["poly_id"])
    seq = step.to_pandas().sort_values("poly_id").reset_index(drop=True)
    assert combined["poly_id"].tolist() == seq["poly_id"].tolist()
    assert [bytes(a) for a in combined["wkb"]] == [bytes(a) for a in seq["wkb"]]
