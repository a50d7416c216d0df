"""Vector pipeline steps (gdalalg_vector_pipeline.cpp registry :324-341):
read/filter/select/clip/reproject/simplify/segmentize/swap-xy/make-valid/
explode-collections/buffer/sql/write chained through the `!` grammar."""

import numpy as np
import pytest

from gdal_ray import pipeline
from gdal_ray.pipeline import run_pipeline

SF = "/root/testdata/sf0.001"


def test_vector_registry_present():
    for name in ("read-vector", "write-vector", "filter", "select-fields",
                 "reproject-vector", "clip-vector", "simplify", "segmentize",
                 "swap-xy", "make-valid", "explode-collections", "buffer",
                 "sql-vector"):
        assert name in pipeline.step_names(), name


def test_filter_clip_reproject_chain(ray_session):
    df = run_pipeline(
        "read-vector --n=50 ! filter --where=\"poly_id LIKE 'poly-0%'\" ! "
        "clip-vector --bbox=-90,-60,90,60 ! reproject-vector --dst-crs=EPSG:3857 ! "
        "write-vector", sf_dir=SF).to_pandas()
    assert 0 < len(df) < 50
    assert {"n_parts", "n_vertices", "area", "poly_id"} <= set(df.columns)


def test_simplify_reduces_vertices(ray_session):
    base = run_pipeline("read-vector --n=30 ! segmentize --max-length=1 ! write-vector",
                        sf_dir=SF).to_pandas()
    simp = run_pipeline("read-vector --n=30 ! segmentize --max-length=1 ! "
                        "simplify --tolerance=0.5 ! write-vector", sf_dir=SF).to_pandas()
    assert simp["n_vertices"].sum() < base["n_vertices"].sum()


def test_swap_xy_involution(ray_session):
    once = run_pipeline("read-vector --n=10 ! swap-xy ! write-vector", sf_dir=SF).to_pandas()
    twice_ds = run_pipeline("read-vector --n=10 ! swap-xy ! swap-xy", sf_dir=SF)
    import ray.data
    from gdal_ray.synth import make_polygon_table
    orig = ray.data.from_arrow(make_polygon_table(10)).to_pandas()
    twice = twice_ds.to_pandas()
    m_orig = dict(zip(orig["poly_id"], orig["wkb"]))
    for pid, wkb in zip(twice["poly_id"], twice["wkb"]):
        assert bytes(wkb) == bytes(m_orig[pid])
    assert len(once) == 10


def test_explode_collections_multiplies_multiparts(ray_session):
    plain = run_pipeline("read-vector --n=50 ! write-vector", sf_dir=SF).to_pandas()
    exploded = run_pipeline("read-vector --n=50 ! explode-collections ! write-vector",
                            sf_dir=SF).to_pandas()
    extra = int((plain["n_parts"] - 1).clip(lower=0).sum())
    assert len(exploded) == len(plain) + extra
    assert (exploded["n_parts"] == 1).all()


def test_sql_step(ray_session):
    df = run_pipeline(
        "read-vector --n=50 ! sql-vector --query=\"SELECT poly_id FROM layer "
        "WHERE poly_id LIKE 'poly-00000%'\"", sf_dir=SF).to_pandas()
    assert len(df) == 10


def test_vector_write_sink_roundtrip(ray_session, tmp_path):
    from gdal_ray.sources.geojson import read_geojsonseq

    out = tmp_path / "seq"
    run_pipeline(f"read-vector --n=10 ! write-vector {out}", sf_dir=SF)
    back = read_geojsonseq([str(f) for f in sorted(out.glob("*.geojsonl"))]).to_pandas()
    assert len(back) == 10
    assert "poly_id" in back.columns
