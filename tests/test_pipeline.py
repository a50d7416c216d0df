"""Named-step pipeline registry (`gdal raster pipeline` surface,
apps/gdalalg_raster_pipeline.cpp): parser grammar, step parity with the
standalone stage kernels, user-registered steps, capability gates."""

import numpy as np
import pytest

from gdal_ray import pipeline
from gdal_ray.pipeline import parse_pipeline, run_pipeline, register_step

SF = "/root/testdata/sf0.001"


def test_parse_grammar():
    st = parse_pipeline("read --limit=8 ! hillshade --azimuth 90 --z-factor=2.5 ! write /tmp/x")
    assert st == [
        ("read", [], {"limit": 8}),
        ("hillshade", [], {"azimuth": 90, "z_factor": 2.5}),
        ("write", ["/tmp/x"], {}),
    ]
    with pytest.raises(ValueError):
        parse_pipeline("   ")
    with pytest.raises(ValueError):
        parse_pipeline("read ! hillshade --azimuth")  # dangling option


def test_pipeline_must_start_with_read():
    with pytest.raises(ValueError):
        run_pipeline("hillshade ! write", sf_dir=SF)
    with pytest.raises(ValueError):
        run_pipeline("read ! no-such-step ! write", sf_dir=SF)


def test_reference_registry_steps_present():
    # the reference's single-input step registry (gdalalg_raster_pipeline.cpp:360)
    for name in ("read", "write", "aspect", "clip", "color-map", "fill-nodata",
                 "hillshade", "proximity", "reclassify", "reproject", "resize",
                 "rgb-to-palette", "roughness", "scale", "select", "set-type",
                 "sieve", "slope", "tpi", "tri", "unscale", "viewshed"):
        assert name in pipeline.step_names(), name


def test_hillshade_pipeline_matches_kernel(ray_session):
    from gdal_ray.stages.dem import elevation_grids, hillshade
    from gdal_ray.stages.stats import checksum_plane

    df = run_pipeline("read --limit=12 --kind=dem ! hillshade ! write",
                      sf_dir=SF).to_pandas().sort_values("image_id")
    assert len(df) == 12
    for img_id, ck in zip(df["image_id"], df["checksum"]):
        e = elevation_grids(np.array([img_id]))
        want = checksum_plane(np.ascontiguousarray(hillshade(e.astype(np.float64))[0]))
        assert ck == want


def test_translate_style_chain(ray_session):
    df = run_pipeline(
        "read --limit=10 ! select --bands=1 ! clip --bbox=2,2,30,30 ! "
        "resize --size=14,14 --resampling=bilinear ! scale --dst-max=100 ! "
        "set-type --ot=uint8 ! write", sf_dir=SF).to_pandas()
    assert len(df) == 10
    assert (df["checksum"] >= 0).all()


def test_reproject_step_updates_crs(ray_session):
    ds = run_pipeline("read --limit=4 ! reproject --dst-crs=EPSG:3857", sf_dir=SF)
    tbl = ds.to_pandas()
    assert set(tbl["crs"]) == {"EPSG:3857"}
    assert len(tbl) == 4


def test_user_registered_step(ray_session):
    @register_step("negate-test")
    def _negate(img, **_):
        return 255 - img

    try:
        df = run_pipeline("read --limit=4 --kind=dem ! negate-test ! write",
                          sf_dir=SF).to_pandas()
        assert len(df) == 4
    finally:
        del pipeline._REGISTRY["negate-test"]


def test_multi_input_steps_gate():
    from gdal_ray.pipeline import _REGISTRY
    kind, fn = _REGISTRY["mosaic"]
    with pytest.raises(NotImplementedError):
        fn(np.zeros((4, 4)))


def test_write_to_parquet_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "tiles")
    df = run_pipeline(f"read --limit=6 --kind=dem ! slope ! set-type --ot=uint8 ! "
                      f"write {out}", sf_dir=SF).to_pandas()
    assert len(df) == 6
    import pyarrow.parquet as pq
    full = pq.read_table(out)
    assert {"image_id", "checksum", "png"} <= set(full.column_names)
    # the written PNGs decode back
    from gdal_ray.codecs.png import decode_png
    blob = full.column("png")[0].as_py()
    assert decode_png(blob).ndim >= 2


def test_hillshade_variant_option_parity():
    import numpy as np

    from gdal_ray.pipeline import _REGISTRY
    from gdal_ray.stages import dem

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(12, 12)).astype(np.uint8)
    step = _REGISTRY["hillshade"][1]
    band = img.astype(np.float64)[None]
    assert (step(img, variant="combined")
            == dem.hillshade_combined(band)[0]).all()
    assert (step(img, variant="igor") == dem.hillshade_igor(band)[0]).all()
    assert (step(img, variant="multidirectional")
            == dem.hillshade_multidirectional(band)[0]).all()
    import pytest as _pt
    with _pt.raises(ValueError):
        step(img, variant="nope")
