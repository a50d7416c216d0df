"""VRT pixel functions (frmts/vrt/pixelfunctions.cpp builtins +
GDALAddDerivedBandPixelFunc user registration) and custom SQL functions
(SWQCF_CUSTOM, ogr/ogr_swq.h:334)."""

import numpy as np
import pytest

from gdal_ray.pixelfunctions import (
    apply_pixel_function,
    pixel_function_names,
    register_pixel_function,
    _PIXFUNCS,
)

A = np.array([[4.0, 9.0], [16.0, 0.0]])
B = np.array([[2.0, 1.0], [4.0, 0.0]])


def test_builtin_kernels():
    np.testing.assert_allclose(apply_pixel_function("sum", [A, B]), A + B)
    np.testing.assert_allclose(apply_pixel_function("sum", [A, B], k=10), A + B + 10)
    np.testing.assert_allclose(apply_pixel_function("diff", [A, B]), A - B)
    np.testing.assert_allclose(apply_pixel_function("mul", [A, B]), A * B)
    np.testing.assert_allclose(apply_pixel_function("div", [A, B]),
                               [[2.0, 9.0], [4.0, 0.0]])
    np.testing.assert_allclose(apply_pixel_function("sqrt", [A]), np.sqrt(A))
    np.testing.assert_allclose(apply_pixel_function("pow", [A], power=2), A * A)
    np.testing.assert_allclose(apply_pixel_function("scale", [A], scale=2, offset=1),
                               A * 2 + 1)
    nd = apply_pixel_function("norm_diff", [A, B])
    np.testing.assert_allclose(nd, [[2 / 6, 8 / 10], [12 / 20, 0.0]])
    np.testing.assert_allclose(apply_pixel_function("min", [A, B]), np.minimum(A, B))
    np.testing.assert_allclose(apply_pixel_function("max", [A, B]), np.maximum(A, B))
    np.testing.assert_allclose(apply_pixel_function("mean", [A, B]), (A + B) / 2)
    np.testing.assert_allclose(
        apply_pixel_function("replace_nodata", [A], to=-1.0, nodata=0.0),
        [[4.0, 9.0], [16.0, -1.0]])
    np.testing.assert_allclose(apply_pixel_function("dB2amp", [B]),
                               10 ** (B / 20.0))
    # interpolate halfway between two band samples
    mid = apply_pixel_function("interpolate_linear", [A, B], t0=0, dt=1, t=0.5)
    np.testing.assert_allclose(mid, (A + B) / 2)


def test_log_db_guard_zero():
    out = apply_pixel_function("log10", [np.array([[0.0, 100.0]])])
    np.testing.assert_allclose(out, [[0.0, 2.0]])
    out = apply_pixel_function("dB", [np.array([[0.0, 10.0]])])
    np.testing.assert_allclose(out, [[0.0, 20.0]])


def test_arity_and_unknown_and_complex_gate():
    with pytest.raises(ValueError):
        apply_pixel_function("diff", [A])
    with pytest.raises(ValueError):
        apply_pixel_function("no-such-fn", [A])
    with pytest.raises(NotImplementedError):
        apply_pixel_function("phase", [A])


def test_user_registered_pixel_function():
    @register_pixel_function("clip99-test")
    def _clip(arrs, hi: float = 99.0):
        return np.minimum(arrs[0], hi)

    try:
        assert "clip99-test" in pixel_function_names()
        out = apply_pixel_function("clip99-test", [A * 10], hi=50)
        assert out.max() == 50
    finally:
        del _PIXFUNCS["clip99-test"]


def test_pixfun_pipeline_step(ray_session):
    from gdal_ray.pipeline import run_pipeline

    # RGB image -> per-pixel max across bands -> checksum rows
    df = run_pipeline("read --limit=6 ! pixfun --fn=max ! set-type --ot=uint8 ! write",
                      sf_dir="/root/testdata/sf0.001").to_pandas()
    assert len(df) == 6


def test_custom_sql_function(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd
    import pandas as pd
    from gdal_ray.sql import execute_sql, register_sql_function, _CUSTOM_FUNCS

    @register_sql_function("REV")
    def _rev(arr):
        return pc.utf8_reverse(arr)

    register_sql_function("DOUBLE_IT", lambda a: pc.multiply(a, 2))
    try:
        t = rd.from_pandas(pd.DataFrame({"s": ["abc", "xy"], "v": [3, 5]}))
        df = execute_sql("SELECT REV(s) AS r, DOUBLE_IT(v) AS d FROM t", {"t": t}).to_pandas()
        assert sorted(df["r"]) == ["cba", "yx"]
        assert sorted(df["d"]) == [6, 10]
        with pytest.raises(Exception):
            execute_sql("SELECT NOSUCH(v) AS x FROM t", {"t": t}).to_pandas()
    finally:
        del _CUSTOM_FUNCS["REV"], _CUSTOM_FUNCS["DOUBLE_IT"]
