"""HyperLogLog sketch (stages/sketch.py): accuracy vs exact distinct,
bit-exact merge identity, determinism."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.sketch import (approx_distinct, hll_estimate,
                                    hll_merge, hll_partial)

SF_DIR = "/root/testdata/sf0.001"


def test_accuracy_int():
    rng = np.random.default_rng(5)
    for true_n in (100, 5_000, 200_000):
        vals = rng.integers(0, 10**15, true_n)
        col = pa.array(np.repeat(vals, 2))  # duplicates must not matter
        est = hll_estimate(hll_merge([hll_partial(col)]))
        assert abs(est - len(np.unique(vals))) / true_n < 0.03, (true_n, est)


def test_accuracy_strings():
    vals = pa.array([f"doc-{i:08d}" for i in range(50_000)])
    est = hll_estimate(hll_merge([hll_partial(vals)]))
    assert abs(est - 50_000) / 50_000 < 0.03


def test_merge_is_union_exact():
    rng = np.random.default_rng(9)
    a = pa.array(rng.integers(0, 10**12, 30_000))
    b = pa.array(rng.integers(0, 10**12, 30_000))
    both = pa.concat_arrays([a, b])
    merged = hll_merge([hll_partial(a), hll_partial(b)])
    direct = hll_merge([hll_partial(both)])
    np.testing.assert_array_equal(merged, direct)  # bit-exact identity


def test_determinism_and_partition_invariance(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/orders.parquet")
    e1 = approx_distinct(ds, "o_custkey")
    e2 = approx_distinct(ds.repartition(13), "o_custkey")
    assert e1 == e2  # register max is order/partitioning independent
    import duckdb
    exact = duckdb.connect().execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF_DIR}/orders.parquet'").fetchone()[0]
    assert abs(e1 - exact) / max(exact, 1) < 0.05


def test_small_range_linear_counting():
    col = pa.array(list(range(10)))
    est = hll_estimate(hll_merge([hll_partial(col)]))
    assert abs(est - 10) < 0.5
