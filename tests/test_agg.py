"""grouped_aggregate (hash-bucket + Arrow group reduce) ≡ Ray's built-in
groupby().aggregate() on int and string keys, all agg fns."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def int_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 50_000

    def mk(_):
        return pa.table(
            {
                "z": pa.array(rng.integers(0, 3, n // 10).astype(np.int64)),
                "x": pa.array(rng.integers(0, 200, n // 10).astype(np.int64)),
                "v": pa.array(rng.integers(-50, 50, n // 10).astype(np.int64)),
            }
        )

    return rd.from_blocks([mk(i) for i in range(10)])


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_grouped_aggregate_matches_builtin_int_keys(int_ds):
    from ray.data.aggregate import Count, Max, Min, Sum

    from gdal_ray.stages.agg import grouped_aggregate

    got = _canon(
        grouped_aggregate(
            int_ds,
            ["z", "x"],
            [("v", "sum", "s"), ("v", "min", "lo"), ("v", "max", "hi"), ("v", "count", "n")],
            num_buckets=7,
        ).to_pandas()
    )
    want = _canon(
        int_ds.groupby(["z", "x"])
        .aggregate(
            Sum("v", alias_name="s"), Min("v", alias_name="lo"),
            Max("v", alias_name="hi"), Count(alias_name="n"),
        )
        .to_pandas()
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_grouped_aggregate_string_keys_and_mean(ray_session):
    import ray.data as rd

    from gdal_ray.stages.agg import grouped_aggregate

    rng = np.random.default_rng(7)
    keys = np.array(["alpha", "beta", "gamma", "delta"])[rng.integers(0, 4, 5000)]
    vals = rng.integers(0, 100, 5000).astype(np.int64)
    t = pa.table({"k": pa.array(keys.tolist(), pa.string()), "v": pa.array(vals)})
    ds = rd.from_blocks([t.slice(i * 500, 500) for i in range(10)])
    got = _canon(
        grouped_aggregate(ds, ["k"], [("v", "mean", "m"), ("v", "sum", "s")], num_buckets=3).to_pandas()
    )
    want = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k", as_index=False)
        .agg(m=("v", "mean"), s=("v", "sum"))
    )
    want = _canon(want)
    assert len(got) == len(want) == 4
    assert (got["k"] == want["k"]).all()
    assert np.allclose(got["m"], want["m"], rtol=0, atol=0)
    assert (got["s"].to_numpy() == want["s"].to_numpy()).all()
