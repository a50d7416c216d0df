"""EWMA (stages/timeseries.py): affine doubling scan vs the recursive
definition and pandas ewm(adjust=False), with per-partition resets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from gdal_ray.stages.timeseries import _affine_scan, ewma, ewma_in_table

SF_DIR = "/root/testdata/sf0.001"


def _ref_ewma(x, alpha):
    y = np.empty(len(x))
    for i, v in enumerate(x):
        y[i] = v if i == 0 else (1 - alpha) * y[i - 1] + alpha * v
    return y


@settings(max_examples=80, deadline=None)
@given(st.lists(st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
                          width=32), min_size=1, max_size=120),
       st.floats(min_value=0.01, max_value=0.99))
def test_affine_scan_matches_recursive(vals, alpha):
    x = np.asarray(vals, dtype=np.float64)
    m = np.full(len(x), 1 - alpha)
    a = alpha * x
    m[0] = 0.0
    a[0] = x[0]
    got = _affine_scan(m, a)
    np.testing.assert_allclose(got, _ref_ewma(x, alpha), rtol=1e-9,
                               atol=1e-9)


def test_ewma_table_partition_resets():
    rng = np.random.default_rng(4)
    g = np.repeat(["a", "b", "c"], [7, 1, 12])
    x = rng.normal(size=len(g)) * 10
    t = pa.table({"g": g, "o": np.arange(len(g)), "x": x})
    out = ewma_in_table(t, value="x", alpha=0.3, partition=["g"],
                        order=["o"]).to_pandas()
    for key in ("a", "b", "c"):
        seg = out[out.g == key]
        np.testing.assert_allclose(seg["ewma"].to_numpy(),
                                   _ref_ewma(seg["x"].to_numpy(), 0.3),
                                   rtol=1e-9)
    # pandas cross-check (adjust=False == the recursive definition)
    want = pd.Series(x).groupby(g).transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean())
    np.testing.assert_allclose(out["ewma"].to_numpy(), want.to_numpy(),
                               rtol=1e-9)


def test_ewma_distributed(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet").repartition(6)
    rows = ewma(ds, value="value", alpha=0.2, partition=["user_id"],
                order=["ts", "event_id"]).take_all()
    df = pd.DataFrame(rows).sort_values(["user_id", "ts", "event_id"])
    import pyarrow.parquet as pq

    raw = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas() \
        .sort_values(["user_id", "ts", "event_id"])
    want = raw.groupby("user_id")["value"].transform(
        lambda s: s.ewm(alpha=0.2, adjust=False).mean())
    got = df.set_index(["user_id", "ts", "event_id"])["ewma"]
    want.index = raw.set_index(["user_id", "ts", "event_id"]).index
    np.testing.assert_allclose(
        got.to_numpy(),
        want.loc[got.index].to_numpy(), rtol=1e-9)
