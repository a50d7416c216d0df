"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.001 and compare against its oracle_sql() via DuckDB — row count, column
names, and order-insensitive values."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return con


def _pairs():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o.get(name)) for name in q]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(ray_session, oracle_con, name, fn, sql):
    got = _canon(_to_pandas(fn(SF_DIR)))
    assert len(got) >= 0  # rows-only smoke for oracle-less queries
    if sql is None:
        assert got is not None
        return
    want = _canon(oracle_con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (list(got.columns), list(want.columns))
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        # The driver's value hash is dtype-sensitive (int64 vs float64 hash
        # differently even for identical values) — mirror that strictness.
        assert g.dtype.kind == w.dtype.kind, f"{name}.{c}: dtype {g.dtype} != oracle {w.dtype}"
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(g.astype(np.float64), w.astype(np.float64), rtol=0, atol=0), f"{name}.{c}"
        else:
            assert (g.astype(object) == w.astype(object)).all(), f"{name}.{c}"
