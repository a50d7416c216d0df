"""Exact distributed PERCENTILE_DISC (stages/quantile.py) vs DuckDB's
percentile_disc WITHIN GROUP on the same data."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.quantile import exact_group_quantiles

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{SF_DIR}/documents.parquet'")
    con.execute(
        f"create view orders as select * from '{SF_DIR}/orders.parquet'")
    return con.execute(sql).df()


def test_grouped_quantiles_match_duckdb(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/orders.parquet")
    got = exact_group_quantiles(
        ds, "o_totalprice", [0.25, 0.5, 0.9], ["o_orderpriority"]
    ).to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    want = _duck(
        "SELECT o_orderpriority, "
        "percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25, "
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50, "
        "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90 "
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority")
    assert list(got["o_orderpriority"]) == list(want["o_orderpriority"])
    for c in ("p25", "p50", "p90"):
        np.testing.assert_array_equal(got[c].to_numpy(),
                                      want[c].to_numpy(), err_msg=c)


def test_quantile_text_lengths(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet")
    import pyarrow.compute as pc

    def add_len(b: pa.Table) -> pa.Table:
        return b.append_column(
            "tlen", pc.cast(pc.utf8_length(b.column("text")), pa.float64()))

    got = exact_group_quantiles(
        ds.map_batches(add_len, batch_format="pyarrow"),
        "tlen", [0.0, 0.5, 0.99], ["lang"]
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    want = _duck(
        "SELECT lang, "
        "CAST(MIN(LENGTH(text)) AS DOUBLE) AS p0, "
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY LENGTH(text)) AS DOUBLE) AS p50, "
        "CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY LENGTH(text)) AS DOUBLE) AS p99 "
        "FROM documents GROUP BY lang ORDER BY lang")
    assert list(got["lang"]) == list(want["lang"])
    for c in ("p0", "p50", "p99"):
        np.testing.assert_array_equal(got[c].to_numpy(),
                                      want[c].to_numpy(), err_msg=c)


def test_quantile_edge_cases(ray_session):
    import ray.data as rd

    # constant group (short-circuit), singleton group, nulls dropped
    tbl = pa.table({
        "g": ["a"] * 5 + ["b"] + ["c"] * 4,
        "v": [7.0, 7.0, 7.0, 7.0, 7.0, 3.5, 1.0, None, 2.0, 4.0],
    })
    ds = rd.from_arrow(tbl)
    got = exact_group_quantiles(ds, "v", [0.5, 1.0], ["g"]).to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    assert got["p50"].tolist() == [7.0, 3.5, 2.0]
    assert got["p100"].tolist() == [7.0, 3.5, 4.0]


def test_quantile_against_numpy_random(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(42)
    v = rng.normal(size=10_000)
    g = rng.integers(0, 7, size=10_000)
    ds = rd.from_arrow(pa.table({"g": g, "v": v}))
    got = exact_group_quantiles(ds, "v", [0.5], ["g"]).to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    for gi in range(7):
        seg = np.sort(v[g == gi])
        want = seg[int(np.ceil(0.5 * len(seg))) - 1]  # PERCENTILE_DISC
        assert got["p50"][gi] == want
