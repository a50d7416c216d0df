"""SQL engine (gdal_ray/sql.py, the swq subset) vs DuckDB on the same
parquet tables — identical SQL string fed to both."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["orders", "customer", "documents", "events", "lineitem", "nation"]


@pytest.fixture(scope="module")
def ray_tables(ray_session):
    import ray.data as rd

    return {t: rd.read_parquet(f"{SF_DIR}/{t}.parquet") for t in TABLES}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame, sort=True) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if sort:
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


QUERIES = [
    # projection + scalar funcs + where
    "SELECT o_orderkey, o_totalprice * 2 AS dbl FROM orders WHERE o_totalprice > 100000",
    "SELECT o_orderkey FROM orders WHERE o_orderpriority LIKE '1%'",
    "SELECT o_orderkey FROM orders WHERE o_orderpriority NOT LIKE '%URGENT%'",
    "SELECT c_custkey, UPPER(c_mktsegment) AS seg FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')",
    "SELECT c_custkey FROM customer WHERE c_acctbal BETWEEN 0 AND 1000",
    "SELECT doc_id, SUBSTR(text, 1, 10) AS head10 FROM documents WHERE doc_id < 50",
    "SELECT doc_id, LENGTH(text) AS n FROM documents WHERE doc_id % 7 = 0 AND doc_id < 200",
    "SELECT o_orderkey, CAST(o_totalprice AS BIGINT) AS cents FROM orders WHERE o_orderkey < 300",
    "SELECT c_custkey, CONCAT(c_mktsegment, '-', c_name) AS tag FROM customer WHERE c_custkey < 20",
    "SELECT doc_id FROM documents WHERE NOT (doc_id < 450) AND lang = 'en'",
    # aggregates
    "SELECT o_orderpriority, COUNT(*) AS n, SUM(CAST(o_totalprice AS BIGINT)) AS s FROM orders GROUP BY o_orderpriority",
    "SELECT lang, COUNT(*) AS n, MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents GROUP BY lang",
    "SELECT event_type, AVG(value) AS m FROM events GROUP BY event_type",
    "SELECT COUNT(*) AS n, SUM(doc_id) AS s FROM documents WHERE doc_id < 123",
    # order by + limit
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity >= 49 ORDER BY l_orderkey, l_linenumber LIMIT 40",
    # joins (secondary keys unique → OGR first-match lookup ≡ SQL join)
    "SELECT o_orderkey, c_name FROM orders JOIN customer ON orders.o_custkey = customer.c_custkey WHERE o_orderkey < 100",
    "SELECT o_orderkey, n_name FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON customer.c_nationkey = nation.n_nationkey WHERE o_orderkey < 200",
    "SELECT doc_id, c_name FROM documents LEFT JOIN customer ON doc_id = c_custkey WHERE doc_id < 400 AND c_name IS NOT NULL",
    "SELECT n_name, COUNT(*) AS n FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
    "SELECT n_name, o_orderkey FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey ORDER BY o_orderkey LIMIT 30",
    # OFFSET (swq_parser.y:1137), UNION ALL (:840), * EXCEPT (:861)
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5",
    "SELECT doc_id FROM documents WHERE doc_id < 5 UNION ALL SELECT doc_id FROM documents WHERE doc_id >= 495 AND doc_id < 500",
    "SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 10 UNION ALL SELECT c_custkey AS k FROM customer WHERE c_custkey < 10 UNION ALL SELECT doc_id AS k FROM documents WHERE doc_id < 10",
    "SELECT * EXCLUDE (source, lang) FROM documents WHERE doc_id < 30",
    # COUNT(DISTINCT ...) — SWQM_DISTINCT_LIST (ogr/ogr_swq.h:322)
    "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n FROM orders GROUP BY o_orderpriority",
    "SELECT COUNT(DISTINCT lang) AS n FROM documents",
    "SELECT lang, COUNT(DISTINCT source) AS n FROM documents WHERE doc_id < 300 GROUP BY lang",
    # SELECT DISTINCT (SWQM_DISTINCT_LIST, round 4 full-select-list form)
    "SELECT DISTINCT lang FROM documents",
    "SELECT DISTINCT lang, source FROM documents WHERE doc_id < 250",
    "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority LIMIT 3",
    # HAVING — aggregates rewritten to computed columns, hidden aggs allowed
    "SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 40",
    "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang HAVING MIN(doc_id) < 10 AND COUNT(*) >= 5",
    "SELECT o_orderpriority, SUM(CAST(o_totalprice AS BIGINT)) AS s FROM orders GROUP BY o_orderpriority HAVING SUM(CAST(o_totalprice AS BIGINT)) > 1000000",
    # CASE WHEN — searched case over pc.if_else chains
    "SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'fizz' WHEN doc_id % 5 = 0 THEN 'buzz' ELSE 'n' END AS fb FROM documents WHERE doc_id < 60",
    "SELECT CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS sz, COUNT(*) AS n FROM orders GROUP BY sz",
    "SELECT o_orderpriority, SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS nf FROM orders GROUP BY o_orderpriority",
    "SELECT doc_id, CASE WHEN lang = 'en' THEN 1 END AS is_en FROM documents WHERE doc_id < 40",
    # window functions — fn() OVER (PARTITION BY ... ORDER BY ...), one
    # bucketed shuffle per distinct clause (stages/window.py)
    "SELECT o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey",
    "SELECT o_orderkey, RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rnk, DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drnk FROM orders ORDER BY o_orderkey",
    "SELECT o_orderkey, CAST(SUM(CAST(o_totalprice AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS rs, COUNT(*) OVER (PARTITION BY o_custkey) AS n FROM orders ORDER BY o_orderkey",
    "SELECT o_orderkey, AVG(o_totalprice) OVER (PARTITION BY o_orderpriority) AS m, MIN(o_totalprice) OVER (PARTITION BY o_orderpriority) AS lo, MAX(o_totalprice) OVER (PARTITION BY o_orderpriority) AS hi FROM orders WHERE o_orderkey < 1500 ORDER BY o_orderkey",
    # running MIN/MAX (peer-inclusive RANGE frame, doubling prefix scan)
    "SELECT o_orderkey, MIN(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rmin, MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rmax FROM orders ORDER BY o_orderkey",
    "SELECT o_orderkey, MIN(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS pmin FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey",
    "SELECT o_orderkey, MAX(o_totalprice) OVER (ORDER BY o_orderkey) AS gmax FROM orders WHERE o_orderkey < 2500 ORDER BY o_orderkey",
    # window over a JOINed view (partition key from the joined side)
    "SELECT o_orderkey, c_name, ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS seg_rank FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_orderkey < 2000 ORDER BY o_orderkey",
    "SELECT o_orderkey, COALESCE(LAG(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), -1.0) AS lg, COALESCE(LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 0) AS ld FROM orders ORDER BY o_orderkey",
    # global window (no PARTITION BY) + window arg expression
    "SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn, CAST(SUM(CAST(o_totalprice AS BIGINT) * 2) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rs2 FROM orders WHERE o_orderkey < 800 ORDER BY o_orderkey",
    # window result inside an outer expression, plus * with a window
    "SELECT o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) * 10 AS rn10 FROM orders WHERE o_orderkey < 700 ORDER BY o_orderkey",
    "SELECT *, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM documents WHERE doc_id < 25 ORDER BY doc_id",
    # NTILE / FIRST_VALUE / LAST_VALUE (LAST_VALUE on the ANSI default
    # peer-inclusive frame; tie-heavy ORDER BY keys exercise the peers)
    "SELECT o_orderkey, NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS q4, NTILE(7) OVER (ORDER BY o_orderkey) AS q7 FROM orders WHERE o_orderkey < 900 ORDER BY o_orderkey",
    # LAST_VALUE only over values functionally determined by the peer
    # group (which physical row is last among peers is engine-unspecified)
    "SELECT o_orderkey, FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS fv, LAST_VALUE(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS lv, LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS lk FROM orders ORDER BY o_orderkey",
    "SELECT doc_id, NTILE(3) OVER (PARTITION BY lang ORDER BY doc_id) AS t FROM documents WHERE doc_id < 120 ORDER BY doc_id",
    # set operations: UNION (distinct) / INTERSECT / EXCEPT, ANSI
    # precedence (INTERSECT binds tighter), trailing ORDER BY/LIMIT
    "SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F' UNION SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O' ORDER BY k",
    "SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F' INTERSECT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000 ORDER BY k",
    "SELECT o_custkey AS k FROM orders EXCEPT SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY k",
    "SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F' UNION SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P' INTERSECT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000 EXCEPT SELECT o_custkey AS k FROM orders WHERE o_custkey % 10 = 3 ORDER BY k LIMIT 500",
    # bag-semantics set ops (multiplicity algebra, one exchange)
    "SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F' INTERSECT ALL SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000 ORDER BY k",
    "SELECT o_custkey AS k FROM orders EXCEPT ALL SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F' ORDER BY k",
    "SELECT lang AS g FROM documents UNION ALL SELECT o_orderstatus AS g FROM orders WHERE o_orderkey < 50 INTERSECT ALL SELECT lang AS g FROM documents WHERE doc_id % 2 = 0 ORDER BY g",
    # CTEs (chained: second references the first)
    "WITH f AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F') SELECT o_custkey, COUNT(*) AS n FROM f GROUP BY o_custkey ORDER BY o_custkey LIMIT 50",
    "WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000), b AS (SELECT k FROM a WHERE k % 2 = 0) SELECT k, COUNT(*) AS n FROM b GROUP BY k ORDER BY k",
    # uncorrelated subqueries: IN / NOT IN / scalar / EXISTS
    "SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') ORDER BY o_orderkey LIMIT 100",
    "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') ORDER BY c_custkey",
    "SELECT o_orderkey FROM orders WHERE o_totalprice > (SELECT MAX(c_acctbal) FROM customer) AND o_orderkey < 500 ORDER BY o_orderkey",
    "SELECT COUNT(*) AS n FROM orders WHERE EXISTS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) AND o_orderstatus = 'O'",
    "SELECT COUNT(*) AS n FROM orders WHERE NOT EXISTS (SELECT c_custkey FROM customer WHERE c_acctbal > 999999999)",
    # ROWS-frame moving aggregates (order keys form a total order —
    # ROWS frames are order-sensitive)
    "SELECT o_orderkey, CAST(SUM(CAST(o_totalprice AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mv3 FROM orders ORDER BY o_orderkey",
    "SELECT o_orderkey, MIN(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin, MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS wmax, AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma5 FROM orders ORDER BY o_orderkey",
    "SELECT event_id, COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS wn, MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmax FROM events ORDER BY event_id",
    "SELECT o_orderkey, MIN(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN 0 PRECEDING AND CURRENT ROW) AS selfv FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey",
    # FOLLOWING bounds (centered / forward / unbounded-tail windows)
    "SELECT o_orderkey, CAST(SUM(CAST(o_totalprice AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS c5 FROM orders ORDER BY o_orderkey",
    "SELECT o_orderkey, MIN(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fmin, MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 1 PRECEDING AND UNBOUNDED FOLLOWING) AS tmax FROM orders ORDER BY o_orderkey",
    "SELECT o_orderkey, COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND 5 FOLLOWING) AS cu FROM orders WHERE o_orderkey < 900 ORDER BY o_orderkey",
    # numeric RANGE frames (value window [cur-k, cur], peer-inclusive)
    "SELECT o_orderkey, CAST(SUM(CAST(o_totalprice AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum FROM orders ORDER BY o_orderkey",
    "SELECT event_id, MAX(value) OVER (PARTITION BY user_id ORDER BY value RANGE BETWEEN 0.5 PRECEDING AND CURRENT ROW) AS vmax, COUNT(*) OVER (PARTITION BY user_id ORDER BY value RANGE BETWEEN 1.5 PRECEDING AND CURRENT ROW) AS vn FROM events ORDER BY event_id",
    "SELECT o_orderkey, COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_custkey RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS cn, MIN(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_custkey RANGE BETWEEN 25 PRECEDING AND CURRENT ROW) AS mn FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey",
    # exact math functions (integer/sign semantics match DuckDB exactly)
    "SELECT o_orderkey, GREATEST(o_orderkey, o_custkey * 10) AS g, LEAST(o_orderkey, o_custkey * 10) AS l, SIGN(o_custkey - 75) AS s FROM orders WHERE o_orderkey < 300",
    # string-function breadth (DuckDB-compatible names)
    "SELECT doc_id, TRIM(SUBSTR(text, 1, 12)) AS t, REVERSE(lang) AS r, REPLACE(lang, 'e', 'E') AS rep FROM documents WHERE doc_id < 40",
    "SELECT doc_id, CONTAINS(text, 'the') AS c, STARTS_WITH(lang, 'e') AS sw, STRPOS(text, 'a') AS sp FROM documents WHERE doc_id < 60",
    "SELECT doc_id, LEFT(text, 8) AS l8, RIGHT(lang, 1) AS r1, LPAD(lang, 6, '_') AS lp, RPAD(lang, 5, '.') AS rp FROM documents WHERE doc_id < 50",
    "SELECT doc_id, SPLIT_PART(text, ' ', 2) AS w2, SPLIT_PART(text, ' ', 200) AS w200 FROM documents WHERE doc_id < 50",
    "SELECT doc_id, REGEXP_MATCHES(text, '[0-9]{2,}') AS hasnum FROM documents WHERE doc_id < 80",
    # datetime breadth (Arrow temporal kernels)
    "SELECT event_id, YEAR(ts) AS y, MONTH(ts) AS mo, DAY(ts) AS d, HOUR(ts) AS h, MINUTE(ts) AS mi, SECOND(ts) AS s FROM events WHERE event_id < 100",
    "SELECT event_id, DATE_TRUNC('hour', ts) AS th, DATE_TRUNC('day', ts) AS td FROM events WHERE event_id < 100",
    "SELECT DATE_TRUNC('month', ts) AS m, COUNT(*) AS n FROM events GROUP BY m ORDER BY m",
    # aggregate FILTER clause + GROUP BY ROLLUP (no ORDER BY on the
    # nullable rolled-up keys — Ray's sample sort can't compare None)
    "SELECT o_orderpriority, COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS nf, CAST(SUM(CAST(o_totalprice AS BIGINT)) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS big_cents, MIN(o_orderkey) FILTER (WHERE o_custkey % 2 = 0) AS min_even FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS BIGINT)) AS BIGINT) AS cents FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)",
    "SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY ROLLUP (lang, source) HAVING COUNT(*) > 3",
    "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)",
    # ORDER BY over nullable rolled-up keys (null-safe distributed sort,
    # NULLS LAST both engines) with a LIMIT that cuts inside the order
    "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus) ORDER BY o_orderpriority, o_orderstatus LIMIT 12",
    # STRING_AGG with ORDER BY (ordered grouped concatenation)
    "SELECT lang, STRING_AGG(source, '|' ORDER BY doc_id) AS srcs FROM documents WHERE doc_id < 60 GROUP BY lang ORDER BY lang",
    "SELECT o_orderpriority, STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey DESC) AS keys FROM orders WHERE o_orderkey < 200 GROUP BY o_orderpriority ORDER BY o_orderpriority",
    # PERCENTILE_DISC ... WITHIN GROUP (exact 3-pass histogram selection)
    "SELECT lang, CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY LENGTH(text)) AS DOUBLE) AS p50, CAST(PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY LENGTH(text)) AS DOUBLE) AS p95 FROM documents GROUP BY lang ORDER BY lang",
    "SELECT o_orderpriority, CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS q1, CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_custkey) AS DOUBLE) AS medcust FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    # PERCENT_RANK / CUME_DIST
    "SELECT o_orderkey, PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS pr, CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS cd FROM orders ORDER BY o_orderkey",
    # QUALIFY (post-window filter; alias references substituted)
    "SELECT o_custkey, o_orderkey, o_totalprice FROM orders QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2 ORDER BY o_custkey, o_orderkey",
    "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn FROM orders WHERE o_orderstatus = 'F' QUALIFY rn <= 3 OR ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) = 1 ORDER BY o_custkey, o_orderkey",
    # ASOF JOIN (DuckDB syntax -> sort-merge asof operator)
    "SELECT event_id, user_id, ts, o_orderdate FROM events ASOF JOIN orders ON user_id = o_custkey AND ts >= o_orderdate ORDER BY event_id",
    "SELECT event_id, o_orderdate FROM events ASOF JOIN orders ON user_id = o_custkey AND ts > o_orderdate WHERE event_id % 3 = 0 ORDER BY event_id",
    # correlated [NOT] EXISTS -> broadcast semi/anti-join decorrelation
    "SELECT c_custkey FROM customer WHERE EXISTS (SELECT o_orderkey FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000) ORDER BY c_custkey",
    "SELECT c_custkey, c_mktsegment FROM customer WHERE NOT EXISTS (SELECT o_orderkey FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000) AND c_custkey < 50 ORDER BY c_custkey",
    "SELECT COUNT(*) AS n FROM orders WHERE EXISTS (SELECT c_custkey FROM customer WHERE customer.c_custkey = orders.o_custkey AND c_mktsegment = 'BUILDING')",
]


@pytest.mark.parametrize("sql", QUERIES, ids=range(len(QUERIES)))
def test_sql_matches_duckdb(ray_tables, con, sql):
    from gdal_ray.sql import execute_sql

    got = execute_sql(sql, ray_tables).to_pandas()
    want = con.execute(sql).df()
    ordered = "ORDER BY" in sql
    got_c, want_c = _canon(got, sort=not ordered), _canon(want, sort=not ordered)
    assert list(got_c.columns) == list(want_c.columns)
    assert len(got_c) == len(want_c), sql
    for c in got_c.columns:
        g, w = got_c[c].to_numpy(), want_c[c].to_numpy()
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(g.astype(float), w.astype(float), rtol=1e-12,
                               atol=0, equal_nan=True), (sql, c)
        else:
            assert (g.astype(object) == w.astype(object)).all(), (sql, c)


STDDEV_QUERIES = [
    # swq STDDEV_POP/STDDEV_SAMP (ogr/ogr_swq.h:326-334); compared at
    # 1e-9 — our (Σx, Σx²) decomposition vs DuckDB's single-pass variance
    "SELECT event_type, STDDEV_POP(value) AS sd FROM events GROUP BY event_type",
    "SELECT STDDEV_SAMP(o_totalprice) AS sd, COUNT(*) AS n FROM orders",
    "SELECT lang, STDDEV_SAMP(doc_id) AS sd, AVG(doc_id) AS m FROM documents GROUP BY lang",
]


@pytest.mark.parametrize("sql", STDDEV_QUERIES, ids=range(len(STDDEV_QUERIES)))
def test_sql_stddev_matches_duckdb(ray_tables, con, sql):
    from gdal_ray.sql import execute_sql

    got = _canon(execute_sql(sql, ray_tables).to_pandas())
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(g.astype(float), w.astype(float), rtol=1e-9), (sql, c)
        else:
            assert (g.astype(object) == w.astype(object)).all(), (sql, c)


def test_sql_count_distinct_guard(ray_tables):
    from gdal_ray.sql import execute_sql

    with pytest.raises(ValueError, match="only aggregate"):
        execute_sql(
            "SELECT COUNT(DISTINCT lang) AS a, COUNT(*) AS b FROM documents",
            ray_tables,
        )


def test_sql_hstore_get_value(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.sql import execute_sql

    t = pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "tags": pa.array(
            ['a=>1, b=>two', '"a"=>"x y", c=>3', 'b=>only', None],
            pa.string()),
    })
    out = execute_sql(
        "SELECT k, HSTORE_GET_VALUE(tags, 'a') AS a, "
        "HSTORE_GET_VALUE(tags, 'b') AS b FROM tt",
        {"tt": rd.from_arrow(t)},
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["a"]) == ["1", "x y", None, None]
    assert list(out["b"]) == ["two", None, "only", None]


def test_sql_window_guards(ray_tables):
    from gdal_ray.sql import execute_sql

    with pytest.raises(NotImplementedError, match="GROUP BY"):
        execute_sql(
            "SELECT o_orderpriority, COUNT(*) AS n, ROW_NUMBER() OVER "
            "(ORDER BY o_orderpriority) AS rn FROM orders "
            "GROUP BY o_orderpriority", ray_tables,
        )
    with pytest.raises(ValueError, match="window function"):
        execute_sql("SELECT UPPER(o_orderpriority) OVER "
                    "(ORDER BY o_orderkey) AS u FROM orders", ray_tables)
    with pytest.raises(ValueError, match="no arguments"):
        execute_sql("SELECT ROW_NUMBER(o_orderkey) OVER "
                    "(ORDER BY o_orderkey) AS rn FROM orders", ray_tables)
    # empty input: 0 rows out (schema-less empty — Ray groupby emits no
    # blocks when no group exists; same as every group-lowered query)
    out = execute_sql(
        "SELECT o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderkey) AS rn FROM orders WHERE o_orderkey < 0",
        ray_tables)
    assert out.count() == 0


def test_sql_parse_errors():
    from gdal_ray.sql import parse_select

    with pytest.raises(ValueError):
        parse_select("SELECT FROM t")
    with pytest.raises(ValueError):
        parse_select("SELECT a b c FROM t")
    with pytest.raises(ValueError):
        parse_select("SELECT a FROM t WHERE x ==")
    with pytest.raises(ValueError):  # non-equality ON (swq subset)
        parse_select("SELECT a FROM t JOIN u ON t.a < u.b")
    with pytest.raises(ValueError):  # dangling NOT before comparison
        parse_select("SELECT a FROM t WHERE a NOT = 5")


def test_sql_join_errors(ray_tables):
    from gdal_ray.sql import execute_sql

    with pytest.raises(ValueError, match="ambiguous"):
        execute_sql(
            "SELECT c_name FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN customer2 ON o_custkey = c_custkey",
            {**ray_tables, "customer2": ray_tables["customer"]},
        )
    with pytest.raises(ValueError, match="unknown table"):
        execute_sql(
            "SELECT o_orderkey FROM orders JOIN nosuch ON o_custkey = x",
            ray_tables,
        )


def test_sql_transcendental_functions(ray_tables, con):
    """Float transcendentals compared tolerantly (libm reprs may differ
    in the last ulp across engines)."""
    from gdal_ray.sql import execute_sql

    sql = ("SELECT o_orderkey, SQRT(o_totalprice) AS r, LN(o_totalprice) "
           "AS ll, EXP(o_totalprice / 1000000.0) AS e, "
           "POWER(o_totalprice, 0.25) AS p, SIN(o_totalprice / 1000.0) "
           "AS sn, ATAN2(o_totalprice, 12345.0) AS at "
           "FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey")
    got = execute_sql(sql, ray_tables).to_pandas()
    want = con.execute(sql).df()
    for c in ("r", "ll", "e", "p", "sn", "at"):
        np.testing.assert_allclose(got[c], want[c], rtol=1e-12)


def test_ogr_special_fields(ray_session):
    """OGR SQL special fields (ogr_gensql.cpp): OGR_GEOMETRY /
    OGR_GEOM_WKT / OGR_GEOM_AREA computed lazily over the wkb column."""
    import ray.data as rd

    from gdal_ray.geometry.predicates import polygon_area
    from gdal_ray.geometry.wkb import polygon_parts
    from gdal_ray.sql import execute_sql
    from gdal_ray.synth import make_polygon_table

    tbl = make_polygon_table(12)
    ds = rd.from_arrow(tbl)
    out = execute_sql(
        "SELECT poly_id, OGR_GEOMETRY AS gtype, OGR_GEOM_AREA AS area "
        "FROM polys WHERE OGR_GEOM_AREA > 0 ORDER BY poly_id",
        {"polys": ds}).to_pandas()
    assert len(out) == 12
    assert set(out["gtype"]) <= {"POLYGON", "MULTIPOLYGON"}
    by_id = dict(zip(tbl.column("poly_id").to_pylist(),
                     tbl.column("wkb").to_pylist()))
    for _, row in out.iterrows():
        want = sum(polygon_area(r) for r in polygon_parts(by_id[row.poly_id]))
        assert row.area == pytest.approx(want, rel=1e-12)
    # WKT round-trips through the WKT codec
    out2 = execute_sql(
        "SELECT poly_id, OGR_GEOM_WKT AS wkt FROM polys "
        "ORDER BY poly_id LIMIT 3", {"polys": ds}).to_pandas()
    from gdal_ray.geometry.wkt import wkt_to_wkb

    for _, row in out2.iterrows():
        assert wkt_to_wkb(row.wkt) is not None
        assert row.wkt.startswith(("POLYGON", "MULTIPOLYGON"))


def test_unnest_and_from_subquery(ray_session):
    """UNNEST in the select list + FROM (SELECT ...) derived tables:
    identical strings vs DuckDB on the documents table."""
    import duckdb
    import ray.data as rd

    from gdal_ray.sql import execute_sql

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    sql = ("SELECT w AS word, COUNT(*) AS n FROM "
           "(SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w "
           "FROM documents) WHERE w <> '' GROUP BY w ORDER BY word")
    mine = execute_sql(sql, {"documents": docs}).to_pandas()
    ref = con.execute(sql).df()
    assert len(mine) == len(ref) > 0
    assert (mine["word"].to_numpy() == ref["word"].to_numpy()).all()
    assert (mine["n"].to_numpy() == ref["n"].to_numpy()).all()
    # sibling columns repeat per element
    out = execute_sql(
        "SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents WHERE doc_id = 0", {"documents": docs}).to_pandas()
    first = docs.take(1)[0]
    assert list(out["tok"]) == first["text"].split(" ")
    assert (out["doc_id"] == 0).all()
    # DISTINCT over the unnested stream
    d1 = execute_sql(
        "SELECT DISTINCT unnest(regexp_split_to_array(text, '\\s+')) AS w "
        "FROM documents ORDER BY w", {"documents": docs}).to_pandas()
    d2 = con.execute(
        "SELECT DISTINCT unnest(regexp_split_to_array(text, '\\s+')) AS w "
        "FROM documents ORDER BY w").df()
    assert list(d1["w"]) == list(d2["w"])
