"""Driver-mirror parity check at sf0.01: run queries() vs oracle_sql() via
DuckDB, report pass/rows/schema/hash per query. Usage:
  python /tmp/parity01.py [name ...]   # default: all oracle-backed
"""
import sys, time, json, traceback

import duckdb
import numpy as np
import pandas as pd
import ray

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _to_pandas(result):
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e
    q, o = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or [n for n in q if n in o]
    results = {}
    for name in names:
        t0 = time.time()
        try:
            got = _canon(_to_pandas(q[name](SF_DIR)))
            sql = o.get(name)
            if sql is None:
                results[name] = {"status": "rows_only", "rows": len(got)}
                continue
            want = _canon(con.execute(sql).df())
            schema_ok = list(got.columns) == list(want.columns)
            rows_ok = len(got) == len(want)
            hash_ok = schema_ok and rows_ok
            detail = ""
            if not schema_ok:
                detail = f"cols {list(got.columns)} vs {list(want.columns)}"
            elif not rows_ok:
                detail = f"rows {len(got)} vs {len(want)}"
            else:
                for c in got.columns:
                    g, w = got[c].to_numpy(), want[c].to_numpy()
                    if g.dtype.kind != w.dtype.kind:
                        hash_ok = False
                        detail = f"{c}: dtype {g.dtype} vs {w.dtype}"
                        break
                    if g.dtype.kind == "f" or w.dtype.kind == "f":
                        if not np.allclose(g.astype(np.float64), w.astype(np.float64), rtol=0, atol=0):
                            hash_ok = False
                            detail = f"{c}: float mismatch"
                            break
                    else:
                        if not (g.astype(object) == w.astype(object)).all():
                            hash_ok = False
                            detail = f"{c}: value mismatch"
                            break
            status = "PASS" if hash_ok else "FAIL"
            results[name] = {"status": status, "rows": len(got),
                             "sec": round(time.time() - t0, 2), "detail": detail}
        except Exception as ex:
            results[name] = {"status": "ERROR", "detail": f"{type(ex).__name__}: {ex}",
                             "tb": traceback.format_exc()[-800:]}
        r = results[name]
        print(f"{name:24s} {r['status']:9s} {r.get('rows','')} {r.get('detail','')[:120]}", flush=True)
    n_pass = sum(1 for r in results.values() if r["status"] == "PASS")
    print(f"\n{n_pass}/{len(names)} PASS")
    bad = {k: v for k, v in results.items() if v["status"] not in ("PASS", "rows_only")}
    if bad:
        print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != 'tb'} for k, v in bad.items()}, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
