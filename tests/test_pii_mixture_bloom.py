"""Round-4e training-pipeline stages: PII redaction, domain mixture
reweighting, Bloom cross-corpus membership."""

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- PII

def test_redact_batch_placeholders_and_counts():
    from gdal_ray.stages.pii import redact_batch

    t = pa.table({"text": pa.array([
        "mail bob.smith+x@corp-mail.co.uk now",
        "server at 192.168.0.1 port",
        "call +1 415-555-0199 or 415 555 0100",
        "order 12345678 shipped",
        "clean text only",
        "multi a@b.io c@d.org 10.0.0.1 999999",
    ])})
    r = redact_batch(t)
    red = r.column("redacted").to_pylist()
    assert red[0] == "mail <EMAIL> now"
    assert red[1] == "server at <IP> port"
    assert red[2] == "call <PHONE> or <PHONE>"
    assert red[3] == "order <NUM> shipped"
    assert red[4] == "clean text only"
    assert red[5] == "multi <EMAIL> <EMAIL> <IP> <NUM>"
    assert r.column("n_email").to_pylist() == [1, 0, 0, 0, 0, 2]
    assert r.column("n_ip").to_pylist() == [0, 1, 0, 0, 0, 1]
    assert r.column("n_phone").to_pylist() == [0, 0, 2, 0, 0, 0]
    assert r.column("n_num").to_pylist() == [0, 0, 0, 1, 0, 1]


def test_redact_staged_counts_no_double_count():
    """Digits inside an email/IP must not re-count as phone/num."""
    from gdal_ray.stages.pii import redact_batch

    t = pa.table({"text": pa.array(["id 1234567 u1234567@ex.com 10.1.2.3"])})
    r = redact_batch(t)
    assert r.column("redacted").to_pylist() == ["id <NUM> <EMAIL> <IP>"]
    assert r.column("n_email").to_pylist() == [1]
    assert r.column("n_ip").to_pylist() == [1]
    assert r.column("n_num").to_pylist() == [1]


def test_sql_redact_exprs_matches_arrow():
    """The rendered DuckDB SQL is the exact twin of the Arrow kernels."""
    duckdb = pytest.importorskip("duckdb")
    from gdal_ray.stages.pii import redact_batch, sql_redact_exprs

    texts = ["a@b.co 10.0.0.1 9999999 415-555-0100 x", "none", "+44 20 7946 0958"]
    t = pa.table({"text": pa.array(texts)})
    r = redact_batch(t)
    red, counts = sql_redact_exprs("text")
    q = (f"SELECT {', '.join(counts)}, {red} AS redacted FROM t")
    con = duckdb.connect()
    con.register("t", t)
    got = con.execute(q).fetch_arrow_table()
    for c in ("n_email", "n_ip", "n_phone", "n_num", "redacted"):
        assert got.column(c).to_pylist() == r.column(c).to_pylist(), c


# ---------------------------------------------------------------- mixture

def _docs_table():
    rng = np.random.RandomState(7)
    rows = []
    for i in range(300):
        src = ["web", "code", "book"][i % 3]
        # skewed token budgets: web docs 3x longer
        n = {"web": 30, "code": 10, "book": 5}[src] + int(rng.randint(0, 4))
        rows.append({"doc_id": i, "source": src,
                     "text": " ".join(f"w{j}" for j in range(n))})
    return pa.Table.from_pylist(rows)


def test_mixture_weights_equalize_tokens(ray_session):
    import ray.data as rd

    from gdal_ray.stages.mixture import (PPM, apply_mixture, mixture_weights,
                                         source_token_counts)

    t = _docs_table()
    ds = rd.from_arrow(t)
    counts = pa.Table.from_pylist(source_token_counts(ds).take_all())
    # exact: n_tokens per source == whitespace token count
    toks = {}
    for r in t.to_pylist():
        toks[r["source"]] = toks.get(r["source"], 0) + len(r["text"].split())
    got = dict(zip(counts.column("source").to_pylist(),
                   counts.column("n_tokens").to_pylist()))
    assert got == toks

    w = mixture_weights(counts)
    total, S = sum(toks.values()), len(toks)
    for s, ppm in w.items():
        expect = (2 * total * PPM + S * toks[s]) // (2 * S * toks[s])
        assert ppm == expect
    # under-represented sources get weight > 1e6, over-represented < 1e6
    assert w["book"] > PPM > w["web"]

    out = pa.Table.from_pylist(apply_mixture(ds, w).take_all())
    # expected post-mix token budget per source lands within one doc of
    # the uniform target (fractional epochs resolved per-doc)
    ncop = dict()
    for r in out.to_pylist():
        ncop.setdefault(r["source"], []).append(r["n_copies"])
        assert r["weight_ppm"] == w[r["source"]]
    for s, copies in ncop.items():
        lo, hi = w[s] // PPM, w[s] // PPM + 1
        assert set(copies) <= {lo, hi}


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_fp_sweep(ray_session):
    import ray.data as rd

    from gdal_ray.stages.bloom import BloomFlag, bloom_build
    import ray as _ray

    members = pa.table({"text": pa.array([f"member-{i}-xyz" for i in range(1000)])})
    bitmap = bloom_build(rd.from_arrow(members))
    flag = BloomFlag(_ray.put(bitmap))
    got = flag(members)
    assert got.column("is_dup").to_pylist() == [1] * 1000

    probes = pa.table({"text": pa.array([f"absent-{i}-abc" for i in range(100000)])})
    fp = sum(flag(probes).column("is_dup").to_pylist())
    # m=2^23, k=4, n=1000 -> per-probe FP ~ 5e-14; 1e5 probes -> 0
    assert fp == 0


def test_bloom_small_filter_does_fire():
    """With a deliberately tiny bitmap the FP path must actually trip —
    proves the flag stage reads the bitmap, not an exact set."""
    import ray as _ray
    import ray.data as rd

    from gdal_ray.stages.bloom import BloomFlag, bloom_build

    members = rd.from_arrow(pa.table(
        {"text": pa.array([f"m{i}" for i in range(500)])}))
    bitmap = bloom_build(members, m_bits=1 << 10)
    flag = BloomFlag(_ray.put(bitmap), m_bits=1 << 10)
    probes = pa.table({"text": pa.array([f"p{i}" for i in range(5000)])})
    fp = sum(flag(probes).column("is_dup").to_pylist())
    assert fp > 0
