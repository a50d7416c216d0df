"""Domain mixture reweighting — the "data mixing" stage of an LLM
pretraining pipeline (the DoReMi / Pile-style domain-weights shape):
given a corpus partitioned by a source/domain column, compute per-domain
sampling weights that equalize the TOKEN budget across domains, then
materialize a deterministic per-document repeat count (epochs per
domain, fractional part resolved by a reproducible hash Bernoulli).

Everything is integer arithmetic so a SQL twin reproduces it bit-for-bit:

  weight_ppm(s) = round_half_up( total_tokens * 1e6 / (S * tokens_s) )
                = (total*1e6*2 + S*tokens_s) // (2*S*tokens_s)
  n_copies(doc) = weight_ppm // 1e6
                + [ (doc_id * 2654435761) % 1e6 < weight_ppm % 1e6 ]

Execution shape: token counts are one vectorized RE2 kernel per batch
(`count_substring_regex(r"\\S+")` — identical semantics to the SQL
twin's `len(regexp_extract_all(text,'\\S+'))`), pre-aggregated per batch
before a tiny hash-bucket groupby (stages/agg.grouped_aggregate), so the
shuffle moves one row per (batch, domain).  The weight table is O(#
domains) — it rides into the apply stage as a broadcast closure; the
apply itself is a shuffle-free `map_batches` (index_in against the
domain list + numpy arithmetic).  At 100 TB: counts scale with input
bytes, the exchange is per-domain partials, and nothing materializes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.stages.agg import grouped_aggregate

PPM = 1_000_000
MIX_HASH = 2654435761  # Knuth multiplicative constant — also in the SQL twin


def attach_token_counts(batch: pa.Table, *, col: str = "text",
                        out: str = "n_tokens") -> pa.Table:
    toks = pc.count_substring_regex(batch.column(col), pattern=r"\S+")
    return batch.append_column(out, toks.cast(pa.int64()))


def source_token_counts(ds, *, col: str = "text", by: str = "source",
                        num_buckets: int = 8):
    """Dataset(by, n_docs, n_tokens) — per-batch partials, small groupby."""
    def partial(b: pa.Table) -> pa.Table:
        t = attach_token_counts(b, col=col)
        return pa.table({by: t.column(by), "n_tokens": t.column("n_tokens"),
                         "one": pa.array(np.ones(len(t), np.int64))})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), [by],
        [("n_tokens", "sum", "n_tokens"), ("one", "sum", "n_docs")],
        num_buckets=num_buckets)


def mixture_weights(counts: pa.Table, *, by: str = "source",
                    tokens_col: str = "n_tokens") -> dict[str, int]:
    """counts -> {domain: weight_ppm} equalizing tokens across domains.

    Integer-exact round-half-up; the driver state is O(#domains)."""
    srcs = counts.column(by).to_pylist()
    toks = counts.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(toks.sum())
    S = len(srcs)
    den = 2 * S * toks
    w = (2 * total * PPM + S * toks) // den
    return {s: int(v) for s, v in zip(srcs, w)}


def apply_mixture(ds, weights: dict[str, int], *, id_col: str = "doc_id",
                  by: str = "source"):
    """Append weight_ppm + deterministic n_copies per row (shuffle-free)."""
    keys = pa.array(list(weights.keys()), pa.string())
    vals = np.asarray(list(weights.values()), np.int64)

    def copies(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b.column(by), value_set=keys)
        w = vals[idx.to_numpy(zero_copy_only=False).astype(np.int64)]
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        extra = ((ids * MIX_HASH) % PPM) < (w % PPM)
        n = w // PPM + extra.astype(np.int64)
        return (b.append_column("weight_ppm", pa.array(w, pa.int64()))
                 .append_column("n_copies", pa.array(n, pa.int64())))

    return ds.map_batches(copies, batch_format="pyarrow")
