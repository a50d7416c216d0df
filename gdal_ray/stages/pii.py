"""PII redaction over a text column — the scrubbing pass every
training-data pipeline runs before tokenization (the BigCode/ROOTS
"PII removal" stage shape: emails, IP addresses, phone-like digit runs,
long numeric identifiers → typed placeholder tokens).

Execution shape (Ray-Data-first): one vectorized `map_batches` over
zero-copy Arrow string batches.  Every kernel is a pyarrow.compute RE2
call (`count_substring_regex` + `replace_substring_regex`) — no Python
loop over rows, no per-batch regex compilation (Arrow compiles inside
the kernel; the pattern strings are module constants).  Embarrassingly
parallel: no shuffle, scales linearly with input bytes, so at 100 TB it
is bounded by read bandwidth exactly like the reference's streaming
filters.

Oracle parity: DuckDB's regexp engine is RE2, the same engine Arrow
binds — `sql_redact_exprs()` renders the IDENTICAL pattern constants
into nested `regexp_replace(..., 'g')` / `len(regexp_extract_all(...))`
SQL so the driver compares exact redacted strings, not just counts.
Patterns are applied in a fixed order and each count is taken on the
text AFTER the previous replacements (both engines), so a digit run
inside an already-redacted email is never double-counted.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied strictly in this order.
# Order matters: emails first (their local/domain digits must not later
# count as phone/id runs), then dotted quads, then phone-like runs with
# separators, then bare long digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # phone = digit group + >=2 separator-joined digit groups (a bare long
    # digit run is NOT a phone; it falls through to the <NUM> rule)
    ("phone", r"\+?\d+(?:[ .-]\d+){2,}", "<PHONE>"),
    ("num", r"\b\d{6,}\b", "<NUM>"),
]


def redact_batch(batch: pa.Table, *, col: str = "text",
                 out_col: str = "redacted") -> pa.Table:
    """Redact PII from ``batch[col]``; appends ``out_col`` plus one
    int64 ``n_<name>`` match-count column per pattern."""
    s = batch.column(col)
    out = batch
    for name, pat, rep in PII_PATTERNS:
        n = pc.count_substring_regex(s, pattern=pat).cast(pa.int64())
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
        out = out.append_column(f"n_{name}", n)
    return out.append_column(out_col, s)


def sql_redact_exprs(col: str) -> tuple[str, list[str]]:
    """Render (redacted_expr, [count_exprs...]) DuckDB SQL from the SAME
    pattern constants `redact_batch` runs, with counts staged exactly
    like the Arrow path (each on the previous pattern's output)."""
    redacted = col
    counts = []
    for name, pat, rep in PII_PATTERNS:
        p = pat.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all({redacted}, '{p}')) AS n_{name}")
        redacted = f"regexp_replace({redacted}, '{p}', '{rep}', 'g')"
    return redacted, counts
