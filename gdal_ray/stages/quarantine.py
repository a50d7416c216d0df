"""Bad-record quarantine: decode with per-row error capture.

A 10^12-image crawl always contains truncated files, wrong extensions
and corrupt streams; a pipeline that throws on the first bad row never
finishes, and one that silently drops rows can't be audited.  The
standard production contract (Spark's badRecordsPath, Ray Data's own
max_errored_blocks discussions) is: good rows flow on, bad rows land in
a quarantine table carrying the error class for triage, and
good + bad == input exactly.

Shape: one vectorized-per-batch pass; each row's decode is attempted
independently (decode cost dominates, the try/except adds nothing), and
the output batch carries an `ok` flag + `reason` so BOTH streams stay in
one Dataset until a cheap filter splits them — no second read, no
driver-side row loop.  GDAL's analogue is CPLSetErrorHandler +
per-dataset error counters (port/cpl_error.cpp); the reason strings here
classify by exception type + message prefix, stable across runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def classify_error(exc: Exception) -> str:
    """Stable error class for triage grouping."""
    import struct
    import zlib

    msg = str(exc)
    if "magic" in msg or "container" in msg:
        return "unknown_container"
    if isinstance(exc, NotImplementedError):
        return "unsupported_format"
    if isinstance(exc, (IndexError, EOFError, zlib.error)):
        return "truncated"
    if isinstance(exc, (ValueError, struct.error)):
        return "corrupt_stream"
    return f"error:{type(exc).__name__}"


def decode_with_quarantine(batch: pa.Table, *, bytes_col: str = "bytes",
                           fmt_col: str = "fmt") -> pa.Table:
    """Attempt decode per row; emit (ok, reason, w, h) alongside the ids.

    Good rows report decoded dims; quarantined rows report the error
    class.  Pixels are NOT retained (this is the triage pass — a real
    pipeline fuses the actual work into the success branch)."""
    from gdal_ray.codecs import decode

    datas = batch.column(bytes_col).to_pylist()
    fmts = (batch.column(fmt_col).to_pylist()
            if fmt_col in batch.schema.names else [None] * len(datas))
    ok = np.zeros(len(datas), dtype=bool)
    reason = []
    ws = np.zeros(len(datas), dtype=np.int64)
    hs = np.zeros(len(datas), dtype=np.int64)
    for i, (d, f) in enumerate(zip(datas, fmts)):
        try:
            img = decode(d, f)
            ok[i] = True
            reason.append("")
            hs[i], ws[i] = img.shape[0], img.shape[1]
        except Exception as e:  # noqa: BLE001 — quarantine IS the handler
            reason.append(classify_error(e))
    keep = [c for c in batch.schema.names if c not in (bytes_col,)]
    out = batch.select(keep)
    out = out.append_column("ok", pa.array(ok))
    out = out.append_column("reason", pa.array(reason, pa.string()))
    out = out.append_column("w_dec", pa.array(ws))
    return out.append_column("h_dec", pa.array(hs))


def split_quarantine(ds, **kw):
    """→ (good_ds, bad_ds): one decode pass, two filtered views."""
    tagged = ds.map_batches(lambda b: decode_with_quarantine(b, **kw),
                            batch_format="pyarrow")
    return (tagged.filter(expr="ok == True"),
            tagged.filter(expr="ok == False"))
