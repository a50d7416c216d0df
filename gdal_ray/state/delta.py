"""Incremental ingest: process only files that changed since the last run.

A recurring crawl ingests the same directory tree daily; re-reading
100 TB to add 1 TB is the classic waste.  The standard contract
(Spark Structured Streaming's file source, Delta/Iceberg snapshot
diffing) is a persisted listing state: fingerprint every file
(path, size, mtime_ns), diff against the previous state, process only
added/changed files, then commit the new state atomically.

Shape: the listing walk is driver-side (metadata only — one stat per
file; at 10^6 files that is seconds and O(file-count) memory, the same
state any table format's manifest holds), the processing of the delta
is whatever Dataset pipeline the caller builds over the returned paths.
State commits atomically (tmp + rename) AFTER the caller's pipeline
succeeds, so a crashed run re-processes its delta instead of losing it.
"""

from __future__ import annotations

import json
import os


def list_fingerprints(root: str, *, suffix: str = "") -> dict[str, list]:
    """{relpath: [size, mtime_ns]} for every regular file under root."""
    out: dict[str, list] = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if suffix and not fn.endswith(suffix):
                continue
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = [st.st_size, st.st_mtime_ns]
    return out


def load_state(state_path: str) -> dict[str, list]:
    if not os.path.exists(state_path):
        return {}
    with open(state_path) as f:
        return json.load(f)


def commit_state(state_path: str, fingerprints: dict[str, list]) -> None:
    """Atomic write — call AFTER the delta pipeline succeeded."""
    os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(fingerprints, f)
    os.replace(tmp, state_path)


def file_delta(root: str, state_path: str, *, suffix: str = ""):
    """→ (added, changed, removed, current_fingerprints).

    added/changed are relpaths to process this run; removed are paths
    present in the last state but gone now (for tombstoning downstream).
    Pass current_fingerprints to commit_state once processing succeeds.
    """
    now = list_fingerprints(root, suffix=suffix)
    prev = load_state(state_path)
    added = sorted(p for p in now if p not in prev)
    changed = sorted(p for p in now if p in prev and now[p] != prev[p])
    removed = sorted(p for p in prev if p not in now)
    return added, changed, removed, now
