"""Per-partition checkpoint manifests — resumable output (north rule:
"checkpoints per-partition lineage and metrics").

Mirrors the reference's resume idioms at partition granularity:
`gdal raster tile` skips tiles whose file exists and writes atomically via
`.tmp` + rename (apps/gdalalg_raster_tile.cpp:377-382, :476-493);
gdal2tiles `--resume`.  Here the unit is a partition (key range / shard):

    out_dir/
      part-<key>/ ...parquet files...
      _manifest/part-<key>.json   ← written LAST, atomically

A partition is complete iff its manifest exists; a rerun skips complete
partitions.  The manifest records lineage (input spec + operator-chain
hash) and metrics (rows, bytes, wall seconds), so a changed pipeline hash
invalidates old outputs instead of silently reusing them.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass


@dataclass
class PartitionManifest:
    partition: str
    lineage_hash: str
    input_spec: str
    rows_out: int
    bytes_out: int
    wall_sec: float
    finished_at: float


def lineage_hash(*components: str) -> str:
    """Stable hash of the operator chain + inputs (op names, params, code
    versions) — any change invalidates prior partition outputs."""
    h = hashlib.sha256()
    for c in components:
        h.update(c.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _manifest_path(out_dir: str, partition: str) -> str:
    return os.path.join(out_dir, "_manifest", f"part-{partition}.json")


def is_partition_complete(out_dir: str, partition: str, lineage: str) -> bool:
    p = _manifest_path(out_dir, partition)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
        return m.get("lineage_hash") == lineage
    except (json.JSONDecodeError, OSError):
        return False


def write_manifest(out_dir: str, m: PartitionManifest) -> None:
    """Atomic write (tmp + rename, the reference's tile-sink idiom)."""
    d = os.path.join(out_dir, "_manifest")
    os.makedirs(d, exist_ok=True)
    path = _manifest_path(out_dir, m.partition)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f)
    os.replace(tmp, path)


def completed_partitions(out_dir: str, lineage: str) -> set[str]:
    d = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(d):
        return set()
    out = set()
    for fn in os.listdir(d):
        if fn.startswith("part-") and fn.endswith(".json"):
            part = fn[len("part-") : -len(".json")]
            if is_partition_complete(out_dir, part, lineage):
                out.add(part)
    return out


def write_partitioned(ds, out_dir: str, partition_col: str, lineage: str, *, skip_complete: bool = True):
    """Resumable partitioned parquet sink.

    Repartitions the Dataset by `partition_col` value (directory per key),
    skips partitions whose manifest matches `lineage`, writes each
    partition's rows + manifest atomically.  Runs as a map over groups so
    the write itself is distributed; only the skip-set is driver-side.
    Returns the list of partitions written this run.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    done = completed_partitions(out_dir, lineage) if skip_complete else set()

    def write_group(g: pa.Table) -> pa.Table:
        key = str(g.column(partition_col)[0].as_py())

        def result(rows_out: int, skipped: bool) -> pa.Table:
            return pa.table(
                {
                    "partition": pa.array([key], pa.string()),
                    "rows_out": pa.array([rows_out], pa.int64()),
                    "skipped": pa.array([skipped], pa.bool_()),
                }
            )

        if key in done:
            return result(0, True)
        t0 = time.time()
        pdir = os.path.join(out_dir, f"part-{key}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "data.parquet.tmp")
        final = os.path.join(pdir, "data.parquet")
        pq.write_table(g, tmp)
        os.replace(tmp, final)
        write_manifest(
            out_dir,
            PartitionManifest(
                partition=key,
                lineage_hash=lineage,
                input_spec=partition_col,
                rows_out=len(g),
                bytes_out=os.path.getsize(final),
                wall_sec=time.time() - t0,
                finished_at=time.time(),
            ),
        )
        return result(len(g), False)

    return ds.groupby(partition_col).map_groups(write_group, batch_format="pyarrow").to_pandas()
