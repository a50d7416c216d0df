"""Flagship pipeline: synth/read image table → decode+footprint → XYZ tile
assignment → per-tile aggregation (+ optional PIP join against a seeded
polygon table).

This is the north-star workload from BASELINE.json: spatial-join +
tile-assignment throughput (images/sec) over the image+caption table.
The pipeline stays streaming end to end — the only wide op is the final
tiny groupby over (z, x, y) counts, pre-aggregated per batch first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.stages.footprint import decode_and_footprint
from gdal_ray.stages.tiles import assign_tiles
from gdal_ray.synth import synth_images_dataset


def tile_assignments(images_ds, *, max_zoom: int = 12):
    """image table Dataset -> (image_id, z, x, y, cell_id, caption) Dataset."""
    return images_ds.map_batches(
        decode_and_footprint, batch_format="pyarrow", batch_size=64
    ).map_batches(
        lambda b: assign_tiles(b, max_zoom=max_zoom), batch_format="pyarrow", batch_size=64
    )


def per_batch_tile_counts(batch: pa.Table) -> pa.Table:
    """Partial aggregation (combiner) before the global groupby — emits one
    row per (z,x,y) per batch so the shuffle moves partials, not rows
    (SURVEY.md §4 'pre-aggregate inside map_batches')."""
    z = batch.column("z").to_numpy()
    x = batch.column("x").to_numpy()
    y = batch.column("y").to_numpy()
    key = (z.astype(np.int64) << 58) | (x << 29) | y
    _, first, counts = np.unique(key, return_index=True, return_counts=True)
    return pa.table(
        {
            "z": pa.array(z[first], pa.int64()),
            "x": pa.array(x[first], pa.int64()),
            "y": pa.array(y[first], pa.int64()),
            "n_images": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def flagship(n_images: int = 1000, *, max_zoom: int = 12, images_ds=None):
    """Returns the per-tile image-count Dataset (small; safe to to_pandas)."""
    from gdal_ray.stages.agg import grouped_aggregate

    if images_ds is None:
        images_ds = synth_images_dataset(n_images)
    assigns = tile_assignments(images_ds, max_zoom=max_zoom)
    partial = assigns.map_batches(per_batch_tile_counts, batch_format="pyarrow")
    # hash-bucket aggregate: ~10x cheaper than the built-in sample-sort
    # Aggregate for this small-partials shape (see stages/agg.py)
    return grouped_aggregate(
        partial, ["z", "x", "y"], [("n_images", "sum", "n_images")]
    )
