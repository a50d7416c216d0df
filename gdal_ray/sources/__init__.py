"""Sources & sinks for the engine.

The north-star input is a **Lance table** of image+caption pairs
(BASELINE.json input_hint).  This sandbox has no `lance` package, so
:func:`read_images` tries `ray.data.read_lance` first and falls back to
parquet with the identical schema — the pipeline code is source-agnostic
(everything downstream sees the same Arrow schema).  The reference
equivalently dispatches by driver (frmts/gdalallregister.cpp); here the
"driver registry" is this one function.

Sinks: `ray.data.Dataset.write_parquet` for plain output;
:func:`gdal_ray.state.manifest.write_partitioned` for the resumable
per-partition manifest sink (north rule: per-partition lineage+metrics).
"""

from __future__ import annotations

IMAGE_SCHEMA_COLUMNS = [
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    "lon_min", "lat_min", "lon_max", "lat_max",
]


def read_images(path: str, *, columns: list[str] | None = None):
    """Read the image+caption table from a Lance dataset directory or a
    parquet file/directory, returning a ray.data.Dataset with the
    input_hint schema (image_id, bytes, w, h, fmt, caption, phash [+
    footprint columns])."""
    import ray.data as rd

    def strip_meta(b):
        # drop parquet `pandas` schema metadata (dict) — it makes schemas
        # unhashable and Ray warns on every block unification
        return b.replace_schema_metadata(None)

    if path.endswith(".lance"):
        try:
            return rd.read_lance(path, columns=columns)
        except (ImportError, ModuleNotFoundError) as e:  # no lance in sandbox
            raise NotImplementedError(
                "lance reader unavailable in this environment; materialize the "
                "table as parquet and pass that path instead"
            ) from e
    return rd.read_parquet(path, columns=columns).map_batches(
        strip_meta, batch_format="pyarrow"
    )


def synth_images(n: int, *, parallelism: int = -1):
    """Deterministic in-pipeline generator of the image table (tests/bench:
    generation runs inside map_batches, never on the driver)."""
    from gdal_ray.synth import synth_images_dataset

    return synth_images_dataset(n, parallelism=parallelism)
