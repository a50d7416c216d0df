"""Ray Data pipeline stages.

Each stage is either a plain batch function (stateless `map_batches`) or a
callable class (actor-pool `map_batches(Cls, concurrency=N)` — state built
once per actor in __init__, mirroring the reference's per-thread resource
managers, apps/gdalalg_raster_tile.cpp:1887-2060).
"""
