"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Implementations live in :mod:`gdal_ray.pipelines.queries`; nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (decode → footprint → XYZ tile assignment →
    per-tile aggregate) over the image table synthesized deterministically
    from /root/testdata/sf0.001 doc ids."""
    from gdal_ray.pipelines.flagship import flagship
    from gdal_ray.pipelines.queries import _images_ds

    return flagship(images_ds=_images_ds("/root/testdata/sf0.001"), max_zoom=12)


def queries() -> dict[str, Callable[[str], Any]]:
    from gdal_ray.pipelines import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from gdal_ray.pipelines import queries as q

    return q.oracle_sql()
