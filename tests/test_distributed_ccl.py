"""Distributed CCL (per-tile label + boundary stitch) must equal the
single-pass labeling exactly — component count, max size, pixel total."""

import numpy as np
import pytest

from gdal_ray.stages import dem
from gdal_ray.stages.polygonize import distributed_components, label_components


def _grid_fn(ids, n=32):
    return dem.reclassify(dem.elevation_grids(np.asarray(ids, dtype=np.int64), n))


def _single_shot(ids, n=32):
    out = {}
    for d, g in zip(ids, _grid_fn(ids, n)):
        labels = label_components(g.astype(np.int32))
        sizes = np.bincount(labels.ravel())[1:]
        out[int(d)] = (int(labels.max()), int(sizes.max()), int(sizes.sum()))
    return out


@pytest.mark.parametrize("tile", [16, 8])
def test_distributed_equals_single_shot(ray_session, tile):
    import ray.data as rd
    import pyarrow as pa

    ids = np.arange(12, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    # closure (pickled by value) — test-module functions aren't importable
    # from Ray workers
    grid_fn = lambda i: dem.reclassify(dem.elevation_grids(np.asarray(i, dtype=np.int64), 32))  # noqa: E731
    got = (
        distributed_components(docs, grid_fn=grid_fn, tile=tile)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _single_shot(ids)
    for d in ids:
        n, mx, tot = want[int(d)]
        assert got.loc[d, "n_components"] == n, d
        assert got.loc[d, "max_component"] == mx, d
        assert got.loc[d, "n_pixels"] == tot == 32 * 32, d


def test_stitch_handles_component_spanning_four_tiles(ray_session):
    """A single uniform grid: one component regardless of tiling."""
    import ray.data as rd
    import pyarrow as pa

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64())}))
    got = distributed_components(
        docs, grid_fn=lambda i: np.zeros((len(i), 16, 16), dtype=np.int64), tile=8
    ).to_pandas()
    assert got["n_components"].iloc[0] == 1
    assert got["max_component"].iloc[0] == 256


def test_stitch_checkerboard_no_false_merges(ray_session):
    """1-px checkerboard: every pixel its own 4-conn component — stitching
    must not merge across equal-value DIAGONAL contacts."""
    import ray.data as rd
    import pyarrow as pa

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64())}))
    got = distributed_components(
        docs,
        grid_fn=lambda i: np.broadcast_to(
            (np.add.outer(np.arange(8), np.arange(8)) % 2).astype(np.int64), (len(i), 8, 8)
        ).copy(),
        tile=4,
    ).to_pandas()
    assert got["n_components"].iloc[0] == 64
    assert got["max_component"].iloc[0] == 1


@pytest.mark.parametrize("tile", [16, 8])
def test_distributed_polygons_equal_single_pass_wkt(ray_session, tile):
    """The geometry emitter must reproduce the single-pass polygonize
    output exactly: same component order, values, pixel counts, and WKT."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.polygonize import distributed_polygons, polygonize, rings_to_wkt

    ids = np.arange(10, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    grid_fn = lambda i: dem.reclassify(dem.elevation_grids(np.asarray(i, dtype=np.int64), 32))  # noqa: E731
    got = (
        distributed_polygons(docs, grid_fn=grid_fn, tile=tile)
        .to_pandas()
        .sort_values(["doc_id", "comp"])
        .reset_index(drop=True)
    )
    rows = []
    for d, g in zip(ids, _grid_fn(ids)):
        for comp in polygonize(g.astype(np.int32)):
            rows.append((int(d), comp["value"], comp["pixel_count"],
                         rings_to_wkt(comp["rings"])))
    assert len(got) == len(rows)
    for i, (d, v, n, wkt) in enumerate(rows):
        r = got.iloc[i]
        assert (int(r["doc_id"]), int(r["value"]), int(r["n_pixels"])) == (d, v, n), i
        assert r["wkt"] == wkt, (i, r["wkt"][:80], wkt[:80])
