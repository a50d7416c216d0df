"""Contour polyline assembly + distributed cross-tile stitching: the
distributed plan must equal single-pass assembly exactly (chain counts,
closed/open split, segment totals)."""

import numpy as np
import pytest

from gdal_ray.stages import dem
from gdal_ray.stages.contour import (
    assemble_chains, contour_polylines, contour_segments, distributed_contours,
)

LEVELS = (63.5, 127.5, 191.5)


def test_single_circle_is_one_closed_loop():
    yy, xx = np.mgrid[0:20, 0:20]
    e = ((xx - 10.0) ** 2 + (yy - 10.0) ** 2)
    segs = contour_segments(e, 30.5)
    n_closed, n_open, npts, chains = assemble_chains(segs)
    assert n_closed == 1 and n_open == 0


def test_open_line_hits_grid_border():
    yy, xx = np.mgrid[0:10, 0:10]
    e = xx.astype(float)  # vertical gradient → one straight open contour
    segs = contour_segments(e, 4.5)
    n_closed, n_open, npts, chains = assemble_chains(segs)
    assert n_closed == 0 and n_open == 1
    assert len(segs) == 9  # one crossing per cell row


def test_segment_count_matches_case_lut():
    ids = np.arange(8, dtype=np.int64)
    grids = dem.elevation_grids(ids, 16)
    for g in grids:
        for lv in LEVELS:
            segs = contour_segments(g.astype(float), lv)
            crossed, expect = dem.contour_segment_counts(g[None, ...], int(np.ceil(lv)))
            # dem counts use integer >= level; ceil(63.5)=64 gives identical
            # ge mask, so segment totals agree
            assert len(segs) == int(expect[0])


@pytest.mark.parametrize("tile", [8, 16])
def test_distributed_equals_single_pass(ray_session, tile):
    import pyarrow as pa
    import ray.data as rd

    ids = np.arange(10, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    grid_fn = lambda i: dem.elevation_grids(np.asarray(i, dtype=np.int64), 33)  # noqa: E731
    got = (
        distributed_contours(docs, grid_fn=grid_fn, levels=LEVELS, tile=tile)
        .to_pandas()
        .set_index(["doc_id", "level"])
        .sort_index()
    )
    grids = grid_fn(ids)
    for i, d in enumerate(ids):
        want = contour_polylines(grids[i].astype(float), LEVELS)
        for lv in LEVELS:
            n_closed, n_open, _, n_segs = want[lv]
            row = got.loc[(int(d), lv)]
            assert row["n_segments"] == n_segs, (d, lv)
            assert row["n_chains"] == n_closed + n_open, (d, lv)
            assert row["n_closed"] == n_closed, (d, lv)
            assert row["n_open"] == n_open, (d, lv)
