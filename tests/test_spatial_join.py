"""Predicate-refined spatial join (stages/joins.spatial_join) vs brute
force over the seeded polygon table + shifted twins."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geometry.relate import relate_polygons
from gdal_ray.geometry.wkb import encode_polygon, polygon_parts
from gdal_ray.stages.joins import spatial_join
from gdal_ray.synth import make_polygon_table


def _sides():
    tbl = make_polygon_table(20)
    wkbs = tbl.column("wkb").to_pylist()
    pids = tbl.column("poly_id").to_pylist()
    a_ids, a_wkbs = [], []
    for pid, w in zip(pids, wkbs):
        parts = polygon_parts(w)
        if len(parts) != 1:
            continue
        a_ids.append(pid)
        a_wkbs.append(w)
        # shifted twin guarantees nontrivial matches
        rings = parts[0]
        a_ids.append(pid + "-shift")
        a_wkbs.append(encode_polygon(
            [r + np.array([round(float(r[:, 0].max() - r[:, 0].min()) / 2, 2),
                           0.0]) for r in rings]))
    b_tbl = pa.table({"b_id": pa.array(pids), "wkb": pa.array(wkbs, pa.binary())})
    a_tbl = pa.table({"a_id": pa.array(a_ids), "wkb": pa.array(a_wkbs, pa.binary())})
    return a_tbl, b_tbl


@pytest.mark.parametrize("predicate", ["intersects", "overlaps", "within"])
def test_spatial_join_matches_brute_force(ray_session, predicate):
    import ray.data as rd

    a_tbl, b_tbl = _sides()
    got = spatial_join(rd.from_arrow(a_tbl).repartition(4), b_tbl,
                       predicate=predicate)
    got_pairs = {(r["a_id"], r["b_id"]) for r in got.take_all()}
    want = set()
    for ai, aw in zip(a_tbl.column("a_id").to_pylist(),
                      a_tbl.column("wkb").to_pylist()):
        for bi, bw in zip(b_tbl.column("b_id").to_pylist(),
                          b_tbl.column("wkb").to_pylist()):
            if relate_polygons(aw, bw)[predicate]:
                want.add((ai, bi))
    assert got_pairs == want
    assert len(want) > 0  # non-degenerate fixture


def test_spatial_join_pair_stream_never_hits_driver(ray_session,
                                                    monkeypatch):
    """|A| >> |B|: the candidate pair stream must stay distributed
    (round-5 fix — previously pairs.take_all() built a driver dict that
    scaled with |A|).  take_all is forbidden for the whole build+execute
    window; driver state is the one O(|B|) ray.put broadcast."""
    import ray.data as rd

    from gdal_ray.geometry.wkb import encode_polygon

    rng = np.random.default_rng(42)
    # 3 small B polygons, 4000 A squares scattered over them
    def square(cx, cy, s):
        r = np.array([[cx - s, cy - s], [cx + s, cy - s], [cx + s, cy + s],
                      [cx - s, cy + s], [cx - s, cy - s]])
        return encode_polygon([r])

    b_tbl = pa.table({
        "b_id": pa.array(["b0", "b1", "b2"]),
        "wkb": pa.array([square(0.0, 0.0, 5.0), square(20.0, 0.0, 5.0),
                         square(0.0, 20.0, 5.0)], pa.binary()),
    })
    ax = rng.uniform(-8, 28, 4000)
    ay = rng.uniform(-8, 28, 4000)
    a_tbl = pa.table({
        "a_id": pa.array([f"a{i}" for i in range(4000)]),
        "wkb": pa.array([square(x, y, 0.5) for x, y in zip(ax, ay)],
                        pa.binary()),
    })

    ds = spatial_join(rd.from_arrow(a_tbl).repartition(8), b_tbl,
                      predicate="intersects")
    # forbid driver materialization while the join plan executes
    def _banned(self, *a, **k):
        raise AssertionError("take_all on the driver during spatial_join")

    monkeypatch.setattr(rd.Dataset, "take_all", _banned)
    got = set()
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for r in batch.to_pylist():
            got.add((r["a_id"], r["b_id"]))
    # verify against the separable brute force (squares intersect iff
    # both axis intervals overlap, closed boundaries)
    want = set()
    for i, (x, y) in enumerate(zip(ax, ay)):
        for j, (bx, by) in enumerate([(0.0, 0.0), (20.0, 0.0), (0.0, 20.0)]):
            if abs(x - bx) <= 5.5 and abs(y - by) <= 5.5:
                want.add((f"a{i}", f"b{j}"))
    assert got == want and len(want) > 100
