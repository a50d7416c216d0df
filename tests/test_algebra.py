"""Layer algebra (stages/algebra.py): Union class identities + the
Erase/Identity/SymDifference decompositions against the Union superset."""

import numpy as np
import pytest

from gdal_ray.pipelines.queries import (
    _overlay_algebra_plan,
    _tri_params,
    _union_grid_boxes,
    q_union_overlay,
)
from gdal_ray.stages.algebra import _CLASSES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def union_df(ray_session):
    return q_union_overlay(SF).to_pandas()


def test_union_class_identities(union_df):
    df = union_df
    assert set(df.cls.unique()) == {"both", "a_only", "b_only"}
    assert (df.area2_u > 0).all()
    # every A feature's pieces sum to its full area: Σ(both)+Σ(a_only) = Σ d²
    a_ids = np.array(sorted(df[df.cls != "b_only"].a_id.unique()))
    _, _, d = _tri_params(a_ids)
    got_a = df[df.cls != "b_only"].area2_u.sum()
    assert got_a == int((d.astype(np.int64) ** 2).sum())
    # B side is fully covered: Σ(b_only) = Σ area(b) − Σ(both)
    b_total = len(_union_grid_boxes()[0]) * 2 * 1800 * 1200
    assert df[df.cls == "b_only"].area2_u.sum() == b_total - df[df.cls == "both"].area2_u.sum()
    # sentinels, not nulls (hash-stable across engines)
    assert (df[df.cls == "b_only"].a_id == -1).all()
    assert (df[df.cls == "a_only"].b_id == "").all()
    assert df.a_id.notna().all() and df.b_id.notna().all()


@pytest.mark.parametrize("op", ["erase", "identity", "symdifference"])
def test_ops_decompose_from_union(ray_session, union_df, op):
    def key(df):
        return set(map(tuple, df[["a_id", "b_id", "cls", "area2_u"]].itertuples(index=False)))

    want = key(union_df[union_df.cls.isin(_CLASSES[op])])
    got = key(_overlay_algebra_plan(SF, op).to_pandas())
    assert got == want


def test_unknown_op_raises(ray_session):
    with pytest.raises(ValueError):
        _overlay_algebra_plan(SF, "intersection_only")


def test_union_area_rects_vs_grid_paint():
    import numpy as np

    from gdal_ray.geometry.ops import union_area_rects

    rng = np.random.RandomState(9)
    for _ in range(100):
        n = int(rng.randint(1, 15))
        x0 = rng.randint(0, 50, n)
        x1 = x0 + rng.randint(1, 30, n)
        y0 = rng.randint(0, 50, n)
        y1 = y0 + rng.randint(1, 30, n)
        grid = np.zeros((90, 90), dtype=bool)
        for a, b, c, d in zip(x0, y0, x1, y1):
            grid[b:d, a:c] = True
        assert union_area_rects(x0, y0, x1, y1) == int(grid.sum())
    # degenerate: identical rects, nested rects, disjoint rects
    assert union_area_rects([0, 0], [0, 0], [5, 5], [5, 5]) == 25
    assert union_area_rects([0, 1], [0, 1], [10, 3], [10, 3]) == 100
    assert union_area_rects([0, 20], [0, 0], [5, 25], [5, 5]) == 50
