"""Vector tile pyramid (q_vector_pyramid): MVT tiles decode, vertex
budget grows with zoom (less simplification), every polygon covered."""

import numpy as np
import pytest


def test_vector_pyramid(ray_session):
    from gdal_ray.pipelines.queries import q_vector_pyramid

    df = q_vector_pyramid("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert set(df["z"]) == {2, 4, 6}
    # every tile decoded (n_features >= 1 by construction of build_tile)
    assert (df["n_features"] >= 1).all()
    assert (df["tile_bytes"] > 0).all()
    g = df.groupby("z")[["n_features", "n_vertices"]].sum()
    # zooming in: more tiles x less simplification => strictly more
    # feature instances and vertices
    assert g.loc[4, "n_features"] >= g.loc[2, "n_features"]
    assert g.loc[6, "n_vertices"] > g.loc[4, "n_vertices"] > g.loc[2, "n_vertices"]
    # average vertices per feature grows too (simplification relaxes)
    vpf = g["n_vertices"] / g["n_features"]
    assert vpf.loc[6] >= vpf.loc[2]
