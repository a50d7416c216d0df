"""Distributed PCA (stages/pca.py) vs single-machine numpy PCA."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gdal_ray.stages.pca import pca_fit, pca_project

SF_DIR = "/root/testdata/sf0.001"


def _numpy_pca(X, k):
    mu = X.mean(axis=0)
    cov = np.cov(X.T, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    amax = np.argmax(np.abs(comps), axis=1)
    signs = np.sign(comps[np.arange(len(comps)), amax])
    signs[signs == 0] = 1.0
    return comps * signs[:, None], evals[order], mu


def test_pca_matches_numpy(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet").repartition(7)
    comps, evals, mu = pca_fit(ds, k=5)

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    wc, we, wmu = _numpy_pca(X, 5)
    np.testing.assert_allclose(mu, wmu, rtol=1e-12)
    np.testing.assert_allclose(evals, we, rtol=1e-9)
    np.testing.assert_allclose(comps, wc, rtol=0, atol=1e-8)

    # exact invariants: orthonormal rows, descending eigenvalues
    np.testing.assert_allclose(comps @ comps.T, np.eye(5), atol=1e-10)
    assert (np.diff(evals) <= 1e-12).all()


def test_pca_projection(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    comps, evals, mu = pca_fit(ds, k=3)
    rows = pca_project(ds, comps, mu, out_col="pca").take_all()
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    want = (X - mu) @ comps.T
    by_id = {r["vec_id"]: r["pca"] for r in rows}
    ids = t.column("vec_id").to_pylist()
    got = np.array([by_id[i] for i in ids])
    np.testing.assert_allclose(got, want, atol=1e-9)
    # projected variance per axis == eigenvalue (ddof=1)
    np.testing.assert_allclose(got.var(axis=0, ddof=1), evals, rtol=1e-9)


def test_pca_guards(ray_session):
    import ray.data as rd

    one = rd.from_arrow(pa.table({
        "embedding": pa.array([[1.0, 2.0]], pa.list_(pa.float32()))}))
    with pytest.raises(ValueError):
        pca_fit(one, k=1)
