"""Distributed PCA over an embedding column — the dimensionality-reduction
stage of a large-scale training-data pipeline (e.g. before IVF/PQ indexing
or near-dup clustering).

Algorithm (the classic two-pass moment accumulation; public textbook
material — Jolliffe, and the same X'X shape Spark MLlib's RowMatrix uses):

  pass 1  every batch emits (n, Σx, ΣxᵀX) — a d-vector and a d×d matrix
          of float64 partials; Ray reduces tiny blocks, the driver sums.
          d is the embedding width (64 here, ≤ a few thousand in
          practice), so the d×d Gram matrix is driver-trivial while the
          ROWS never leave the cluster.
  driver  covariance = (ΣxᵀX − n·μμᵀ)/(n−1); np.linalg.eigh; components
          sorted by eigenvalue desc; SIGN CONVENTION: each component's
          largest-|coefficient| entry is made positive, so results are
          deterministic across partitionings (eigenvectors are only
          defined up to sign).
  pass 2  projection is a single matmul per batch against the broadcast
          (ray.put) component matrix.

Float contract: partial sums are float64 and summed in driver order;
like every distributed covariance this is exact only to accumulation
order — the pytest pins allclose(1e-9) against single-machine numpy PCA,
plus exact invariants (orthonormality, variance ordering).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _vectors(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    flat = np.asarray(arr.values.to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    offs = np.asarray(arr.offsets)
    widths = np.diff(offs)
    d = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == d).all():
        raise ValueError("ragged embedding column")
    return flat.reshape(-1, d)


def pca_fit(ds, *, col: str = "embedding", k: int = 8):
    """-> (components (k,d), eigenvalues (k,), mean (d,)) — exact moments,
    one streaming pass; rows never leave the cluster."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        X = _vectors(b, col)
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "sx": pa.array([X.sum(axis=0).tobytes()], pa.binary()),
            "xtx": pa.array([(X.T @ X).tobytes()], pa.binary()),
            "d": pa.array([X.shape[1]], pa.int64()),
        })

    parts = ray.get(ds.map_batches(partial, batch_format="pyarrow")
                    .to_arrow_refs())
    n_tot = 0
    sx = None
    xtx = None
    d = None
    for t in parts:
        if not t.num_columns or not len(t):
            continue
        for row in t.to_pylist():
            d = row["d"] if d is None else d
            v = np.frombuffer(row["sx"], dtype=np.float64)
            m = np.frombuffer(row["xtx"], dtype=np.float64).reshape(d, d)
            n_tot += row["n"]
            sx = v if sx is None else sx + v
            xtx = m if xtx is None else xtx + m
    if n_tot < 2:
        raise ValueError("PCA needs at least 2 rows")
    mu = sx / n_tot
    cov = (xtx - n_tot * np.outer(mu, mu)) / (n_tot - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    evals = evals[order]
    # deterministic sign: largest-|coeff| entry of each component positive
    amax = np.argmax(np.abs(comps), axis=1)
    signs = np.sign(comps[np.arange(len(comps)), amax])
    signs[signs == 0] = 1.0
    comps = comps * signs[:, None]
    return comps, evals, mu


def pca_project(ds, comps: np.ndarray, mu: np.ndarray, *,
                col: str = "embedding", out_col: str = "pca"):
    """Append the k-dim projection: one matmul per batch against the
    broadcast component matrix (ray.put once; local plasma reads)."""
    import ray

    ref = ray.put((np.ascontiguousarray(comps.T), mu))

    def project(b: pa.Table) -> pa.Table:
        ct, mean = ray.get(ref)
        X = _vectors(b, col)
        P = (X - mean) @ ct  # (n, k)
        k = P.shape[1]
        out = pa.FixedSizeListArray.from_arrays(
            pa.array(P.ravel(), pa.float64()), k)
        return b.append_column(out_col, out)

    return ds.map_batches(project, batch_format="pyarrow")
