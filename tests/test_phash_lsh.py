"""phash Hamming LSH: brute-force equivalence + adversarial skew bucket.

The 4-band LSH is complete for max_dist <= 3 (pigeonhole), so the
distributed result must EQUAL brute force exactly.  The constant-phash
fixture is the near-black-crawl adversary: one (band, band_hash) bucket
holding every row — the unique-collapse must keep distance work O(1)
(only pair EMISSION is quadratic, which is the true output size)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gdal_ray.stages.dedup import _hamming_pairs_among_uniques, phash_hamming_pairs


def _brute(ids, ph, max_dist):
    x = ph[:, None] ^ ph[None, :]
    ham = np.zeros(x.shape, np.int64)
    for s in range(64):
        ham += ((x >> np.uint64(s)) & np.uint64(1)).astype(np.int64)
    i, j = np.nonzero(np.triu(ham <= max_dist, k=1))
    return set((ids[a], ids[b], int(ham[a, b])) for a, b in zip(i, j))


def test_phash_lsh_equals_brute(ray_session):
    rng = np.random.default_rng(7)
    n = 300
    ph = rng.integers(0, 2**63, n).astype(np.uint64)
    for k in range(0, n, 5):  # inject near-dups at distances 0..4
        v = ph[k]
        for b in rng.choice(64, k % 5, replace=False):
            v ^= np.uint64(1) << np.uint64(b)
        ph[(k + 1) % n] = v
    ids = [f"img-{i:06d}" for i in range(n)]
    ds = ray.data.from_arrow(
        pa.table({"image_id": pa.array(ids), "phash": pa.array(ph.view(np.int64), pa.int64())})
    )
    got = phash_hamming_pairs(ds, max_dist=3, bands=4).to_pandas()
    assert not got.duplicated(["a_id", "b_id"]).any()
    assert set(zip(got.a_id, got.b_id, got.hamming)) == _brute(ids, ph, 3)


def test_phash_lsh_constant_hash_skew(ray_session):
    n = 600  # one bucket holds all rows in every band
    ph = np.full(n, 0x0123456789ABCDEF, np.uint64)
    ids = [f"img-{i:06d}" for i in range(n)]
    ds = ray.data.from_arrow(
        pa.table({"image_id": pa.array(ids), "phash": pa.array(ph.view(np.int64), pa.int64())})
    )
    got = phash_hamming_pairs(ds, max_dist=3, bands=4).to_pandas()
    assert len(got) == n * (n - 1) // 2
    assert (got.hamming == 0).all()
    assert not got.duplicated(["a_id", "b_id"]).any()
    assert (got.a_id < got.b_id).all()


def test_hamming_uniques_kernel():
    rng = np.random.default_rng(3)
    u = np.unique(rng.integers(0, 2**63, 200).astype(np.uint64))
    i, j, h = _hamming_pairs_among_uniques(u, 64)  # every pair
    assert len(i) == len(u) * (len(u) - 1) // 2
    # spot-check against int popcount
    for k in rng.choice(len(i), 20, replace=False):
        assert h[k] == bin(int(u[i[k]]) ^ int(u[j[k]])).count("1")
    # chunking boundary: force multiple chunks
    i2, j2, h2 = _hamming_pairs_among_uniques(u, 5)
    mask = h <= 5
    assert set(zip(i2, j2, h2)) == set(zip(i[mask], j[mask], h[mask]))
