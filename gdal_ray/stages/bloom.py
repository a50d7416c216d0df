"""Bloom-filter cross-corpus membership — the "have we seen this exact
text before" gate pipelines run against a reference set (benchmark
decontamination lists, an already-trained corpus, a blocklist) without
shuffling the big side.

Build (distributed, bounded): each batch hashes its texts to k bit
positions (double hashing h1 + i*h2 mod m over the engine's stable
64-bit string hash) and emits the DISTINCT set-bit indices — at most
k rows per unique text and never more than m total after the dedup, so
the exchange is bounded by the filter size, not the corpus.  A tiny
`unique()` collapse hands the driver O(m) int32s; the packed bitmap
(m/8 bytes) is `ray.put` once and read once per actor in the flag
stage — the broadcast-small-side pattern, never re-shipped per batch.

Flag (shuffle-free): one vectorized `map_batches` recomputes the k
positions and ANDs the bits.  False-positive rate is the classical
(1 - e^{-kn/m})^k — with the default m=2^23, k=4 it is < 1e-12 up to
n = 10^4 reference texts (the oracle-parity regime; pytest pins an
empirical FP sweep), and at 10^12-document scale you size m per the
same formula and the build exchange stays ≤ m bits by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.stages.sketch import _splitmix64
from gdal_ray.stages.window import _stable_hash64

M_BITS = 1 << 23
K_HASHES = 4


def _bit_positions(col, *, m_bits: int = M_BITS, k: int = K_HASHES) -> np.ndarray:
    """(n, k) uint64 bit indices via double hashing of the string hash."""
    h = _splitmix64(_stable_hash64(pc.cast(col, pa.string())))
    h1 = h
    h2 = _splitmix64(h) | np.uint64(1)  # odd => full-period stride
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)


def bloom_build(ds, *, col: str = "text", m_bits: int = M_BITS,
                k: int = K_HASHES) -> np.ndarray:
    """-> packed uint8 bitmap (m_bits/8 bytes) over ds[col]."""
    def set_bits(b: pa.Table) -> pa.Table:
        pos = _bit_positions(b.column(col), m_bits=m_bits, k=k)
        return pa.table({"bit": pa.array(np.unique(pos).astype(np.int64))})

    bits = ds.map_batches(set_bits, batch_format="pyarrow").unique("bit")
    bitmap = np.zeros(m_bits // 8, np.uint8)
    idx = np.asarray(bits, np.int64)
    # bitwise_or.at: fancy-indexed |= would drop the second of two bits
    # landing in the same byte
    np.bitwise_or.at(bitmap, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    return bitmap


class BloomFlag:
    """Actor-pool stage: bitmap fetched ONCE per actor in __init__."""

    def __init__(self, bitmap_ref, *, col: str = "text",
                 out: str = "is_dup", m_bits: int = M_BITS,
                 k: int = K_HASHES):
        import ray
        self.bitmap = ray.get(bitmap_ref) if not isinstance(
            bitmap_ref, np.ndarray) else bitmap_ref
        self.col, self.out, self.m, self.k = col, out, m_bits, k

    def __call__(self, b: pa.Table) -> pa.Table:
        pos = _bit_positions(b.column(self.col), m_bits=self.m, k=self.k)
        byte = (pos >> np.uint64(3)).astype(np.int64)
        mask = (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8)
        hit = ((self.bitmap[byte] & mask) == mask).all(axis=1)
        return b.append_column(self.out, pa.array(hit.astype(np.int64)))


def bloom_flags(ds, bitmap: np.ndarray, *, col: str = "text",
                out: str = "is_dup", m_bits: int = M_BITS,
                k: int = K_HASHES, concurrency=(1, 4)):
    # autoscaling concurrency: a fixed pool equal to num_cpus starves the
    # upstream read and deadlocks small sessions (verify-skill gotcha)
    import ray

    ref = ray.put(bitmap)
    return ds.map_batches(
        BloomFlag, fn_constructor_kwargs=dict(
            bitmap_ref=ref, col=col, out=out, m_bits=m_bits, k=k),
        batch_format="pyarrow", concurrency=concurrency)
