"""Deduplication operators for web-scale corpora (SURVEY.md §2.7 + the
training-data extensions): exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes:
- exact: vectorized content hash per batch → groupby(hash) first-wins —
  the shuffle moves 16-byte hashes, never the documents;
- minhash-LSH: per-batch shingle→minhash (numpy universal hashing) →
  explode to (band, band_hash, doc_id) rows → groupby(band, band_hash) →
  candidate pairs → exact-Jaccard verify (per-group, group sizes are tiny
  by construction);
- simhash: 64-bit sign-aggregated token hashes; near-dup = same value in
  ≥1 of 4 16-bit bands → candidate pairs → Hamming verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# exact dedup

def content_hash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    texts = batch.column(column).to_pylist()
    hashes = [
        np.int64(int.from_bytes(hashlib.sha1(t.encode("utf-8")).digest()[:8], "big") >> 1)
        for t in texts
    ]
    return batch.append_column("content_hash", pa.array(hashes, pa.int64()))


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """-> Dataset of (doc_id=min id per duplicate group, n_dups)."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(lambda b: content_hash_batch(b, column), batch_format="pyarrow")
    return (
        hashed.groupby("content_hash")
        .aggregate(Min(id_column, alias_name="keep_id"), Count(alias_name="n_dups"))
        .select_columns(["keep_id", "n_dups"])
    )


# ---------------------------------------------------------------------------
# shingles + jaccard + minhash

def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-byte shingle hashes (uint64) of utf-8 text, vectorized."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    npos = len(b) - k + 1
    h = np.zeros(npos, dtype=np.uint64)
    B = np.uint64(1099511628211)
    for w in range(k):
        h = h * B + b[w : w + npos].astype(np.uint64)
    return np.unique(h)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    a, b = _shingle_hashes(text_a, k), _shingle_hashes(text_b, k)
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


_MH_A = None
_MH_B = None


def _minhash_coeffs(num: int):
    global _MH_A, _MH_B
    if _MH_A is None or len(_MH_A) < num:
        rng = np.random.Generator(np.random.PCG64(1234567))
        _MH_A = rng.integers(1, 2**61 - 1, size=num, dtype=np.uint64) | np.uint64(1)
        _MH_B = rng.integers(0, 2**61 - 1, size=num, dtype=np.uint64)
    return _MH_A[:num], _MH_B[:num]


def minhash_signature(text: str, num_hashes: int = 64, k: int = 3) -> np.ndarray:
    """(num_hashes,) uint64 — min over shingles of (a*x+b) universal hashes."""
    sh = _shingle_hashes(text, k)
    a, b = _minhash_coeffs(num_hashes)
    with np.errstate(over="ignore"):
        vals = a[:, None] * sh[None, :] + b[:, None]  # wraps mod 2^64 — fine
    return vals.min(axis=1)


def minhash_band_rows(batch: pa.Table, *, num_hashes: int = 64, bands: int = 16, k: int = 3) -> pa.Table:
    """Explode each doc into `bands` rows (band, band_hash, doc_id)."""
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy()
    rows_per = bands
    band_ids = np.tile(np.arange(bands, dtype=np.int64), len(texts))
    doc_ids = np.repeat(ids, rows_per)
    band_hashes = np.empty(len(texts) * bands, dtype=np.int64)
    r = num_hashes // bands
    for i, t in enumerate(texts):
        sig = minhash_signature(t, num_hashes, k).reshape(bands, r)
        # hash each band's slice to one value
        bh = np.zeros(bands, dtype=np.uint64)
        for j in range(r):
            bh = bh * np.uint64(1099511628211) + sig[:, j]
        band_hashes[i * bands : (i + 1) * bands] = bh.astype(np.int64)
    return pa.table(
        {
            "band": pa.array(band_ids),
            "band_hash": pa.array(band_hashes),
            "doc_id": pa.array(doc_ids, pa.int64()),
        }
    )


def minhash_lsh_pairs(ds, *, num_hashes: int = 64, bands: int = 16, k: int = 3, threshold: float = 0.6):
    """documents Dataset -> verified near-dup pairs (doc_a < doc_b, jac).

    Candidate generation by LSH banding, exact-Jaccard verification inside
    the band groups (texts fetched via a broadcast id→text map is avoided:
    band rows carry no text, so verification joins text back per group —
    here we keep texts in the band rows for verification locality, which is
    the standard space/shuffle trade; at design scale carry a short prefix
    + re-fetch from the keyed store instead)."""
    texts_rows = ds.map_batches(
        lambda b: minhash_band_rows(b, num_hashes=num_hashes, bands=bands, k=k).append_column(
            "text", pa.array(np.repeat(b.column("text").to_pylist(), bands), pa.string())
        ),
        batch_format="pyarrow",
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        txts = g["text"].tolist()
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] != ids[j] and jaccard(txts[i], txts[j], k) >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"doc_a": np.array(out_a, np.int64), "doc_b": np.array(out_b, np.int64)})

    pairs = texts_rows.groupby(["band", "band_hash"]).map_groups(verify, batch_format="pandas")
    # same pair can surface from multiple bands → distinct
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# simhash

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (FNV-1a token hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        h = np.uint64(14695981039346656037)
        for byte in tok.encode("utf-8"):
            h = np.uint64((int(h) ^ byte) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        bits = ((np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        acc += np.where(bits == 1, 1, -1)
    val = 0
    for i in range(64):
        if acc[i] > 0:
            val |= 1 << i
    return val - (1 << 64) if val >= 1 << 63 else val


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array([simhash64(t) for t in texts], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# brute-force n-gram jaccard pairs (exact small-scope dedup; SQL-checkable)

def ngram_jaccard_pairs_batch(texts: list[str], ids: np.ndarray, *, k: int = 3, threshold: float = 0.5):
    """Exact all-pairs Jaccard ≥ threshold over a small doc set."""
    sh = [_shingle_hashes(t, k) for t in texts]
    out_a, out_b, out_num, out_den = [], [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = np.intersect1d(sh[i], sh[j], assume_unique=True).size
            union = sh[i].size + sh[j].size - inter
            if union and inter / union >= threshold:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[j]))
                out_num.append(int(inter))
                out_den.append(int(union))
    return out_a, out_b, out_num, out_den
