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
import pyarrow.compute as pc

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


def minhash_lsh_pairs(ds, *, num_hashes: int = 64, bands: int = 16, k: int = 3,
                      threshold: float = 0.6):
    """documents Dataset -> verified near-dup pairs (doc_a < doc_b), exact
    Jaccard >= threshold among LSH candidates.

    Shuffle diet (the 100-TB shape):
    1. band rows carry ONLY (band, band_hash, doc_id) — 24 B/row, never the
       text (which would amplify the corpus x`bands` through the shuffle);
    2. candidate pairs surfacing from several bands are deduped with a
       partial-combinable groupby(doc_a, doc_b).aggregate(Count) — per-block
       pre-combining, no per-group Python pass;
    3. exact-Jaccard verification re-fetches texts by key with two
       union+groupby exchanges (no actor-pool hash join, so the plan runs
       at any cluster width): docs stream once into the doc_id groupby,
       then only candidate texts move into the per-pair verify.
    """
    from ray.data.aggregate import Count

    band_rows = ds.map_batches(
        lambda b: minhash_band_rows(b, num_hashes=num_hashes, bands=bands, k=k),
        batch_format="pyarrow",
    )

    def emit_pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("doc_id").to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"doc_a": pa.nulls(0, pa.int64()), "doc_b": pa.nulls(0, pa.int64())})
        i, j = np.triu_indices(len(ids), k=1)
        keep = ids[i] != ids[j]
        return pa.table(
            {"doc_a": pa.array(ids[i][keep], pa.int64()), "doc_b": pa.array(ids[j][keep], pa.int64())}
        )

    candidates = (
        band_rows.groupby(["band", "band_hash"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["doc_a", "doc_b"])
    )

    def member_rows(b: pa.Table) -> pa.Table:
        da = b.column("doc_a")
        db = b.column("doc_b")
        n = len(b)
        return pa.table(
            {
                "key": pa.chunked_array([da, db]).combine_chunks(),
                "doc_a": pa.chunked_array([da, da]).combine_chunks(),
                "doc_b": pa.chunked_array([db, db]).combine_chunks(),
                "side": pa.array(np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])),
                "text": pa.nulls(2 * n, pa.string()),
            }
        )

    def doc_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "key": b.column("doc_id"),
                "doc_a": pa.nulls(n, pa.int64()),
                "doc_b": pa.nulls(n, pa.int64()),
                "side": pa.array(np.full(n, -1, np.int8)),
                "text": b.column("text"),
            }
        )

    members = candidates.map_batches(member_rows, batch_format="pyarrow")
    dtexts = ds.select_columns(["doc_id", "text"]).map_batches(doc_rows, batch_format="pyarrow")

    def attach(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        drow = np.nonzero(side == -1)[0]
        mrow = np.nonzero(side >= 0)[0]
        if len(drow) == 0 or len(mrow) == 0:
            return pa.table(
                {"doc_a": pa.nulls(0, pa.int64()), "doc_b": pa.nulls(0, pa.int64()),
                 "side": pa.nulls(0, pa.int8()), "text": pa.nulls(0, pa.string())}
            )
        text = g.column("text")[int(drow[0])]
        idx = pa.array(mrow)
        return pa.table(
            {
                "doc_a": g.column("doc_a").take(idx),
                "doc_b": g.column("doc_b").take(idx),
                "side": g.column("side").take(idx),
                "text": pa.array([text.as_py()] * len(mrow), pa.string()),
            }
        )

    fetched = members.union(dtexts).groupby("key").map_groups(attach, batch_format="pyarrow")

    def verify(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        a_rows = np.nonzero(side == 0)[0]
        b_rows = np.nonzero(side == 1)[0]
        empty = pa.table({"doc_a": pa.nulls(0, pa.int64()), "doc_b": pa.nulls(0, pa.int64())})
        if len(a_rows) == 0 or len(b_rows) == 0:
            return empty
        ta = g.column("text")[int(a_rows[0])].as_py()
        tb = g.column("text")[int(b_rows[0])].as_py()
        if jaccard(ta, tb, k) < threshold:
            return empty
        return pa.table(
            {
                "doc_a": pa.array([g.column("doc_a")[0].as_py()], pa.int64()),
                "doc_b": pa.array([g.column("doc_b")[0].as_py()], pa.int64()),
            }
        )

    return fetched.groupby(["doc_a", "doc_b"]).map_groups(verify, batch_format="pyarrow")


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
    """Batch SimHash, fully vectorized over the raw Arrow string buffers:
    ASCII-whitespace token runs located with byte-class tables, all tokens
    FNV-1a-hashed in one numpy pass per byte *position*, bits expanded with
    np.unpackbits and sign-accumulated per doc with add.reduceat.  Bit-
    identical to the scalar :func:`simhash64` for ASCII-whitespace text."""
    from gdal_ray.stages.text import _WS, _cum, _per_doc, _run_starts, run_spans, string_bytes

    data, offs = string_bytes(batch.column("text"))
    ndoc = len(batch)
    nonspace = ~_WS[data]
    starts_mask = _run_starts(nonspace, offs)
    counts = _per_doc(_cum(starts_mask), offs)
    t_start, t_len = run_spans(nonspace, starts_mask, offs)
    ntok = len(t_start)
    acc = np.zeros((ndoc, 64), dtype=np.int32)
    if ntok:
        h = np.full(ntok, np.uint64(14695981039346656037), dtype=np.uint64)
        prime = np.uint64(1099511628211)
        with np.errstate(over="ignore"):
            for p in range(int(t_len.max())):
                m = t_len > p
                h[m] = (h[m] ^ data[t_start[m] + p].astype(np.uint64)) * prime
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        signs = bits.astype(np.int32) * 2 - 1
        nz = np.nonzero(counts)[0]
        tok_doc_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        acc[nz] = np.add.reduceat(signs, tok_doc_starts[nz], axis=0)
    vals = (
        np.packbits(acc > 0, axis=1, bitorder="little")
        .view(np.uint64)
        .ravel()
        .astype(np.int64)
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(vals, pa.int64()),
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


# ---------------------------------------------------------------------------
# phash Hamming near-dup (images) — 4-band LSH over the 64-bit hash.
# Pigeonhole: any pair with Hamming distance <= 3 differs in at most 3 of
# the 4 sixteen-bit bands, so at least one band matches exactly → the
# banding is COMPLETE for max_dist <= 3 and the result equals brute force.

def phash_band_rows(batch: pa.Table, *, bands: int = 4) -> pa.Table:
    ids = batch.column("image_id")
    ph = batch.column("phash").to_numpy().astype(np.uint64)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    out_band, out_hash = [], []
    for b in range(bands):
        out_band.append(np.full(len(ph), b, dtype=np.int64))
        out_hash.append(((ph >> np.uint64(b * width)) & mask).astype(np.int64))
    n = len(ph)
    return pa.table(
        {
            "band": pa.array(np.concatenate(out_band), pa.int64()),
            "band_hash": pa.array(np.concatenate(out_hash), pa.int64()),
            "image_id": pa.concat_arrays([ids.combine_chunks()] * bands),
            "phash": pa.array(np.tile(ph.astype(np.int64), bands), pa.int64()),
        }
    )


def _hamming_pairs_among_uniques(uph: np.ndarray, max_dist: int):
    """uph: (m,) uint64 DISTINCT hashes -> (i, j, ham) with i < j and
    Hamming <= max_dist.  Popcount via the bit-matrix identity
    ham = |x| + |y| - 2·x·y in chunked float32 BLAS (exact: values <= 64),
    so a skewed LSH bucket costs a matmul, not a 64-step Python loop, and
    peak memory stays bounded regardless of bucket size."""
    m = len(uph)
    if m < 2:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    bits = np.unpackbits(uph[:, None].view(np.uint8), axis=1)  # (m, 64)
    f = bits.astype(np.float32)
    s = f.sum(axis=1)
    chunk = max(64, min(2048, (1 << 26) // m))  # chunk*m <= 64M floats
    oi, oj, oh = [], [], []
    for c0 in range(0, m, chunk):
        c1 = min(c0 + chunk, m)
        ham = s[c0:c1, None] + s[None, :] - 2.0 * (f[c0:c1] @ f.T)
        ii, jj = np.nonzero(ham <= max_dist + 0.5)
        gi = ii + c0
        keep = jj > gi
        oi.append(gi[keep])
        oj.append(jj[keep])
        oh.append(ham[ii[keep], jj[keep]].astype(np.int64))
    return np.concatenate(oi), np.concatenate(oj), np.concatenate(oh)


def phash_hamming_pairs(ds, *, max_dist: int = 3, bands: int = 4):
    """images Dataset (image_id, phash) -> (a_id, b_id, hamming) pairs with
    Hamming(phash) <= max_dist; exact for max_dist < bands (band
    completeness, see note above).

    Skew-safe by construction: each (band, band_hash) group first collapses
    to UNIQUE hashes — the near-black-crawl adversary (one constant phash
    repeated n times) costs O(1) distance work plus the genuinely required
    O(n^2) pair EMISSION, never an O(n^2) distance matrix.  Cross-band
    duplicates are eliminated locally by a first-matching-band owner rule
    (a pair is emitted only by the lowest band index where its two hashes
    agree — computable from the two hashes alone), so there is no second
    (a_id, b_id) groupby shuffle."""
    width = 64 // bands
    bmask = np.uint64((1 << width) - 1)
    empty = pa.table(
        {"a_id": pa.array([], pa.string()), "b_id": pa.array([], pa.string()),
         "hamming": pa.array([], pa.int64())}
    )

    def verify(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return empty
        band = g.column("band")[0].as_py()
        order = pc.sort_indices(g, sort_keys=[("image_id", "ascending")])
        g = g.take(order)  # position order == id order → a_id < b_id below
        ids = g.column("image_id").combine_chunks()
        ph = np.ascontiguousarray(g.column("phash").to_numpy()).view(np.uint64)
        uph, inv, counts = np.unique(ph, return_inverse=True, return_counts=True)
        # positions of each unique's members, CSR over the id-sorted rows
        member = np.argsort(inv, kind="stable")
        start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        # candidate unique pairs: distinct-hash pairs within threshold,
        # plus (u, u) self-pairs for duplicated hashes (ham = 0)
        pi, pj, pham = _hamming_pairs_among_uniques(uph, max_dist)
        dup = np.nonzero(counts > 1)[0]
        pi = np.concatenate([pi, dup])
        pj = np.concatenate([pj, dup])
        pham = np.concatenate([pham, np.zeros(len(dup), dtype=np.int64)])
        if len(pi) == 0:
            return empty
        # owner rule: emit only if THIS band is the first matching band
        xorv = uph[pi] ^ uph[pj]
        first = np.full(len(pi), bands, dtype=np.int64)
        for b in range(bands - 1, -1, -1):
            hit = ((xorv >> np.uint64(b * width)) & bmask) == 0
            first[hit] = b
        own = first == band
        pi, pj, pham = pi[own], pj[own], pham[own]
        if len(pi) == 0:
            return empty
        # ragged cross-product expansion uniques -> id pairs, fully vectorized
        sizes = counts[pi] * counts[pj]
        total = int(sizes.sum())
        k_rep = np.repeat(np.arange(len(pi), dtype=np.int64), sizes)
        base = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        off = np.arange(total, dtype=np.int64) - np.repeat(base, sizes)
        cj = counts[pj][k_rep]
        p = member[start[pi][k_rep] + off // cj]
        q = member[start[pj][k_rep] + off % cj]
        intra = (pi == pj)[k_rep]
        keep = ~intra | (p < q)  # self-pairs: each unordered pair once
        p, q = p[keep], q[keep]
        lo, hi = np.minimum(p, q), np.maximum(p, q)
        return pa.table(
            {"a_id": ids.take(pa.array(lo)), "b_id": ids.take(pa.array(hi)),
             "hamming": pa.array(np.repeat(pham, sizes)[keep], pa.int64())}
        )

    rows = ds.map_batches(lambda b: phash_band_rows(b, bands=bands), batch_format="pyarrow")
    return rows.groupby(["band", "band_hash"]).map_groups(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup — IVF-bucketed self-join: one shuffle keyed by
# centroid bucket, exact by construction (replication radius covers the
# threshold angle), no driver-side materialization of the dataset.

class IvfReplicate:
    """Actor-pool stage: replicate each vector to every centroid bucket
    within (its-own-primary-angle + threshold-angle); carries the primary
    bucket + primary similarity so the pair-emission owner rule can be
    evaluated locally inside any bucket.

    Completeness: for a pair (u, v) with angle(u, v) <= θ_t, WLOG let u be
    the member with the smaller primary angle α_u.  Then
    angle(v, primary(u)) <= angle(v,u) + angle(u, primary(u))
    <= θ_t + α_u <= θ_t + α_v — inside v's replication radius, so v is
    present in u's primary bucket and the pair is emitted exactly there."""

    def __init__(self, centroids_ref=None, centroids=None, threshold: float = 0.4, eps: float = 1e-9):
        import ray

        if centroids is None:
            centroids = ray.get(centroids_ref[0])
        c = np.asarray(centroids, dtype=np.float64)
        self.cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
        self.theta_t = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
        self.eps = eps

    def __call__(self, batch: pa.Table) -> pa.Table:
        from gdal_ray.stages.ann import _batch_matrix

        v = _batch_matrix(batch)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        sims = vn @ self.cn.T  # (n, C)
        primary = np.argmax(sims, axis=1).astype(np.int64)
        psim = sims[np.arange(len(v)), primary]
        ang = np.arccos(np.clip(psim, -1.0, 1.0))
        radius = np.cos(np.minimum(np.pi, ang + self.theta_t)) - self.eps
        ii, cc = np.nonzero(sims >= radius[:, None])
        take = pa.array(ii)
        return pa.table(
            {
                "bucket": pa.array(cc.astype(np.int64), pa.int64()),
                "vec_id": batch.column("vec_id").take(take),
                "embedding": batch.column("embedding").take(take),
                "primary": pa.array(primary[ii], pa.int64()),
                "psim": pa.array(psim[ii], pa.float64()),
            }
        )


def embedding_cosine_pairs(ds, *, threshold: float = 0.4, n_centroids: int = 16):
    """All (a_id < b_id) pairs with cosine >= threshold — exact, via an
    IVF-bucketed self-join: seeded centroids from the deterministic read
    order (ds.limit — no sort), one shuffle keyed by bucket, per-bucket
    blocked matmul.  A pair is emitted only in the primary bucket of its
    smaller-primary-angle member (ties by vec_id), so no dedup pass.

    Pruning scales with the threshold: near-dup thresholds (≳0.8) probe
    few buckets; loose thresholds degrade gracefully toward all-buckets
    replication (still correct)."""
    import ray

    head = embeddings_head_matrix(ds, n_centroids)
    cref = ray.put(head)
    replicated = ds.map_batches(
        IvfReplicate,
        fn_constructor_kwargs={"centroids_ref": [cref], "threshold": threshold},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def pair_emit(g: pa.Table) -> pa.Table:
        from gdal_ray.stages.ann import _batch_matrix

        vid = g.column("vec_id").to_numpy(zero_copy_only=False)
        psim = g.column("psim").to_numpy(zero_copy_only=False)
        bucket = int(g.column("bucket")[0].as_py())
        prim_rows = np.nonzero(g.column("primary").to_numpy(zero_copy_only=False) == bucket)[0]
        empty = pa.table(
            {"a_id": pa.nulls(0, pa.int64()), "b_id": pa.nulls(0, pa.int64()),
             "sim": pa.nulls(0, pa.float64())}
        )
        if len(prim_rows) == 0 or len(g) < 2:
            return empty
        v = _batch_matrix(g)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        sims = vn[prim_rows] @ vn.T  # (P, n)
        pi, aj = np.nonzero(sims >= threshold)
        gi = prim_rows[pi]
        # owner rule: the pair belongs to the member with the larger primary
        # similarity (smaller primary angle), ties by smaller vec_id — and
        # is emitted only from that member's primary bucket (== this one)
        owner_is_gi = (psim[gi] > psim[aj]) | ((psim[gi] == psim[aj]) & (vid[gi] < vid[aj]))
        keep = (vid[gi] != vid[aj]) & owner_is_gi
        gi, aj = gi[keep], aj[keep]
        a = np.minimum(vid[gi], vid[aj])
        b = np.maximum(vid[gi], vid[aj])
        return pa.table(
            {
                "a_id": pa.array(a, pa.int64()),
                "b_id": pa.array(b, pa.int64()),
                "sim": pa.array(sims[pi[keep], aj], pa.float64()),
            }
        )

    return replicated.groupby("bucket").map_groups(pair_emit, batch_format="pyarrow")


def embeddings_head_matrix(ds, n: int) -> np.ndarray:
    """First n embedding vectors in deterministic read order (no sort) as a
    float64 matrix — the seeded-centroid picker shared with stages/ann.py."""
    head = ds.limit(n).to_pandas()
    return np.stack([np.asarray(e, dtype=np.float64) for e in head["embedding"]])

def _bucket_i64(v: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of int64 node ids — same mix as agg._bucket_of's
    integer path so CC shards and the engine's aggregates agree on owners."""
    from gdal_ray.stages.agg import _MIX

    h = np.zeros(len(v), dtype=np.uint64)
    with np.errstate(over="ignore"):
        h ^= (v.astype(np.uint64) + np.uint64(_MIX[0])) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
    return (h % np.uint64(num_buckets)).astype(np.int64)


class _CCShard:
    """One hash-bucket shard of the pair graph: holds its edge partition
    (src sorted) and the mutable label partition — the 'shared mutable
    index' case where raw Ray actors beat re-shuffling a Dataset per
    round (SURVEY §3: actor state in __init__, vectorized work per call).

    All messages are numpy arrays through the object store; every kernel
    is searchsorted / unique / minimum.reduceat — no per-node Python."""

    def __init__(self, bucket: int, num_buckets: int, edge_refs, node_refs,
                 col_a: str, col_b: str, node_col: str):
        import ray

        srcs, dsts = [], []
        for ref in edge_refs:
            t = ray.get(ref)
            if not len(t) or col_a not in t.column_names:  # empty-schema block
                continue
            a = t.column(col_a).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(col_b).to_numpy(zero_copy_only=False).astype(np.int64)
            for s, d in ((a, b), (b, a)):  # both directions
                mine = _bucket_i64(s, num_buckets) == bucket
                srcs.append(s[mine])
                dsts.append(d[mine])
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        order = np.argsort(src, kind="stable")
        self.esrc, self.edst = src[order], dst[order]

        ns = []
        for ref in node_refs:
            t = ray.get(ref)
            if not len(t) or node_col not in t.column_names:
                continue
            n = t.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
            ns.append(n[_bucket_i64(n, num_buckets) == bucket])
        nodes = np.unique(np.concatenate(ns) if ns else np.empty(0, np.int64))
        self.nodes = nodes                      # sorted unique
        self.labels = nodes.copy()              # label := own id
        self.num_buckets = num_buckets

    def _part(self, keys: np.ndarray, payload: np.ndarray):
        """Split (keys, payload) by owner bucket -> 2*B interleaved arrays."""
        b = _bucket_i64(keys, self.num_buckets)
        out = []
        for o in range(self.num_buckets):
            m = b == o
            out.append(keys[m])
            out.append(payload[m])
        return tuple(out)

    def propagate_out(self):
        """Candidates (dst, label[src]) for every edge, owner-partitioned."""
        lab = self.labels[np.searchsorted(self.nodes, self.esrc)]
        return self._part(self.edst, lab)

    def propagate_in(self, *parts):
        """parts: interleaved (keys, labels) pairs from all shards; apply
        min candidate per owned node.  Returns nothing."""
        ks = [parts[i] for i in range(0, len(parts), 2)]
        vs = [parts[i] for i in range(1, len(parts), 2)]
        k = np.concatenate(ks) if ks else np.empty(0, np.int64)
        v = np.concatenate(vs) if vs else np.empty(0, np.int64)
        if not len(k):
            return
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        idx = np.searchsorted(self.nodes, k)
        starts = np.unique(idx, return_index=True)
        mins = np.minimum.reduceat(v, starts[1])
        self.labels[starts[0]] = np.minimum(self.labels[starts[0]], mins)

    def jump_out(self):
        """Distinct label values this shard needs resolved (label(label(v))),
        owner-partitioned.  Payload slot carries the same keys (unused)."""
        need = np.unique(self.labels)
        return self._part(need, need)

    def resolve(self, *key_arrays):
        """For each requester's key array, return label[key] (keys are node
        ids owned here).  Returns len(key_arrays) aligned arrays."""
        out = []
        for keys in key_arrays:
            out.append(self.labels[np.searchsorted(self.nodes, keys)]
                       if len(keys) else np.empty(0, np.int64))
        return tuple(out) if len(out) > 1 else out[0]

    def jump_in(self, *keys_and_vals):
        """Interleaved (keys, resolved) arrays covering every distinct
        label value; apply label := resolved[label]."""
        k = np.concatenate(keys_and_vals[0::2])
        v = np.concatenate(keys_and_vals[1::2])
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        self.labels = v[np.searchsorted(k, self.labels)]

    def label_sum(self) -> int:
        return int(self.labels.sum())

    def table(self) -> pa.Table:
        return pa.table({"doc_id": pa.array(self.nodes, pa.int64()),
                         "label": pa.array(self.labels, pa.int64())})


def connected_components(edges, nodes, *, col_a: str = "doc_a",
                         col_b: str = "doc_b", node_col: str = "doc_id",
                         max_rounds: int = 50, num_buckets: int = 16,
                         stats_out: dict | None = None):
    """Distributed connected components over a near-dup pair graph ->
    Dataset(doc_id, label) with label = min node id in the component (the
    canonical-representative rule dedup pipelines key their keep/drop
    decision on).

    Round-4 algorithm (VERDICT #5): min-label propagation + POINTER
    JUMPING on hash-bucket actor shards.  Each round:

      1. propagate — every shard emits (dst, label[src]) candidates for
         its edges, partitioned by owner; owners min-reduce
         (searchsorted + minimum.reduceat, no per-node Python).
      2. jump — label'(v) = label(label(v)): shards request their distinct
         label values from the owners and remap.  Knowledge radius ~doubles
         per round, so a diameter-d component converges in ~log2(d) rounds
         (pytest pins ceil(log2 d)+2 on a 10k-node path graph).

    Why raw actors, not Dataset ops: the per-round state is a tiny O(nodes
    in the pair graph) label table — a shared mutable index.  Re-shuffling
    a Dataset 3× per round pays seconds of job overhead per iteration;
    the shards exchange numpy arrays through the object store in
    milliseconds instead (the brief's sanctioned actor carve-out).  The
    static edge partitions are built ONCE from Dataset block refs (each
    shard scans the blocks and keeps its hash share — reads scale with
    edge bytes × 1, held state with edges/B).  Labels only ever decrease,
    so the Σlabel fixpoint test is one cheap reduce over shards.
    """
    import ray
    import ray.data as rd

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            col_a: t.column(col_a).combine_chunks().cast(pa.int64()),
            col_b: t.column(col_b).combine_chunks().cast(pa.int64()),
        })

    edge_refs = edges.map_batches(both_dirs, batch_format="pyarrow").to_arrow_refs()
    node_refs = nodes.map_batches(
        lambda t: pa.table({node_col: t.column(node_col).combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow").to_arrow_refs()

    # num_cpus=0: shards idle between sub-millisecond RPCs; reserving whole
    # cores would deadlock small sessions (16 shards > 4-CPU test session)
    Shard = ray.remote(num_cpus=0)(_CCShard)
    shards = [Shard.remote(b, num_buckets, edge_refs, node_refs,
                           col_a, col_b, node_col)
              for b in range(num_buckets)]
    B = num_buckets
    prev_sum = None
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        outs = [s.propagate_out.options(num_returns=2 * B).remote()
                for s in shards]
        ray.get([shards[o].propagate_in.remote(
                    *[r for s_out in outs for r in s_out[2 * o:2 * o + 2]])
                 for o in range(B)])
        reqs = [s.jump_out.options(num_returns=2 * B).remote() for s in shards]
        # resolved[b][o] = labels for shard b's keys owned by shard o
        resolved = [[shards[o].resolve.remote(reqs[b][2 * o])
                     for o in range(B)] for b in range(B)]
        ray.get([shards[b].jump_in.remote(
                    *[r for o in range(B)
                      for r in (reqs[b][2 * o], resolved[b][o])])
                 for b in range(B)])
        s = sum(ray.get([sh.label_sum.remote() for sh in shards]))
        if s == prev_sum:
            break
        prev_sum = s
    if stats_out is not None:
        stats_out["rounds"] = rounds
    tables = ray.get([s.table.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    return rd.from_arrow(pa.concat_tables(tables))
