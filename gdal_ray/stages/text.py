"""Text-analysis stages for training-data pipelines over the `documents`
table: token counting, quality ratios, language-ID heuristic, document
fingerprinting.  All per-batch, vectorized where the kernel allows; regexes
compiled once per actor (callable classes), mirroring how the reference
builds per-thread state once (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# byte-class lookup tables (ASCII; matches the RE2 \s / [A-Za-z] classes the
# oracles use — UTF-8 continuation bytes fall in none of these classes)
_WS = np.zeros(256, dtype=bool)
_WS[[9, 10, 11, 12, 13, 32]] = True
_ALPHA = np.zeros(256, dtype=bool)
_ALPHA[ord("A") : ord("Z") + 1] = True
_ALPHA[ord("a") : ord("z") + 1] = True
_PUNCT = np.zeros(256, dtype=bool)
_PUNCT[[ord(c) for c in ".,;:!?"]] = True
# word chars for QualityScore: [a-z'] of the lowercased text ⇔ [A-Za-z'] raw
_WORDC = _ALPHA.copy()
_WORDC[ord("'")] = True
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[ord("A") : ord("Z") + 1] += 32


def string_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (utf8_data, absolute offsets[int64, n+1]) of an Arrow
    string column — the foundation of the byte-level text kernels."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
    return data, offs - offs[0]


def _per_doc(counts_cumsum: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-document totals from a global cumsum (handles empty docs that
    reduceat's duplicate-boundary rule would break)."""
    return (counts_cumsum[offs[1:]] - counts_cumsum[offs[:-1]]).astype(np.int64)


def _cum(mask: np.ndarray) -> np.ndarray:
    # int32 is plenty: per-batch byte counts are far below 2^31, and the
    # narrower accumulator halves the cumsum cost on the hot path
    out = np.empty(len(mask) + 1, dtype=np.int32)
    out[0] = 0
    np.cumsum(mask, dtype=np.int32, out=out[1:])
    return out


def _run_starts(member: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Bool mask of positions that start a maximal run of `member` bytes,
    treating every document start as preceded by a non-member byte."""
    prev_out = np.empty_like(member)
    if len(member):
        prev_out[0] = True
        np.logical_not(member[:-1], out=prev_out[1:])
    starts = offs[:-1]
    prev_out[starts[starts < len(member)]] = True
    return member & prev_out


def run_spans(member: np.ndarray, starts_mask: np.ndarray, offs: np.ndarray):
    """(start_positions, lengths) of every maximal `member` run, with runs
    split at document boundaries (matching `starts_mask` from
    :func:`_run_starts`)."""
    ends_mask = np.empty_like(member)
    if len(member):
        ends_mask[-1] = True
        np.logical_not(member[1:], out=ends_mask[:-1])
    last = offs[1:] - 1
    ends_mask[last[last >= 0]] = True
    ends_mask &= member
    w_start = np.nonzero(starts_mask)[0]
    w_end = np.nonzero(ends_mask)[0]
    return w_start, w_end - w_start + 1


# GPT-2-style pre-tokenizer, RE2-compatible (no lookahead): contraction
# suffixes, space-prefixed letter/digit/punct runs, whitespace runs.
# Arrow's count_substring_regex and DuckDB's regexp_extract_all both run
# RE2, so the IDENTICAL pattern is the exact oracle (pytest-pinned).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe) — BPE-ish pre-tokenizer match counts, one
    vectorized RE2 pass over the Arrow string column (no Python loop)."""
    n = pc.count_substring_regex(batch.column("text"), BPE_PATTERN)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bpe": pc.cast(n, pa.int64()),
        }
    )


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_chars, n_alpha) — whitespace-run token counts
    (no empty tokens), mirrored exactly by the oracle SQL's
    regexp_split_to_array(trim(text), '\\s+') with an empty-string guard.
    Zero-copy byte-level numpy over the Arrow string buffers: one lookup +
    cumsum per metric, no per-row Python and no regex engine."""
    data, offs = string_bytes(batch.column("text"))
    # arithmetic byte classes beat a 256-entry gather ~2x (SIMD compares)
    nonspace = ~((data == 32) | ((data >= 9) & (data <= 13)))
    tok_starts = _run_starts(nonspace, offs)
    n_tokens = _per_doc(_cum(tok_starts), offs)
    # codepoints = byte length minus UTF-8 continuation bytes; continuation
    # bytes are absent entirely in ASCII corpora, so count them sparsely
    # (nonzero + searchsorted) instead of a dense third cumsum
    cont = (data & 0xC0) == 0x80
    n_chars = offs[1:] - offs[:-1]
    cont_pos = np.nonzero(cont)[0]
    if len(cont_pos):
        doc_of = np.searchsorted(offs, cont_pos, side="right") - 1
        n_chars = n_chars - np.bincount(doc_of, minlength=len(batch))
    n_chars = n_chars.astype(np.int64)
    lo = data | 0x20
    n_alpha = _per_doc(_cum((lo >= 97) & (lo <= 122)), offs)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_alpha": pa.array(n_alpha, pa.int64()),
        }
    )


class QualityScore:
    """Length / punctuation / stopword quality ratios (actor-pool stage;
    regex + stopword set built once per actor)."""

    STOPWORDS = {
        "the", "and", "of", "a", "to", "in", "is", "that", "it", "for",
        "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
    }

    def __init__(self):
        # word = maximal [a-z']+ run of the lowercased text (⇔ [A-Za-z']
        # run of the raw bytes).  Every stopword is ≤ 8 bytes, so a word's
        # first 8 lowercased bytes packed little-endian into a uint64 give
        # an exact membership test via np.isin — no regex engine at all.
        self._sw_codes = np.array(
            sorted(int.from_bytes(w.encode(), "little") for w in self.STOPWORDS),
            dtype=np.uint64,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offs = string_bytes(batch.column("text"))
        ndoc = len(batch)
        wordc = _WORDC[data]
        starts_mask = _run_starts(wordc, offs)
        nw = _per_doc(_cum(starts_mask), offs).astype(np.float64)
        word_chars = _per_doc(_cum(wordc), offs).astype(np.float64)
        n_punct = _per_doc(_cum(_PUNCT[data]), offs).astype(np.float64)
        n_chars = _per_doc(_cum((data & 0xC0) != 0x80), offs).astype(np.float64)
        w_start, w_len = run_spans(wordc, starts_mask, offs)
        val = np.zeros(len(w_start), dtype=np.uint64)
        ldata = _LOWER[data]
        for i in range(8):
            m = w_len > i
            val[m] |= ldata[w_start[m] + i].astype(np.uint64) << np.uint64(8 * i)
        # words longer than 8 bytes pack 8 nonzero bytes → cannot collide
        # with any (≤8-byte, zero-high-byte) stopword code
        hit = np.isin(val, self._sw_codes) & (w_len <= 8)
        doc_of = np.searchsorted(offs, w_start[hit], side="right") - 1
        n_stop = np.bincount(doc_of, minlength=ndoc).astype(np.float64)
        nw1 = np.maximum(nw, 1.0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "stop_ratio": pa.array(n_stop / nw1),
                "punct_per_100": pa.array(100.0 * n_punct / np.maximum(n_chars, 1.0)),
                "mean_word_len": pa.array(word_chars / nw1),
            }
        )


class LangId:
    """Character-n-gram language-ID heuristic (no model libs in sandbox).

    Scores a handful of language profiles by frequency of very common
    function words + diacritic classes; deterministic, vectorized over the
    profile loop.  Intended as the Ray-side plumbing for a real fastText/
    CLD-style model (swap __call__'s scorer)."""

    PROFILES = {
        "en": (" the ", " and ", " of ", " is "),
        "de": (" der ", " und ", " die ", " ist "),
        "fr": (" le ", " la ", " et ", " est "),
        "es": (" el ", " de ", " la ", " que "),
        "it": (" il ", " di ", " che ", " la "),
    }

    def __call__(self, batch: pa.Table) -> pa.Table:
        # marker " xyz " ⇔ a space-delimited run equal to "xyz" (markers are
        # all ≤ 8 bytes, so the packed-uint64 word trick applies verbatim)
        data, offs = string_bytes(batch.column("text"))
        n = len(batch)
        member = data != 0x20
        starts_mask = _run_starts(member, offs)
        w_start, w_len = run_spans(member, starts_mask, offs)
        val = np.zeros(len(w_start), dtype=np.uint64)
        ldata = _LOWER[data]
        for i in range(8):
            m = w_len > i
            val[m] |= ldata[w_start[m] + i].astype(np.uint64) << np.uint64(8 * i)
        short = w_len <= 8
        doc_of = np.searchsorted(offs, w_start, side="right") - 1
        langs = list(self.PROFILES)
        scores = np.zeros((n, len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            codes = np.array(
                [int.from_bytes(mk.strip().encode(), "little") for mk in self.PROFILES[lang]],
                dtype=np.uint64,
            )
            hit = np.isin(val, codes) & short
            scores[:, j] = np.bincount(doc_of[hit], minlength=n)
        best = np.argmax(scores, axis=1)
        hit = scores[np.arange(n), best] > 0
        pred = np.where(hit, np.array(langs, dtype=object)[best], "und")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(pred.tolist(), pa.string()),
            }
        )


def fingerprint_batch(batch: pa.Table, *, window: int = 8) -> pa.Table:
    """64-bit rolling (Rabin-Karp-style) document fingerprint: min-hash of
    all `window`-byte rolling hashes — a cheap content fingerprint stable
    under small shifts, vectorized with numpy stride tricks."""
    texts = batch.column("text").to_pylist()
    out = np.empty(len(texts), np.int64)
    B = np.uint64(1099511628211)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < window:
            b = np.pad(b, (0, window - len(b)))
        npos = len(b) - window + 1
        h = np.zeros(npos, dtype=np.uint64)
        for w in range(window):
            h = h * B + b[w : w + npos].astype(np.uint64)
        out[i] = np.int64(np.uint64(h.min()).astype(np.int64))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(out, pa.int64()),
        }
    )
