"""Text-analysis stages for training-data pipelines over the `documents`
table: token counting, quality ratios, language-ID heuristic, document
fingerprinting.  All per-batch, vectorized where the kernel allows; regexes
compiled once per actor (callable classes), mirroring how the reference
builds per-thread state once (SURVEY.md §2.3).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_chars, n_alpha) — Python str.split() whitespace
    semantics (runs of whitespace, no empty tokens), mirrored exactly by the
    oracle SQL's regexp_split_to_array(trim(text), '\\s+') with an empty-
    string guard."""
    texts = batch.column("text").to_pylist()
    n = len(texts)
    n_tokens = np.empty(n, np.int64)
    n_chars = np.empty(n, np.int64)
    n_alpha = np.empty(n, np.int64)
    for i, t in enumerate(texts):
        n_tokens[i] = len(t.split())
        n_chars[i] = len(t)
        n_alpha[i] = sum(c.isascii() and c.isalpha() for c in t)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens),
            "n_chars": pa.array(n_chars),
            "n_alpha": pa.array(n_alpha),
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
        self.word_re = re.compile(r"[A-Za-z']+")
        self.punct_re = re.compile(r"[.,;:!?]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        stop_ratio = np.empty(n, np.float64)
        punct_per_100 = np.empty(n, np.float64)
        mean_word_len = np.empty(n, np.float64)
        for i, t in enumerate(texts):
            words = self.word_re.findall(t.lower())
            nw = max(len(words), 1)
            stop_ratio[i] = sum(w in self.STOPWORDS for w in words) / nw
            punct_per_100[i] = 100.0 * len(self.punct_re.findall(t)) / max(len(t), 1)
            mean_word_len[i] = sum(len(w) for w in words) / nw
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "stop_ratio": pa.array(stop_ratio),
                "punct_per_100": pa.array(punct_per_100),
                "mean_word_len": pa.array(mean_word_len),
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
        texts = [f" {t.lower()} " for t in batch.column("text").to_pylist()]
        n = len(texts)
        scores = np.zeros((n, len(self.PROFILES)), dtype=np.int64)
        langs = list(self.PROFILES)
        for j, lang in enumerate(langs):
            for marker in self.PROFILES[lang]:
                scores[:, j] += np.fromiter((t.count(marker) for t in texts), dtype=np.int64, count=n)
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
