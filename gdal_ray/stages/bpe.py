"""BPE tokenizer training over a document corpus — the tokenizer-building
step of an LLM data pipeline (Sennrich et al. 2016, public algorithm; the
same architecture HF tokenizers uses: distributed word counting, then the
merge loop over the word-frequency TABLE, which is vocabulary-sized, not
corpus-sized).

  distributed  word counts: pc.split_pattern_regex per batch (vectorized
               Arrow kernel) → per-batch partial counts → ONE hash-bucket
               aggregate by word.  The corpus is read once; only (word,
               count) rows shuffle.
  driver       classic merge loop over the word-freq dict: count symbol
               pairs weighted by word frequency, merge the best pair
               (tie-break: highest count, then lexicographically smallest
               pair — fully deterministic), repeat.
  distributed  encoding: an actor-pool stage compiles the merge ranks
               once per actor (__init__) and applies the standard
               rank-greedy merge to each word, memoized per distinct word.

The end-of-word marker '</w>' is appended as its own symbol (the original
paper's formulation), so merges can capture suffixes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.stages.agg import grouped_aggregate

_SPLIT_RE = r"\s+"
END = "</w>"


def word_counts(ds, *, col: str = "text"):
    """Distributed exact word-frequency table: (word, n), whitespace-run
    tokenization (regexp_split_to_array(text, '\\s+') is the DuckDB
    oracle twin)."""
    def partial(b: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern_regex(b.column(col), _SPLIT_RE))
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["word"], [("n", "sum", "n")])


def _pairs(sym: tuple) -> list[tuple]:
    return [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]


def _merge_word(sym: tuple, pair: tuple, joined: str) -> tuple:
    out = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train(word_freqs: dict[str, int], num_merges: int) -> list[tuple]:
    """Classic BPE merge loop over a word-frequency dict.  Deterministic:
    best pair = (highest total count, then lexicographically smallest).
    Returns the ordered merge list [(left, right), ...]."""
    vocab = {tuple(w) + (END,): f for w, f in word_freqs.items() if w}
    merges: list[tuple] = []
    for _ in range(num_merges):
        counts: dict[tuple, int] = {}
        for sym, f in vocab.items():
            for p in _pairs(sym):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        joined = best[0] + best[1]
        vocab = {_merge_word(s, best, joined): f for s, f in vocab.items()}
        merges.append(best)
    return merges


def bpe_train_distributed(ds, *, col: str = "text",
                          num_merges: int = 64) -> list[tuple]:
    """Distributed word counting + driver-side merge loop."""
    import ray

    tbls = [t for t in ray.get(word_counts(ds, col=col).to_arrow_refs())
            if t.num_columns and len(t)]
    wf: dict[str, int] = {}
    for t in tbls:
        for w, n in zip(t.column("word").to_pylist(),
                        t.column("n").to_pylist()):
            wf[w] = wf.get(w, 0) + n
    return bpe_train(wf, num_merges)


def bpe_encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Standard rank-greedy BPE encode of one word (GPT-2 bpe() shape)."""
    sym = tuple(word) + (END,)
    while len(sym) > 1:
        cand = [(ranks[p], p) for p in _pairs(sym) if p in ranks]
        if not cand:
            break
        _, best = min(cand)
        sym = _merge_word(sym, best, best[0] + best[1])
    return list(sym)


class BpeEncoder:
    """Actor-pool stage: merge ranks compiled once per actor; per-word
    memoization across batches (Zipf makes the cache hit rate high).
    Emits (doc_id, n_tokens, n_words)."""

    def __init__(self, merges: list[tuple]):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        words_per_doc = pc.split_pattern_regex(batch.column("text"),
                                               _SPLIT_RE)
        n_tokens = []
        n_words = []
        for lst in words_per_doc.to_pylist():
            tot = 0
            nw = 0
            for w in lst:
                if not w:
                    continue
                nw += 1
                n = self.cache.get(w)
                if n is None:
                    n = len(bpe_encode_word(w, self.ranks))
                    self.cache[w] = n
                tot += n
            n_tokens.append(tot)
            n_words.append(nw)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        })
