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


# Per-language seed text for the trigram profiles (original sentences
# composed for this module — ordinary prose dense in each language's
# function words; no external corpus exists in this sandbox).  The
# classifier method is Cavnar & Trenkle, "N-Gram-Based Text
# Categorization" (1994, public).
_LANG_SEED = {
    "en": ("the house at the end of the street was quiet and the children "
           "were still asleep when the morning light came in through the "
           "window and touched the table where the books had been left "
           "open since the night before and nobody wanted to be the first "
           "to speak about what they had seen in the garden that evening "
           "because it would have changed everything between them forever"),
    "de": ("das haus am ende der straße war still und die kinder schliefen "
           "noch als das licht des morgens durch das fenster kam und den "
           "tisch berührte auf dem die bücher seit der nacht offen lagen "
           "und niemand wollte der erste sein der über das sprach was sie "
           "am abend im garten gesehen hatten denn es hätte alles zwischen "
           "ihnen für immer verändert"),
    "fr": ("la maison au bout de la rue était calme et les enfants "
           "dormaient encore quand la lumière du matin est entrée par la "
           "fenêtre et a touché la table où les livres étaient restés "
           "ouverts depuis la nuit et personne ne voulait être le premier "
           "à parler de ce qu'ils avaient vu dans le jardin ce soir-là car "
           "cela aurait tout changé entre eux pour toujours"),
    "es": ("la casa al final de la calle estaba tranquila y los niños "
           "dormían todavía cuando la luz de la mañana entró por la "
           "ventana y tocó la mesa donde los libros habían quedado "
           "abiertos desde la noche y nadie quería ser el primero en "
           "hablar de lo que habían visto en el jardín esa tarde porque "
           "habría cambiado todo entre ellos para siempre"),
    "it": ("la casa in fondo alla strada era tranquilla e i bambini "
           "dormivano ancora quando la luce del mattino è entrata dalla "
           "finestra e ha toccato il tavolo dove i libri erano rimasti "
           "aperti dalla notte e nessuno voleva essere il primo a parlare "
           "di quello che avevano visto nel giardino quella sera perché "
           "avrebbe cambiato tutto tra di loro per sempre"),
    "pt": ("a casa no fim da rua estava tranquila e as crianças ainda "
           "dormiam quando a luz da manhã entrou pela janela e tocou a "
           "mesa onde os livros tinham ficado abertos desde a noite e "
           "ninguém queria ser o primeiro a falar sobre o que tinham "
           "visto no jardim naquela tarde porque teria mudado tudo entre "
           "eles para sempre"),
    "nl": ("het huis aan het einde van de straat was stil en de kinderen "
           "sliepen nog toen het licht van de ochtend door het raam kwam "
           "en de tafel raakte waar de boeken sinds de nacht open hadden "
           "gelegen en niemand wilde de eerste zijn die sprak over wat ze "
           "die avond in de tuin hadden gezien want het zou alles tussen "
           "hen voor altijd hebben veranderd"),
}

# UTF-8 lead-byte script buckets for non-Latin scripts: a cheap
# decode-free majority vote that routes whole scripts before the trigram
# scorer runs (the trigram profiles are Latin-script only).
_SCRIPT_RANGES = (
    ("ru", 0xD0, 0xD1), ("el", 0xCE, 0xCF), ("he", 0xD6, 0xD7),
    ("ar", 0xD8, 0xDB), ("hi", 0xE0, 0xE0),
    ("ja", 0xE3, 0xE3), ("zh", 0xE4, 0xE9), ("ko", 0xEA, 0xED),
)


class LangId:
    """Character-trigram language ID (Cavnar & Trenkle 1994, public
    method): per-language byte-trigram profiles built once per actor in
    __init__ from the embedded seed text, documents scored by summed
    profile weight per trigram occurrence (vectorized: pack 3 lowercased
    bytes → uint32, searchsorted into the merged vocab, one np.add.at).
    Non-Latin scripts short-circuit via UTF-8 lead-byte majority
    (Cyrillic/Greek/Arabic/Hebrew/Devanagari/CJK/kana/Hangul).  Output:
    (doc_id, lang_pred) with 'und' for scoreless docs."""

    def __init__(self, top_k: int = 400):
        langs = sorted(_LANG_SEED)
        vocab: dict[int, int] = {}
        rows = []
        for lang in langs:
            raw = _LOWER[np.frombuffer(
                (" " + _LANG_SEED[lang] + " ").encode(), np.uint8)]
            tri = (raw[:-2].astype(np.uint32) << 16) | \
                  (raw[1:-1].astype(np.uint32) << 8) | raw[2:].astype(np.uint32)
            codes, counts = np.unique(tri, return_counts=True)
            order = np.argsort(-counts)[:top_k]
            codes, counts = codes[order], counts[order]
            w = counts / counts.sum()   # profile = normalized trigram freq
            row = {}
            for c, v in zip(codes.tolist(), w.tolist()):
                row[c] = v
                vocab.setdefault(c, len(vocab))
            rows.append(row)
        self.langs = langs
        self._vocab = np.array(sorted(vocab), dtype=np.uint32)
        self._W = np.zeros((len(self._vocab), len(langs)), dtype=np.float64)
        pos = {int(c): i for i, c in enumerate(self._vocab)}
        for j, row in enumerate(rows):
            for c, v in row.items():
                self._W[pos[c], j] = v

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offs = string_bytes(batch.column("text"))
        n = len(batch)
        scores = np.zeros((n, len(self.langs)), dtype=np.float64)

        # script vote on non-ASCII lead bytes (continuation bytes excluded)
        lead = (data >= 0xC2)
        if lead.any():
            script_scores = np.zeros((n, len(_SCRIPT_RANGES)), dtype=np.int64)
            doc_of_b = np.searchsorted(offs, np.flatnonzero(lead),
                                       side="right") - 1
            lb = data[lead]
            for j, (_lang, lo, hi) in enumerate(_SCRIPT_RANGES):
                m = (lb >= lo) & (lb <= hi)
                script_scores[:, j] = np.bincount(doc_of_b[m], minlength=n)
            # Japanese: kana (0xE3) vs CJK ideographs both appear in ja text;
            # any kana at all outweighs han counts for the ja/zh call
            ja = [j for j, s in enumerate(_SCRIPT_RANGES) if s[0] == "ja"][0]
            zh = [j for j, s in enumerate(_SCRIPT_RANGES) if s[0] == "zh"][0]
            has_kana = script_scores[:, ja] > 0
            script_scores[has_kana, ja] += script_scores[has_kana, zh] + 1
        else:
            script_scores = None

        # latin trigram scoring
        ldata = _LOWER[data]
        if len(ldata) >= 3:
            tri = (ldata[:-2].astype(np.uint32) << 16) | \
                  (ldata[1:-1].astype(np.uint32) << 8) | \
                  ldata[2:].astype(np.uint32)
            # drop trigrams that straddle document boundaries
            idx = np.arange(len(tri))
            d0 = np.searchsorted(offs, idx, side="right") - 1
            d2 = np.searchsorted(offs, idx + 2, side="right") - 1
            same = d0 == d2
            vi = np.searchsorted(self._vocab, tri[same])
            vi_ok = (vi < len(self._vocab)) & \
                (self._vocab[np.minimum(vi, len(self._vocab) - 1)]
                 == tri[same])
            docs = d0[same][vi_ok]
            np.add.at(scores, docs, self._W[vi[vi_ok]])
            ntri = np.maximum(np.bincount(d0[same], minlength=n), 1)
            scores /= ntri[:, None]

        best = np.argmax(scores, axis=1)
        top = scores[np.arange(n), best]
        pred = np.where(top > 0, np.array(self.langs, dtype=object)[best],
                        "und")
        if script_scores is not None:
            sbest = np.argmax(script_scores, axis=1)
            stop = script_scores[np.arange(n), sbest]
            # script wins when non-Latin bytes dominate the trigram signal
            use = stop > 8
            names = np.array([s[0] for s in _SCRIPT_RANGES], dtype=object)
            pred = np.where(use, names[sbest], pred)
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


def clean_text_batch(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """Training-data text cleaning (the Common-Crawl-style normalize
    step): strip HTML-ish tags, collapse whitespace runs to one space,
    trim — three vectorized RE2 kernels over the Arrow string column.
    The IDENTICAL regexes run in DuckDB's RE2 (regexp_replace ... 'g'),
    so the oracle is exact."""
    s = batch.column(col)
    s = pc.replace_substring_regex(s, pattern="<[^>]*>", replacement=" ")
    s = pc.replace_substring_regex(s, pattern="\\s+", replacement=" ")
    s = pc.utf8_trim_whitespace(s)
    out = batch.drop_columns([col]).append_column("clean", s)
    return out.append_column(
        "clean_len", pc.cast(pc.utf8_length(s), pa.int64()))
