"""Text analysis stages: token stats, quality scores, language ID, fingerprints.

Large-scale training-data-pipeline operators (no reference counterpart;
first-class per the build brief).  All stages are vectorized
``map_batches`` bodies over Arrow batches:

* ``TokenStats`` — whitespace + BPE-ish regex token counts, char stats;
* ``QualityScore`` — length / punctuation / stopword-ratio heuristics;
* ``LangId`` — stopword-hit-rate n-gram heuristic over a tiny per-language
  lexicon (deterministic; a stand-in for a fasttext-style model, which
  would load in ``__init__`` of the same actor shape);
* ``Fingerprint`` — 64-bit rolling-hash document fingerprint.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import SEED_FEATURE, hash128

_STOPWORDS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "zu", "von", "mit"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "就", "不", "人"},
}


def _tokens(batch_text: pa.ChunkedArray | pa.Array) -> pa.Array:
    col = batch_text.combine_chunks() if isinstance(batch_text, pa.ChunkedArray) else batch_text
    return pc.split_pattern(col, pattern=" ")


class TokenStats:
    """(id, text) -> id, n_tokens, n_chars, n_bpe_tokens, avg_token_len."""

    # BPE-ish pre-tokenizer (GPT-2-style contractions/word/number/punct
    # split), RE2 syntax for Arrow's count_substring_regex: \p{L}\p{N}_
    # mirrors Python's Unicode \w so CJK text tokenizes identically.
    _BPE_RE2 = r"'s|'t|'re|'ve|'m|'ll|'d| ?[\p{L}\p{N}_]+| ?[^\s\p{L}\p{N}_]+|\s+"

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _tokens(batch[self.text_col])
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        n_chars = pc.utf8_length(batch[self.text_col]).cast(pa.int64())
        # Arrow-native non-overlapping match count — no per-row Python regex
        n_bpe = pc.count_substring_regex(batch[self.text_col], self._BPE_RE2).cast(pa.int64())
        avg_len = pc.divide(
            pc.cast(pc.subtract(n_chars, pc.subtract(n_tokens, 1)), pa.float64()),
            pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": n_tokens,
                "n_chars": n_chars,
                "n_bpe_tokens": n_bpe,
                "avg_token_len": avg_len,
            }
        )


class QualityScore:
    """Heuristic quality scoring: stopword ratio, alpha ratio, repetition."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", lang: str = "en"):
        self.text_col = text_col
        self.id_col = id_col
        self.stop = pa.array(sorted(_STOPWORDS[lang]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _tokens(batch[self.text_col])
        flat = pc.list_flatten(toks)
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        is_stop = pc.is_in(pc.utf8_lower(flat), value_set=self.stop).to_numpy(zero_copy_only=False)
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        stop_per_doc = np.add.reduceat(is_stop.astype(np.float64), offsets[:-1]) if len(flat) else np.zeros(len(lengths))
        stop_per_doc[lengths == 0] = 0.0
        stop_ratio = stop_per_doc / np.maximum(lengths, 1)
        # distinct-token ratio (repetition proxy): distinct/total per doc
        h1, _ = hash128(flat, SEED_FEATURE)
        doc_idx = np.repeat(np.arange(len(lengths)), lengths)
        order = np.lexsort((h1, doc_idx))
        dd, hh = doc_idx[order], h1[order]
        new = np.ones(len(hh), dtype=bool)
        if len(hh) > 1:
            new[1:] = (hh[1:] != hh[:-1]) | (dd[1:] != dd[:-1])
        distinct = np.bincount(dd, weights=new.astype(np.float64), minlength=len(lengths))
        distinct_ratio = distinct / np.maximum(lengths, 1)
        n_chars = pc.utf8_length(batch[self.text_col]).to_numpy(zero_copy_only=False)
        score = (
            0.4 * np.clip(lengths / 100.0, 0, 1)
            + 0.3 * distinct_ratio
            + 0.3 * (1.0 - np.abs(stop_ratio - 0.4))
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(lengths, pa.int64()),
                "stop_ratio": pa.array(stop_ratio),
                "distinct_ratio": pa.array(distinct_ratio),
                "quality": pa.array(score),
            }
        )


class LangId:
    """Stopword-hit-rate language classifier (deterministic heuristic)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.sets = {lang: pa.array(sorted(ws)) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _tokens(batch[self.text_col])
        flat = pc.utf8_lower(pc.list_flatten(toks))
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        scores = np.zeros((len(self.sets), len(lengths)))
        for i, (lang, ws) in enumerate(self.sets.items()):
            hits = pc.is_in(flat, value_set=ws).to_numpy(zero_copy_only=False).astype(np.float64)
            per_doc = np.add.reduceat(hits, offsets[:-1]) if len(flat) else np.zeros(len(lengths))
            per_doc[lengths == 0] = 0.0
            scores[i] = per_doc / np.maximum(lengths, 1)
        langs = list(self.sets.keys())
        best = np.argmax(scores, axis=0)
        conf = scores[best, np.arange(len(lengths))]
        pred = np.where(conf > 0.0, np.array(langs, dtype=object)[best], "und")
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "lang_pred": pa.array(pred.astype(str)),
                "lang_conf": pa.array(conf),
            }
        )


class Fingerprint:
    """64-bit document fingerprint: murmur3-h1 of the full text (exact-dedup
    key) + a rolling-window min-hash (content-shift tolerant)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", window: int = 8):
        self.text_col = text_col
        self.id_col = id_col
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h1, _ = hash128(col, SEED_FEATURE)
        # rolling min over word-window shingles
        toks = pc.split_pattern(col, pattern=" ")
        flat = pc.list_flatten(toks)
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        th, _ = hash128(flat, SEED_FEATURE + 1)
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        # vectorized rolling min: GLOBAL width-w window sums (uint64 modular
        # arithmetic makes the global cumsum difference equal the per-doc
        # sum), windows crossing a doc boundary masked to MAX, per-doc min
        # via one reduceat over the long-doc segments — no per-doc loop.
        n_docs = len(lengths)
        roll = np.zeros(n_docs, dtype=np.uint64)
        N = th.size
        w = self.window
        with np.errstate(over="ignore"):
            ext = np.zeros(N + 1, dtype=np.uint64)
            np.cumsum(th, dtype=np.uint64, out=ext[1:])
            long = lengths >= w
            short = (lengths > 0) & ~long
            if short.any():  # shorter than the window: one full-doc sum
                roll[short] = ext[offsets[1:][short]] - ext[offsets[:-1][short]]
            if long.any() and N >= w:
                wins = ext[w:] - ext[: N - w + 1]  # wins[s] = sum th[s:s+w]
                doc_idx = np.repeat(np.arange(n_docs), lengths)
                valid = doc_idx[: N - w + 1] == doc_idx[w - 1 :]
                wins = np.where(valid, wins, np.uint64(0xFFFFFFFFFFFFFFFF))
                starts = offsets[:-1][long]
                roll[long] = np.minimum.reduceat(wins, starts)
        from ..hashing import hex64

        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "content_hash": pa.array(hex64(h1)),
                "rolling_fp": pa.array(hex64(roll)),
            }
        )
