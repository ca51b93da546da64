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

from ..hashing import SEED_FEATURE, hash128, hash128_keyed

_STOPWORDS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "zu", "von", "mit"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "就", "不", "人"},
}


def _text(batch_text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Text column normalized for the vectorized kernels: one chunk,
    nulls as "" — a null row otherwise becomes a NULL token list whose
    list_value_length is null -> NaN -> INT64_MIN under .astype(int64),
    crashing np.repeat/reduceat for the whole stage."""
    col = batch_text.combine_chunks() if isinstance(batch_text, pa.ChunkedArray) else batch_text
    if pa.types.is_null(col.type):
        # an all-null block materializes as type null; fill_null can't
        # make a string scalar for it — cast first
        col = col.cast(pa.string())
    return pc.fill_null(col, "")


def _tokens(batch_text: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.split_pattern(_text(batch_text), pattern=" ")


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
        text = _text(batch[self.text_col])
        toks = pc.split_pattern(text, pattern=" ")
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        n_chars = pc.utf8_length(text).cast(pa.int64())
        # Arrow-native non-overlapping match count — no per-row Python regex
        n_bpe = pc.count_substring_regex(text, self._BPE_RE2).cast(pa.int64())
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
        h1, _ = hash128_keyed(flat, SEED_FEATURE)
        doc_idx = np.repeat(np.arange(len(lengths)), lengths)
        order = np.lexsort((h1, doc_idx))
        dd, hh = doc_idx[order], h1[order]
        new = np.ones(len(hh), dtype=bool)
        if len(hh) > 1:
            new[1:] = (hh[1:] != hh[:-1]) | (dd[1:] != dd[:-1])
        distinct = np.bincount(dd, weights=new.astype(np.float64), minlength=len(lengths))
        distinct_ratio = distinct / np.maximum(lengths, 1)
        n_chars = pc.utf8_length(_text(batch[self.text_col])).to_numpy(zero_copy_only=False)
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
        col = _text(batch[self.text_col])
        h1, _ = hash128(col, SEED_FEATURE)
        # rolling min over word-window shingles
        toks = pc.split_pattern(col, pattern=" ")
        flat = pc.list_flatten(toks)
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        th, _ = hash128_keyed(flat, SEED_FEATURE + 1)
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


# ---------------------------------------------------------------------------
# decontamination: word-n-gram overlap against a benchmark set
# ---------------------------------------------------------------------------

def doc_ngrams(texts, n: int) -> tuple[pa.Array, np.ndarray]:
    """All word n-grams of every text, fully vectorized.

    Returns (grams, doc_index): ``grams[i]`` is an n-gram string of doc
    ``doc_index[i]``.  A doc with fewer than n tokens contributes its
    whole text as ONE gram (clamped-slice semantics, mirrors the SQL
    twin ``t[i:i+n-1]``).  No per-row Python: one split, n shifted
    slices of the flat token array, one element-wise join.
    """
    # normalize ONCE so the short-doc path below takes from the same
    # single-chunk, null-filled array (a chunked column previously broke
    # concat_arrays whenever any doc had fewer than n tokens)
    texts = _text(texts)
    toks = pc.split_pattern(texts, pattern=" ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(flat)
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    pieces_g, pieces_d = [], []
    if m >= n:
        parts = [flat.slice(i, m - n + 1) for i in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        valid = np.flatnonzero(doc_of[: m - n + 1] == doc_of[n - 1:])
        pieces_g.append(grams.take(pa.array(valid)))
        pieces_d.append(doc_of[valid])
    short = np.flatnonzero((counts < n) & (counts > 0))
    if len(short):
        pieces_g.append(texts.take(pa.array(short)))
        pieces_d.append(short)
    if not pieces_g:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    return (
        pa.concat_arrays([p.cast(pa.string()) for p in pieces_g]),
        np.concatenate(pieces_d),
    )


def benchmark_ngram_table(bench_ds, *, text_col: str, id_col: str, n: int) -> pa.Table:
    """Distinct (gram, min bench id, max bench id) over a benchmark
    Dataset.  Distributed gram generation with per-block pre-aggregation;
    only the deduplicated gram table reaches the driver — fine by
    construction (benchmark suites are small even when the corpus is
    100 TB; the corpus itself never comes back)."""

    def _grams(batch: pa.Table) -> pa.Table:
        grams, doc_idx = doc_ngrams(batch[text_col], n)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        import pandas as pd

        df = pd.DataFrame({"gram": grams.to_pandas(), "id": ids})
        g = df.groupby("gram", sort=False, as_index=False).agg(
            min_id=("id", "min"), max_id=("id", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    import pandas as pd

    parts = bench_ds.map_batches(_grams, batch_format="pyarrow").to_pandas()
    if "gram" not in parts.columns:
        # zero-block empty benchmark set: Ray never ran _grams
        return pa.table({"gram": pa.array([], pa.string()),
                         "min_id": pa.array([], pa.int64()),
                         "max_id": pa.array([], pa.int64())})
    final = parts.groupby("gram", sort=False, as_index=False).agg(
        min_id=("min_id", "min"), max_id=("max_id", "max")
    )
    return pa.Table.from_pandas(final, preserve_index=False).replace_schema_metadata(None)


class Decontaminate:
    """Flag corpus docs sharing any word n-gram with a benchmark set.

    The benchmark gram table broadcasts once (``ray.put``); each batch
    runs ONE hashed set-membership probe (``pc.index_in``) over all its
    grams, then a vectorized self-match exclusion: a doc is contaminated
    iff some gram is held by a benchmark doc OTHER than itself (so
    benchmark members aren't flagged by their own grams).  Emits the
    (id) rows of contaminated docs — docs are one row each, so no
    global dedup pass is needed.
    """

    def __init__(self, gram_table_ref, *, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 8):
        self._ref = gram_table_ref
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self._grams = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._grams is None:
            import ray

            t = ray.get(self._ref) if not isinstance(self._ref, pa.Table) else self._ref
            self._grams = t["gram"].combine_chunks()
            self._min = t["min_id"].to_numpy(zero_copy_only=False)
            self._max = t["max_id"].to_numpy(zero_copy_only=False)
        grams, doc_idx = doc_ngrams(batch[self.text_col], self.n)
        pos = pc.index_in(grams, value_set=self._grams)
        hit_rows = np.flatnonzero(pos.is_valid().to_numpy(zero_copy_only=False))
        flag = np.zeros(batch.num_rows, dtype=bool)
        if len(hit_rows):
            ids = batch[self.id_col].to_numpy(zero_copy_only=False)
            p = pos.take(pa.array(hit_rows)).to_numpy(zero_copy_only=False)
            d = doc_idx[hit_rows]
            other = (self._min[p] != ids[d]) | (self._max[p] != ids[d])
            flag[np.unique(d[other])] = True
        return batch.select([self.id_col]).filter(pa.array(flag))


class RepetitionStats:
    """(id, text) -> per-doc token-repetition quality signals:
    n_tokens, n_distinct, max_token_count, dup_token_frac
    (1 - distinct/total), top_token_frac (most-common-token share).

    The Gopher-style repetition filters ("fraction of duplicate
    content") for pretraining corpora, computed exactly.  Fully
    vectorized per batch: one Arrow split, one factorize over the
    batch's flattened tokens, one lexsort, then bincount/reduceat per
    doc — no per-row Python.  The fractions are single float64 ops over
    exact integers, so any SQL engine reproduces them bit-identically.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        n = batch.num_rows
        toks = _tokens(batch[self.text_col])
        lens = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        codes, _ = pd.factorize(flat.to_pandas())
        order = np.lexsort((codes, doc_idx))
        d_s, c_s = doc_idx[order], codes[order]
        total = len(d_s)
        new_run = np.empty(total, dtype=bool)
        if total:
            new_run[0] = True
            new_run[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        run_starts = np.flatnonzero(new_run)
        run_doc = d_s[run_starts]
        run_len = np.diff(np.append(run_starts, total))
        n_distinct = np.bincount(run_doc, minlength=n).astype(np.int64)
        max_cnt = np.zeros(n, dtype=np.int64)
        if len(run_starts):
            doc_first = np.empty(len(run_doc), dtype=bool)
            doc_first[0] = True
            doc_first[1:] = run_doc[1:] != run_doc[:-1]
            bounds = np.flatnonzero(doc_first)
            max_cnt[run_doc[bounds]] = np.maximum.reduceat(run_len, bounds)
        n_tok = lens.astype(np.int64)
        denom = np.maximum(n_tok, 1).astype(np.float64)
        dup_frac = 1.0 - n_distinct.astype(np.float64) / denom
        top_frac = max_cnt.astype(np.float64) / denom
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(n_tok),
                "n_distinct": pa.array(n_distinct),
                "max_token_count": pa.array(max_cnt),
                "dup_token_frac": pa.array(dup_frac),
                "top_token_frac": pa.array(top_frac),
            }
        )


def token_doc_frequency(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        num_buckets: int = 64):
    """Distributed vocabulary building: Dataset[token, df] where df is
    the number of documents containing the token (document frequency —
    the IDF denominator / corpus-vocab workload).

    Scale shape: the map side collapses each block to its (token,
    partial-df) counts — per-doc uniqueness via one factorize + lexsort
    run-length pass (same mechanics as :class:`RepetitionStats`), so
    the exchange carries ~vocab-per-block rows, never one row per token
    occurrence.  The reduce is a bucketed groupby (a web-scale vocab is
    millions of tiny groups — Ray's sort Aggregate is pathological
    there, CLAUDE.md): one coarse shuffle, vectorized pandas sum per
    bucket.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    def _partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        toks = _tokens(batch[text_col])
        lens = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        ser = flat.to_pandas()
        codes, uniques = pd.factorize(ser)
        order = np.lexsort((codes, doc_idx))
        d_s, c_s = doc_idx[order], codes[order]
        total = len(d_s)
        new_run = np.empty(total, dtype=bool)
        if total:
            new_run[0] = True
            new_run[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        # one run per (doc, token): df_partial = runs per token code
        run_codes = c_s[new_run]
        df_part = np.bincount(run_codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({
            "token": pa.array(np.asarray(uniques, dtype=object), pa.string()),
            "df": pa.array(df_part),
        })

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False, as_index=False)["df"].sum()
        g["df"] = g["df"].astype(np.int64)
        return g

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return bucketed_groupby(parts, ["token"], _sum, num_buckets=num_buckets)


class TfIdfTopTerms:
    """Per-document top-k characteristic terms by tf × inverse-df.

    The vocabulary (token, df) table broadcasts ONCE (``ray.put`` ref;
    lazily ``ray.get`` once per worker — never re-shipped per batch).
    Because a document is one row, the per-doc ranking is block-local:
    the whole operator is a single shuffle-free ``map_batches``.

    Score = tf * (1.0 / df) — the linear inverse-frequency tf-idf
    variant: one exact float64 division, bit-identical in any engine
    (ln()-based idf differs across libm implementations by ULPs and
    breaks exact twinning).  Ties rank by token ascending.
    """

    def __init__(self, vocab_ref, *, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3):
        self._ref = vocab_ref
        self.text_col, self.id_col, self.k = text_col, id_col, k
        self._vocab = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        if self._vocab is None:
            import ray

            t = ray.get(self._ref) if not isinstance(self._ref, pa.Table) else self._ref
            toks = np.asarray(t["token"].to_pylist(), dtype=object)
            dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(toks)
            self._vocab = (toks[order], dfs[order])
        vtok, vdf = self._vocab
        n = batch.num_rows
        toks = _tokens(batch[self.text_col])
        lens = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        codes, uniques = pd.factorize(flat.to_pandas())
        order = np.lexsort((codes, doc_idx))
        d_s, c_s = doc_idx[order], codes[order]
        total = len(d_s)
        new_run = np.empty(total, dtype=bool)
        if total:
            new_run[0] = True
            new_run[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(new_run)
        run_doc = d_s[starts]
        run_code = c_s[starts]
        tf = np.diff(np.append(starts, total)).astype(np.int64)
        # vocab lookup: binary search of each run's token in the sorted vocab
        utok = np.asarray(uniques, dtype=object)
        run_tok = utok[run_code]
        if len(vtok) == 0:
            pos_c = np.zeros(len(run_tok), dtype=np.int64)
            in_vocab = np.zeros(len(run_tok), dtype=bool)
        else:
            pos_c = np.clip(np.searchsorted(vtok, run_tok), 0, len(vtok) - 1)
            in_vocab = vtok[pos_c] == run_tok
        run_doc, run_tok, tf = run_doc[in_vocab], run_tok[in_vocab], tf[in_vocab]
        dfv = vdf[pos_c[in_vocab]]
        score = tf.astype(np.float64) * (1.0 / dfv.astype(np.float64))
        # per-doc rank by (score desc, token asc): docs are block-local
        rorder = np.lexsort((run_tok, -score, run_doc))
        gd = run_doc[rorder]
        m = len(gd)
        idx = np.arange(m, dtype=np.int64)
        newg = np.empty(m, dtype=bool)
        if m:
            newg[0] = True
            newg[1:] = gd[1:] != gd[:-1]
        gstart = np.maximum.accumulate(np.where(newg, idx, 0))
        rank = idx - gstart
        keep = rorder[rank < self.k]
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(ids[run_doc[keep]]),
            "token": pa.array(run_tok[keep].astype(object), pa.string()),
            "tf": pa.array(tf[keep]),
            "df": pa.array(dfv[keep]),
            "rank": pa.array((rank[rank < self.k] + 1).astype(np.int64)),
        })


class RegexScrub:
    """PII-shaped text scrubbing: replace every match of an RE2 pattern
    with a mask token, plus a per-doc match count for audit.

    The redaction pass every curation pipeline needs before publishing a
    corpus (emails, phones, ids — the pattern is the caller's policy).
    Pure Arrow kernels (``replace_substring_regex`` /
    ``count_substring_regex``) — the regex compiles once per worker
    inside Arrow, zero per-row Python, and RE2 semantics match DuckDB's
    regexp_replace(..., 'g') for exact cross-engine checking.
    """

    def __init__(self, pattern: str, mask: str = "[MASK]",
                 text_col: str = "text", id_col: str = "doc_id"):
        self.pattern, self.mask = pattern, mask
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch[self.text_col]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "text": pc.replace_substring_regex(txt, self.pattern, self.mask),
                "n_masked": pc.count_substring_regex(txt, self.pattern).cast(pa.int64()),
            }
        )


def normalize_text(ds, *, text_col: str = "text"):
    """C4/RefinedWeb-style "fuzzy-exact" normalization: lowercase, then
    collapse every run of non-alphanumerics (punctuation, newlines,
    repeated spaces, any non-ASCII) to a single space, then trim.

    The standard pre-pass before exact dedup so that documents differing
    only in case / punctuation / whitespace collapse to one copy.  Pure
    Arrow kernels (utf8proc lower + RE2 replace), so the DuckDB twin
    ``trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')``
    is bit-identical (both engines: utf8proc lowercasing, RE2 regex).

    Replaces ``text_col`` in place; every other column passes through.
    Streaming per-batch map — no shuffle, no state.
    """

    def _norm(batch: pa.Table) -> pa.Table:
        t = _text(batch[text_col])
        t = pc.utf8_lower(t)
        t = pc.replace_substring_regex(t, "[^a-z0-9]+", " ")
        t = pc.utf8_trim(t, " ")
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, t)

    return ds.map_batches(_norm, batch_format="pyarrow", batch_size=None)
