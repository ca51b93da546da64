"""Corpus language-model scoring — the CCNet / Gopher-style quality
signal family: train n-gram statistics over the corpus in ONE
tokenization scan, then score every document against them.

Two surfaces:

* :func:`lm_frequency_stats` — EXACT integer per-doc statistics
  (token count, corpus-frequency sums for unigrams and bigrams, mean
  token frequency as a single int/int float division), oracle-hashable
  against a DuckDB twin (no ``ln``, no float summation).
* :func:`lm_perplexity` — true add-one-smoothed bigram perplexity per
  document (float, estimate-valued; pytest-verified against a direct
  numpy reference, rows-only in the driver gate like the HLL family).

Scale shape (100 TB posture):
* pass 1 builds the corpus count table from per-batch FACTORIZED
  partials (one (gram, n) row per distinct gram per batch — zipf makes
  this tiny vs the token stream) reduced by ``bucketed_groupby`` (one
  coarse shuffle keyed on the gram, never a per-group Python call);
* the count table is vocabulary-bounded, broadcast once (``ray.put``)
  and fetched lazily once per worker (never re-shipped per batch);
  a guard raises beyond ``max_broadcast_rows`` with the shuffle-join
  alternative spelled out rather than silently materializing a
  multi-GB dict on every worker;
* pass 2 re-reads the text (projected parquet read — cheaper than
  materializing a tokenized copy of a 100 TB corpus) and scores each
  batch with ``pc.index_in`` + gather + ``np.add.reduceat`` — zero
  Python per row.

Tokenization is the engine-wide space-split (``text_stats._tokens``,
twin ``string_split(text, ' ')``); bigrams join adjacent tokens with
chr(31), twin ``list_transform(range(1, len(l)), i -> l[i] || chr(31)
|| l[i+1])``.

The reference engine has no text/LM operators (SURVEY.md §2.6); this
is a north-rule training-data extra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text_stats import _tokens

_SEP = "\x1f"


def _batch_grams(batch: pa.Table, text_col: str):
    """Tokenize one batch -> (flat unigram Array, flat bigram Array,
    doc_idx for unigrams, doc_idx for bigrams, n_tokens per doc)."""
    toks = _tokens(batch[text_col])
    lens = pc.list_value_length(toks).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    flat = toks.flatten()
    n = batch.num_rows
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(doc_idx) > 1:
        same = doc_idx[:-1] == doc_idx[1:]
        big = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), _SEP)
        big = big.filter(pa.array(same))
        big_idx = doc_idx[:-1][same]
    else:
        big = pa.array([], type=pa.string())
        big_idx = np.empty(0, np.int64)
    return flat, big, doc_idx, big_idx, lens


def _count_partials(ds, *, text_col: str, num_buckets: int = 64):
    """One tokenization scan -> corpus (order, gram, n) count table.

    order=1 rows are unigram counts, order=2 bigram counts.  Per-batch
    partials are factorized (value_counts) so the shuffle carries one
    slim row per distinct gram per batch; the sum rides ONE coarse
    bucketed shuffle (dedup.bucketed_groupby — never per-group Python).
    """
    from .dedup import bucketed_groupby

    def _partial(batch: pa.Table):
        if batch.num_rows == 0:
            return
        flat, big, _, _, _ = _batch_grams(batch, text_col)
        out_g, out_n, out_o = [], [], []
        for order, arr in ((1, flat), (2, big)):
            if len(arr) == 0:
                continue
            vc = arr.value_counts()
            out_g.append(vc.field("values"))
            out_n.append(vc.field("counts").cast(pa.int64()))
            out_o.append(pa.array(
                np.full(len(vc), order, np.int64)))
        if not out_g:
            return
        yield pa.table({
            "order": pa.concat_arrays(out_o),
            "gram": pa.concat_arrays([g.cast(pa.string()) for g in out_g]),
            "n": pa.concat_arrays(out_n)})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["order", "gram"], sort=False, as_index=False)
               ["n"].sum())
        return out

    return bucketed_groupby(partials, ["order", "gram"], _sum,
                            num_buckets=num_buckets)


def corpus_gram_counts(ds, *, text_col: str = "text",
                       max_broadcast_rows: int = 50_000_000):
    """Materialize the corpus unigram+bigram count table on the driver
    as ``(uni: pa.Table(gram, n), bi: pa.Table(gram, n))``.

    Vocabulary-bounded by Heaps' law (sub-linear in corpus size), but
    guarded: beyond ``max_broadcast_rows`` distinct grams, raise and
    point at the shuffle-join scoring path (explode (doc, gram) rows,
    bucketed join against the count table on the gram key) instead of
    broadcasting a multi-GB table to every worker.
    """
    counts = _count_partials(ds, text_col=text_col).materialize()
    n_rows = counts.count()
    if n_rows > max_broadcast_rows:
        raise ValueError(
            f"corpus_gram_counts: {n_rows} distinct grams exceeds the "
            f"broadcast budget ({max_broadcast_rows}); score via a "
            "bucketed shuffle-join on the gram key instead of "
            "broadcasting (see stages/lm.py docstring)")
    t = pa.Table.from_pandas(counts.to_pandas(), preserve_index=False)
    t = t.replace_schema_metadata(None)
    if "order" not in t.column_names:
        # zero grams (empty corpus): the partial generator never yielded,
        # so the reduce output has no columns — canonical empty table
        t = pa.table({"order": pa.array([], pa.int64()),
                      "gram": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    uni = t.filter(pc.equal(t["order"], 1)).select(["gram", "n"])
    bi = t.filter(pc.equal(t["order"], 2)).select(["gram", "n"])
    return uni.combine_chunks(), bi.combine_chunks()


class _GramScorer:
    """Stateless-dispatch scorer: broadcast count tables fetched lazily
    ONCE per worker (never an actor pool sized ~num_cpus)."""

    def __init__(self, uni_ref, bi_ref, *, text_col: str, id_col: str,
                 mode: str):
        self._uni_ref, self._bi_ref = uni_ref, bi_ref
        self.text_col, self.id_col, self.mode = text_col, id_col, mode
        self._state = None

    def _lookup(self, arr: pa.Array, table_gram, table_n) -> np.ndarray:
        """counts for every element of ``arr`` (0 where absent)."""
        pos = pc.index_in(arr, value_set=table_gram)
        valid = pos.is_valid().to_numpy(zero_copy_only=False)
        out = np.zeros(len(arr), np.int64)
        if valid.any():
            idx = pos.fill_null(0).to_numpy(zero_copy_only=False)
            out[valid] = table_n[idx[valid]]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._state is None:
            import ray

            uni = (ray.get(self._uni_ref)
                   if not isinstance(self._uni_ref, pa.Table)
                   else self._uni_ref)
            bi = (ray.get(self._bi_ref)
                  if not isinstance(self._bi_ref, pa.Table)
                  else self._bi_ref)
            self._state = (
                uni["gram"].combine_chunks(),
                uni["n"].to_numpy(zero_copy_only=False),
                bi["gram"].combine_chunks(),
                bi["n"].to_numpy(zero_copy_only=False),
                int(pc.sum(uni["n"]).as_py() or 0),   # corpus tokens N
                len(uni),                             # vocabulary V
            )
        ug, un, bg, bn, N, V = self._state
        n = batch.num_rows
        if n == 0:
            return _empty_like(self.id_col, self.mode)
        flat, big, doc_idx, big_idx, lens = _batch_grams(
            batch, self.text_col)
        cu = self._lookup(flat, ug, un)
        cb = self._lookup(big, bg, bn)
        # segment sums: unigram offsets from lens; bigram counts per doc
        off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sum_u = np.zeros(n, np.int64)
        nz = lens > 0
        if nz.any():
            seg = np.add.reduceat(cu, off[nz]) if len(cu) else np.zeros(0, np.int64)
            sum_u[nz] = seg
        n_big = np.bincount(big_idx, minlength=n).astype(np.int64)
        sum_b = np.zeros(n, np.int64)
        if len(cb):
            np.add.at(sum_b, big_idx, cb)
        if self.mode == "freq":
            return pa.table({
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(lens),
                "n_bigrams": pa.array(n_big),
                "sum_tok_count": pa.array(sum_u),
                "sum_bigram_count": pa.array(sum_b),
                "mean_tok_count": pa.array(np.where(
                    lens > 0, sum_u * 1.0 / np.maximum(lens, 1), 0.0)),
            })
        # mode == "ppl": add-one-smoothed bigram conditional logloss.
        # p(t_i | t_{i-1}) = (c(bigram) + 1) / (c(prev unigram) + V)
        prev_cu = cu[:-1][doc_idx[:-1] == doc_idx[1:]] if len(cu) > 1 \
            else np.empty(0, np.int64)
        logp = np.log((cb + 1.0)) - np.log(prev_cu + float(V))
        ll = np.zeros(n, np.float64)
        np.add.at(ll, big_idx, -logp)
        logloss = np.where(n_big > 0, ll / np.maximum(n_big, 1), 0.0)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_bigrams": pa.array(n_big),
            "logloss_bi": pa.array(logloss),
            "ppl_bi": pa.array(np.exp(logloss)),
        })


def _empty_like(id_col: str, mode: str) -> pa.Table:
    if mode == "freq":
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "n_bigrams": pa.array([], pa.int64()),
                         "sum_tok_count": pa.array([], pa.int64()),
                         "sum_bigram_count": pa.array([], pa.int64()),
                         "mean_tok_count": pa.array([], pa.float64())})
    return pa.table({id_col: pa.array([], pa.int64()),
                     "n_bigrams": pa.array([], pa.int64()),
                     "logloss_bi": pa.array([], pa.float64()),
                     "ppl_bi": pa.array([], pa.float64())})


def _score(ds, *, text_col: str, id_col: str, mode: str,
           max_broadcast_rows: int, reference=None):
    uni, bi = corpus_gram_counts(reference if reference is not None else ds,
                                 text_col=text_col,
                                 max_broadcast_rows=max_broadcast_rows)
    try:
        import ray

        uni_ref, bi_ref = ray.put(uni), ray.put(bi)
    except Exception:  # pragma: no cover — standalone/no-ray fallback
        uni_ref, bi_ref = uni, bi
    scorer = _GramScorer(uni_ref, bi_ref, text_col=text_col,
                         id_col=id_col, mode=mode)
    return ds.map_batches(scorer, batch_format="pyarrow", batch_size=None)


def _score_freq_shuffle(ds, *, text_col: str, id_col: str,
                        num_buckets: int = 64, reference=None):
    """Broadcast-free scale path for :func:`lm_frequency_stats`: one
    tokenization scan collapses each batch to SLIM
    (order, gram, doc_id, occ) rows — one row per distinct gram per
    doc — from which BOTH the corpus counts and the per-doc sums
    derive, so no count table ever materializes anywhere.  Shuffle 1
    buckets by gram (complete gram-groups per bucket: n(g) = Σ occ,
    each doc's contribution occ·n(g) pre-aggregated per (doc, order));
    shuffle 2 buckets by doc id (integer splitmix fast path) and sums
    the ≤ 2·buckets partials per doc.  Exactly the result of the
    broadcast path, byte-for-byte (asserted in tests/test_lm.py)."""
    import pandas as _pd

    from .dedup import bucketed_groupby

    def _make_slim(is_ref: int):
        def _slim(batch: pa.Table):
            if batch.num_rows == 0:
                return
            flat, big, doc_idx, big_idx, _ = _batch_grams(batch, text_col)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            for order, arr, didx in ((1, flat, doc_idx),
                                     (2, big, big_idx)):
                if len(arr) == 0:
                    continue
                enc = arr.dictionary_encode()
                if isinstance(enc, pa.ChunkedArray):
                    enc = enc.combine_chunks()
                codes = enc.indices.to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                nd = len(enc.dictionary)
                comb = didx.astype(np.int64) * nd + codes
                uniq, occ = np.unique(comb, return_counts=True)
                d, c = uniq // nd, uniq % nd
                yield pa.table({
                    "order": pa.array(np.full(len(uniq), order, np.int64)),
                    "gram": enc.dictionary.take(pa.array(c)),
                    id_col: pa.array(ids[d]),
                    "occ": pa.array(occ.astype(np.int64)),
                    "is_ref": pa.array(
                        np.full(len(uniq), is_ref, np.int64))})
        return _slim

    slim = ds.map_batches(_make_slim(0), batch_format="pyarrow",
                          batch_size=None)
    # cross-corpus mode: reference rows carry the counts, main rows the
    # docs — one tagged union, still a single gram shuffle
    self_counts = reference is None
    if not self_counts:
        slim = slim.union(reference.map_batches(
            _make_slim(1), batch_format="pyarrow", batch_size=None))

    def _per_gram(df: _pd.DataFrame) -> _pd.DataFrame:
        src = df if self_counts else df[df["is_ref"] == 1]
        n = src.groupby(["order", "gram"], sort=False)["occ"].sum()
        docs = df if self_counts else df[df["is_ref"] == 0]
        nv = _pd.MultiIndex.from_frame(docs[["order", "gram"]]) \
            .map(n).fillna(0).to_numpy().astype(np.int64) \
            if not self_counts else \
            docs.groupby(["order", "gram"], sort=False)["occ"] \
            .transform("sum").to_numpy()
        docs = docs.assign(contrib=docs["occ"].to_numpy() * nv)
        return docs.groupby([id_col, "order"], sort=False,
                            as_index=False)[["occ", "contrib"]].sum()

    partials = bucketed_groupby(slim, ["order", "gram"], _per_gram,
                                num_buckets=num_buckets)

    def _per_doc(df: _pd.DataFrame) -> _pd.DataFrame:
        p = df.pivot_table(index=id_col, columns="order",
                           values=["occ", "contrib"], aggfunc="sum",
                           fill_value=0)
        out = _pd.DataFrame({id_col: p.index.to_numpy()})
        get = (lambda f, o: p[(f, o)].to_numpy().astype(np.int64)
               if (f, o) in p.columns else np.zeros(len(p), np.int64))
        out["n_tokens"] = get("occ", 1)
        out["n_bigrams"] = get("occ", 2)
        out["sum_tok_count"] = get("contrib", 1)
        out["sum_bigram_count"] = get("contrib", 2)
        out["mean_tok_count"] = np.where(
            out["n_tokens"] > 0,
            out["sum_tok_count"] * 1.0 / np.maximum(out["n_tokens"], 1),
            0.0)
        return out

    return bucketed_groupby(partials, [id_col], _per_doc,
                            num_buckets=num_buckets)


def lm_frequency_stats(ds, *, text_col: str = "text",
                       id_col: str = "doc_id",
                       max_broadcast_rows: int = 50_000_000,
                       scoring: str = "auto", reference=None):
    """Per-doc EXACT corpus-frequency statistics (see module doc).

    Returns (id, n_tokens, n_bigrams, sum_tok_count, sum_bigram_count,
    mean_tok_count) where the sums are over every token/bigram
    OCCURRENCE in the doc of its corpus-wide count — all int64 except
    the final single int/int division (cross-engine bit-identical).

    ``reference``: optional second Dataset whose text supplies the
    count tables instead of ``ds`` itself — the CCNet cross-corpus
    setup (score every doc against a TRUSTED reference corpus; grams
    unseen in the reference contribute 0).  In the shuffle path the
    reference rides the same single gram shuffle as a tagged union.

    ``scoring``: "broadcast" (count table shipped once per worker;
    raises beyond ``max_broadcast_rows`` distinct grams), "shuffle"
    (the broadcast-free two-shuffle path — right when the gram
    vocabulary itself is object-store-scale), or "auto" (broadcast,
    falling back to shuffle past the budget).  Both paths return
    identical rows (tested).
    """
    if scoring not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown scoring mode {scoring!r}")
    if scoring == "shuffle":
        return _score_freq_shuffle(ds, text_col=text_col, id_col=id_col,
                                   reference=reference)
    try:
        return _score(ds, text_col=text_col, id_col=id_col, mode="freq",
                      max_broadcast_rows=max_broadcast_rows,
                      reference=reference)
    except ValueError:
        if scoring == "broadcast":
            raise
        return _score_freq_shuffle(ds, text_col=text_col, id_col=id_col,
                                   reference=reference)


def lm_perplexity(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  max_broadcast_rows: int = 50_000_000, reference=None):
    """Per-doc add-one-smoothed bigram perplexity against the corpus'
    own bigram model — or, with ``reference=``, against a trusted
    reference corpus's model (float, estimate-valued — the standard
    'train a cheap LM, flag high-perplexity docs' curation filter).
    Verified in pytest against a direct numpy reference; rows-only in
    the driver gate (exact twin: the lm_frequency_stats integer
    surface)."""
    return _score(ds, text_col=text_col, id_col=id_col, mode="ppl",
                  max_broadcast_rows=max_broadcast_rows,
                  reference=reference)


def top_collocations(ds, *, text_col: str = "text", min_count: int = 5,
                     k: int = 100,
                     max_broadcast_rows: int = 50_000_000) -> pa.Table:
    """Top-k collocations: bigrams ranked by PMI lift
    ``P(w1,w2-adjacent) / (P(w1)·P(w2))`` — the classic vocabulary
    analytic for finding multi-word expressions worth treating as
    single tokens when curating a training corpus.

    Ranking uses the raw lift ratio ``c12·N / (c1·c2)`` rather than its
    logarithm: ``ln`` is monotone, so the ORDER is identical, and the
    ratio is one chain of int->double promotions and a single division
    — cross-engine bit-identical, so the DuckDB twin hashes exactly
    (``log`` would differ in the last ulp between libm builds).

    ``min_count`` drops rare bigrams (raw PMI is dominated by
    hapax pairs).  Ties: (lift desc, w1 asc, w2 asc) — a total order.

    Scale shape: one tokenization scan + one gram-keyed bucketed
    shuffle build the corpus count table (vocabulary-bounded, Heaps'
    law); the lift join runs driver-side on that table, guarded by
    ``max_broadcast_rows`` like the LM scorers (beyond it, bucket-join
    the bigram table against the unigram table on each word key
    instead).  Returns a (tiny) ``pa.Table``.
    """
    uni, bi = corpus_gram_counts(ds, text_col=text_col,
                                 max_broadcast_rows=max_broadcast_rows)
    empty = pa.table({
        "w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
        "c12": pa.array([], pa.int64()), "c1": pa.array([], pa.int64()),
        "c2": pa.array([], pa.int64()), "lift": pa.array([], pa.float64())})
    N = int(pc.sum(uni["n"]).as_py() or 0)
    if len(bi) == 0 or N == 0:
        return empty
    c12 = bi["n"].to_numpy(zero_copy_only=False)
    keep = c12 >= min_count
    if not keep.any():
        return empty
    grams = bi["gram"].combine_chunks().filter(pa.array(keep))
    c12 = c12[keep]
    parts = pc.split_pattern(grams, pattern=_SEP, max_splits=1)
    w1, w2 = pc.list_element(parts, 0), pc.list_element(parts, 1)
    ug = uni["gram"].combine_chunks()
    un = uni["n"].to_numpy(zero_copy_only=False)

    def _cnt(arr) -> np.ndarray:
        # every bigram constituent is in the unigram vocab by
        # construction; index_in never misses
        pos = pc.index_in(arr, value_set=ug)
        return un[pos.fill_null(0).to_numpy(zero_copy_only=False)]

    c1, c2 = _cnt(w1), _cnt(w2)
    # ((c12*1.0)*N) / ((c1*1.0)*c2) — the twin's exact promotion order
    lift = (c12 * 1.0) * N / ((c1 * 1.0) * c2)
    df = pd.DataFrame({
        "w1": w1.to_pandas(), "w2": w2.to_pandas(),
        "c12": c12.astype(np.int64), "c1": c1.astype(np.int64),
        "c2": c2.astype(np.int64), "lift": lift})
    df = df.sort_values(["lift", "w1", "w2"],
                        ascending=[False, True, True],
                        kind="mergesort").head(k)
    t = pa.Table.from_pandas(df.reset_index(drop=True),
                             preserve_index=False)
    return t.replace_schema_metadata(None)
