"""Multi-term keyword retrieval — ranked full-corpus search scored by
tf/df (term frequency weighted by inverse document frequency), kept
EXACT-RATIONAL so ranking and scores are pure integer arithmetic:

    score = Σ_j tf_j / df_j
          = (Σ_j tf_j · Π_{i≠j} df_i) / Π_i df_i

The denominator is constant across documents, so ranking by the int64
numerator ``score_num`` IS ranking by the rational score — no float
summation order, no ln(), nothing that can differ cross-engine by an
ulp (the reason BM25's ln-idf is not oracle-hashable; see
q_doc_tfidf_top_terms's linear-score note).

Scale shape: ONE tokenization scan collapses each doc to a slim
(id, tf_0..tf_{q-1}) row, kept only for docs matching ≥1 term; the
slim table is materialized once (bounded by matching docs × ~8(q+1)
bytes — object-store-friendly even at corpus scale) so the df
aggregate and the scoring pass don't re-tokenize; document
frequencies are a per-block partial sum reduced on the driver
(q ints); top-k comes from the map-side-pruned global_topn — at most
k × blocks rows ever meet.  No global sort, no second text scan.

Tokenization is the engine-wide space-split (`text_stats._tokens`,
twin ``string_split(text, ' ')``).

The reference engine has no retrieval operators (SURVEY.md §2.6);
this is a north-rule training-data/search extra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text_stats import _tokens


def keyword_search(ds, *, query_terms: list[str], k: int = 20,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Top-``k`` documents by exact-rational tf/df score over
    ``query_terms``; deterministic (score_num DESC, id ASC) order.

    Returns ``(id_col, score_num: int64, rank: int64)`` where
    ``score_num = Σ_j tf_j · Π_{i≠j in hit terms} df_i`` (df-0 terms
    contribute nothing and are dropped from the cross-product).
    """
    if not query_terms:
        raise ValueError("keyword_search: need at least one term")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("keyword_search: terms must be distinct")
    q = len(query_terms)
    tf_cols = [f"tf{j}" for j in range(q)]

    def _tf(batch: pa.Table):
        n = batch.num_rows
        if n == 0:
            return
        toks = _tokens(batch[text_col])
        lens = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = {id_col: batch[id_col]}
        hit = np.zeros(n, bool)
        for j, term in enumerate(query_terms):
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            m = np.asarray(m, bool)
            tf = np.bincount(doc_idx[m], minlength=n).astype(np.int64)
            cols[tf_cols[j]] = pa.array(tf)
            hit |= tf > 0
        if not hit.any():
            return
        yield pa.table(cols).filter(pa.array(hit))

    slim = ds.map_batches(_tf, batch_format="pyarrow",
                          batch_size=None).materialize()

    def _df_partial(b: pa.Table) -> pa.Table:
        return pa.table({c: pa.array([int(pc.sum(
            pc.cast(pc.greater(b[c], 0), pa.int64())).as_py() or 0)])
            for c in tf_cols})

    dfp = slim.map_batches(_df_partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    dfs = [int(dfp[c].sum()) if len(dfp) else 0 for c in tf_cols]

    live = [j for j in range(q) if dfs[j] > 0]
    if not live:  # no document matches any term: empty, schema'd
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "score_num": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64")})
    # int64 headroom check for the cross-product of document frequencies
    prod_all = 1
    for j in live:
        prod_all *= dfs[j]
    if prod_all * 10**6 >= 2**62:
        raise OverflowError(
            "keyword_search: df cross-product too large for exact int64 "
            "scoring; reduce terms or shard the corpus")

    def _score(b: pa.Table) -> pa.Table:
        num = np.zeros(b.num_rows, np.int64)
        for j in live:
            w = prod_all // dfs[j]  # Π_{i≠j} df_i
            num += b[tf_cols[j]].to_numpy(zero_copy_only=False) * w
        return pa.table({id_col: b[id_col], "score_num": pa.array(num)})

    from .rank import global_topn
    scored = slim.map_batches(_score, batch_format="pyarrow",
                              batch_size=None)
    return global_topn(scored, order_col="score_num", tiebreak=id_col,
                       n=k)
