"""Retrieval family: multi-term keyword search, exact-integer
quantized-dot vector ranking, and hybrid reciprocal-rank fusion.

Keyword retrieval is ranked full-corpus search scored by tf/df (term
frequency weighted by inverse document frequency), kept EXACT-RATIONAL
so ranking and scores are pure integer arithmetic:

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


def quantized_dot_topk(ds, query_vec, *, k: int = 20,
                       id_col: str = "vec_id",
                       emb_col: str = "embedding",
                       scale_bits: int = 20):
    """Top-``k`` vectors by EXACT-INTEGER quantized dot product against
    one query vector: every component maps to
    ``floor(x * 2^scale_bits + 0.5)`` (int64 — the int8/intN
    quantization trick at oracle-provable precision; the float ops
    involved are all exact, so both engines quantize bit-identically)
    and the score is the int64 dot product — no float summation order
    anywhere.  Returns (id, qdot: int64, rank) ordered
    (qdot DESC, id ASC).

    Headroom: |x| ≤ 2 components at scale_bits=20 give |q_i·e_i| ≤ 2^42;
    safe up to dim 2^20.  Map-side pruned global_topn — at most
    k × blocks rows meet (no global sort).
    """
    from .rank import global_topn

    scale = float(1 << scale_bits)
    qq = np.floor(np.asarray(query_vec, np.float64) * scale + 0.5) \
        .astype(np.int64)

    def _dot(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch[id_col],
                             "qdot": pa.array([], pa.int64())})
        emb = np.stack(batch[emb_col].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        qe = np.floor(emb * scale + 0.5).astype(np.int64)
        return pa.table({id_col: batch[id_col],
                         "qdot": pa.array(qe @ qq)})

    scored = ds.map_batches(_dot, batch_format="pyarrow", batch_size=None)
    return global_topn(scored, order_col="qdot", tiebreak=id_col, n=k)


def hybrid_search_rrf(docs, embs, *, query_terms: list[str], query_vec,
                      k: int = 10, n_candidates: int = 50,
                      rrf_k: int = 60, doc_id_col: str = "doc_id",
                      vec_id_col: str = "vec_id",
                      text_col: str = "text",
                      emb_col: str = "embedding"):
    """Hybrid retrieval with reciprocal-rank fusion: the keyword top-N
    (exact-rational tf/df ranks) and the embedding top-N (exact-integer
    quantized-dot ranks) fuse as

        rrf = 1/(rrf_k + rank_kw) + 1/(rrf_k + rank_emb)

    with a missing list contributing 0.  Each addend is ONE float64
    division of exact ints and the sum has exactly two terms — IEEE-
    deterministic cross-engine, so even the float score oracle-hashes.

    Scale shape: both rank lists are map-side-pruned global top-N
    (≤ N × blocks rows ever meet); the fusion itself runs on the driver
    over ≤ 2N rows — bounded by construction, never by input size.
    Returns (doc_id, rrf_score, rank) ordered (rrf_score DESC, id ASC),
    ≤ k rows.
    """
    kw = keyword_search(docs, query_terms=query_terms, k=n_candidates,
                        text_col=text_col, id_col=doc_id_col)
    ev = quantized_dot_topk(embs, query_vec, k=n_candidates,
                            id_col=vec_id_col, emb_col=emb_col)
    kw_df = kw if isinstance(kw, pd.DataFrame) else kw.to_pandas()
    ev_df = ev.to_pandas()
    r_kw = dict(zip(kw_df[doc_id_col].astype(np.int64),
                    kw_df["rank"].astype(np.int64)))
    r_ev = dict(zip(ev_df[vec_id_col].astype(np.int64),
                    ev_df["rank"].astype(np.int64)))
    ids = sorted(set(r_kw) | set(r_ev))
    score = [
        (1.0 / (rrf_k + r_kw[i]) if i in r_kw else 0.0)
        + (1.0 / (rrf_k + r_ev[i]) if i in r_ev else 0.0)
        for i in ids
    ]
    out = pd.DataFrame({doc_id_col: pd.array(ids, dtype="int64"),
                        "rrf_score": np.asarray(score, np.float64)})
    out = out.sort_values(["rrf_score", doc_id_col],
                          ascending=[False, True], kind="stable").head(k)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.reset_index(drop=True)
