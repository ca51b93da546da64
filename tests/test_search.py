"""keyword_search vs DuckDB exact-rational tf/df twin; df-0 term
handling; empty result; validation."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gostatix_ray.stages.search import keyword_search

WORDS = ["key", "agg", "row", "scan", "slow", "fast", "table", "value"]


def _docs(n=1200, seed=3):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(WORDS, size=rng.integers(1, 60)))
             for _ in range(n)]
    texts[0] = ""  # degenerate
    texts[1] = "   "
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _oracle(df, terms, k=20):
    con = duckdb.connect()
    con.register("documents", df)
    filters = ", ".join(
        f"CAST(count(*) FILTER (token = '{t}') AS BIGINT) AS tf{j}"
        for j, t in enumerate(terms))
    gdfs = ", ".join(
        f"greatest(count(*) FILTER (tf{j} > 0), 1) AS df{j}"
        for j in range(len(terms)))
    num = " + ".join(
        "tf{j}*{prod}".format(
            j=j, prod="*".join(f"df{i}" for i in range(len(terms))
                               if i != j) or "1")
        for j in range(len(terms)))
    anyhit = " + ".join(f"tf{j}" for j in range(len(terms)))
    return con.execute(f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' '))
          AS token FROM documents),
        tf AS (SELECT doc_id, {filters} FROM tok GROUP BY doc_id),
        df AS (SELECT {gdfs} FROM tf)
        SELECT doc_id, CAST({num} AS BIGINT) AS score_num,
          CAST(row_number() OVER (ORDER BY {num} DESC, doc_id)
          AS BIGINT) AS rank
        FROM tf, df WHERE {anyhit} > 0
        ORDER BY score_num DESC, doc_id LIMIT {k}
    """).df()


def test_keyword_search_vs_duckdb(ray_session):
    import ray.data as rd

    df = _docs()
    terms = ["scan", "slow", "row"]
    oracle = _oracle(df, terms)
    for parts in (1, 5):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        out = keyword_search(ds, query_terms=terms, k=20).to_pandas()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True)[["doc_id", "score_num", "rank"]],
            oracle, check_dtype=False)


def test_keyword_search_df0_term(ray_session):
    import ray.data as rd

    df = _docs(seed=11)
    terms = ["scan", "zzz_absent_term", "row"]
    oracle = _oracle(df, terms)
    out = keyword_search(rd.from_pandas(df).repartition(4),
                         query_terms=terms, k=20).to_pandas()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True)[["doc_id", "score_num", "rank"]],
        oracle, check_dtype=False)


def test_keyword_search_empty_and_validation(ray_session):
    import ray.data as rd

    df = _docs(n=50, seed=5)
    out = keyword_search(rd.from_pandas(df),
                         query_terms=["zzz", "yyy"], k=5)
    assert list(out.columns) == ["doc_id", "score_num", "rank"]
    assert len(out) == 0

    with pytest.raises(ValueError):
        keyword_search(rd.from_pandas(df), query_terms=[])
    with pytest.raises(ValueError):
        keyword_search(rd.from_pandas(df), query_terms=["a", "a"])


# ---------------------------------------------------------------------------
# quantized-dot top-k + hybrid RRF fusion
# ---------------------------------------------------------------------------

def _embs(n=400, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r for r in m]})


def test_quantized_dot_topk_matches_numpy(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.search import quantized_dot_topk

    df = _embs()
    q = np.asarray(df.embedding.iloc[0], np.float64)
    out = quantized_dot_topk(rd.from_pandas(df).repartition(5), q,
                             k=15).to_pandas()
    scale = float(1 << 20)
    mat = np.floor(np.stack(df.embedding).astype(np.float64) * scale
                   + 0.5).astype(np.int64)
    qq = np.floor(q * scale + 0.5).astype(np.int64)
    dots = mat @ qq
    order = np.lexsort((df.vec_id.to_numpy(), -dots))[:15]
    assert out["vec_id"].tolist() == df.vec_id.to_numpy()[order].tolist()
    assert out["qdot"].tolist() == dots[order].tolist()
    assert out["rank"].tolist() == list(range(1, 16))
    # query is vector 0: it must rank itself first
    assert out["vec_id"].iloc[0] == 0


def test_hybrid_rrf_fuses_both_lists(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.search import (hybrid_search_rrf,
                                            keyword_search,
                                            quantized_dot_topk)

    docs = _docs(n=400, seed=9)
    embs = _embs(n=400, seed=9)
    q = np.asarray(embs.embedding.iloc[3], np.float64)
    terms = ["scan", "slow"]
    out = hybrid_search_rrf(
        rd.from_pandas(docs).repartition(4),
        rd.from_pandas(embs).repartition(4),
        query_terms=terms, query_vec=q, k=10, n_candidates=25)
    kw = keyword_search(rd.from_pandas(docs), query_terms=terms,
                        k=25).to_pandas()
    ev = quantized_dot_topk(rd.from_pandas(embs), q, k=25).to_pandas()
    rk = dict(zip(kw.doc_id, kw["rank"]))
    re_ = dict(zip(ev.vec_id, ev["rank"]))
    want = sorted(
        ((1.0 / (60 + rk[i]) if i in rk else 0.0)
         + (1.0 / (60 + re_[i]) if i in re_ else 0.0), -i)
        for i in set(rk) | set(re_))[::-1][:10]
    assert out["rrf_score"].tolist() == [s for s, _ in want]
    assert out["doc_id"].tolist() == [-i for _, i in want]
    assert out["rank"].tolist() == list(range(1, 11))
    # fusion really uses both lists: some doc in the top-10 must be
    # missing from one of the two candidate lists
    ids = set(out["doc_id"])
    assert (ids - set(rk)) or (ids - set(re_))
