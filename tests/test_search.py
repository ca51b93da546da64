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
