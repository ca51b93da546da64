"""transition_matrix vs DuckDB lead()-window twin; duplicate-ts
tiebreak; partition independence; NULL key/type handling."""

import duckdb
import numpy as np
import pandas as pd

from gostatix_ray.stages.transitions import transition_matrix


def _events(n=20_000, seed=5, null_frac=0.05, type_null_frac=0.0):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": pd.array(rng.integers(0, 500, n), dtype="Int64"),
        "ts": pd.to_datetime(rng.integers(0, 30 * 86400, n),
                             unit="s").astype("datetime64[us]"),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error", "signup"], n
        ).astype(object),
    })
    df.loc[rng.random(n) < null_frac, "user_id"] = pd.NA
    if type_null_frac:
        df.loc[rng.random(n) < type_null_frac, "event_type"] = None
    # duplicate timestamps to stress the (ts, event_id) tiebreak
    df.loc[1000:1200, "ts"] = df.loc[1000, "ts"]
    return df


def _oracle(df):
    con = duckdb.connect()
    con.register("events", df)
    return con.execute("""
        WITH seq AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS next_type FROM events
          WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        t AS (SELECT event_type AS src_type, next_type AS dst_type,
          CAST(count(*) AS BIGINT) AS n FROM seq
          WHERE next_type IS NOT NULL GROUP BY 1, 2)
        SELECT src_type, dst_type, n,
          n * 1.0 / sum(n) OVER (PARTITION BY src_type) AS p
        FROM t ORDER BY src_type, dst_type
    """).df()


def test_transitions_vs_duckdb(ray_session):
    import ray.data as rd

    df = _events()
    oracle = _oracle(df)
    for parts in (1, 6):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        out = transition_matrix(
            ds, key_col="user_id", ts_col="ts", type_col="event_type",
            order_col="event_id").to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
        assert (out["p"].to_numpy() == oracle["p"].to_numpy()).all()


def test_transitions_null_types_skip_over(ray_session):
    import ray.data as rd

    df = _events(seed=13, type_null_frac=0.1)
    oracle = _oracle(df)
    out = transition_matrix(
        rd.from_pandas(df).repartition(4), key_col="user_id",
        ts_col="ts", type_col="event_type",
        order_col="event_id").to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
    # per-src probabilities sum to 1 exactly within float64 tolerance
    s = out.groupby("src_type")["p"].sum()
    assert np.allclose(s.to_numpy(), 1.0, rtol=0, atol=1e-12)
