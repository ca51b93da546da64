"""funnel_counts vs DuckDB chained-min-join twin; horizon variant;
partition independence; validation."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gostatix_ray.stages.funnel import funnel_counts

STEPS = ["view", "click", "purchase"]


def _events(n=20_000, seed=7, null_frac=0.05, days=90, users=800):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "user_id": pd.array(rng.integers(0, users, n), dtype="Int64"),
        "ts": pd.to_datetime(rng.integers(0, days * 86400, n),
                             unit="s").astype("datetime64[us]"),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error", "signup"], n),
    })
    df.loc[rng.random(n) < null_frac, "user_id"] = pd.NA
    return df


def _oracle(df):
    con = duckdb.connect()
    con.register("events", df)
    return con.execute("""
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
          WHERE user_id IS NOT NULL AND event_type='view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN s1 USING (user_id) WHERE e.event_type='click'
          AND e.ts >= s1.t GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN s2 USING (user_id) WHERE e.event_type='purchase'
          AND e.ts >= s2.t GROUP BY 1),
        c AS (SELECT 1 AS step, 'view' AS event_type,
          (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_keys
          UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
          UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        SELECT CAST(step AS BIGINT) AS step, event_type, n_keys,
          n_keys * 1.0 / (SELECT n_keys FROM c WHERE step = 1)
          AS conversion FROM c ORDER BY step
    """).df().astype({"step": "int64", "n_keys": "int64"})


def test_funnel_vs_duckdb(ray_session):
    import ray.data as rd

    df = _events()
    oracle = _oracle(df)
    outs = []
    for parts in (1, 7):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        out = funnel_counts(ds, key_col="user_id", ts_col="ts",
                            type_col="event_type", steps=STEPS)
        outs.append(out.to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], oracle)
    # conversion is bit-exact, not just close
    assert (outs[0]["conversion"].to_numpy()
            == oracle["conversion"].to_numpy()).all()


def test_funnel_horizon_vs_duckdb(ray_session):
    import ray.data as rd

    df = _events(seed=11)
    con = duckdb.connect()
    con.register("events", df)
    oracle = con.execute("""
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
          WHERE user_id IS NOT NULL AND event_type='view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) AS t, any_value(s1.t) AS t0
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type='click' AND e.ts >= s1.t
          AND e.ts <= s1.t + INTERVAL 7 DAY GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN s2 USING (user_id) WHERE e.event_type='purchase'
          AND e.ts >= s2.t AND e.ts <= s2.t0 + INTERVAL 7 DAY GROUP BY 1)
        SELECT (SELECT count(*) FROM s1) c1,
               (SELECT count(*) FROM s2) c2,
               (SELECT count(*) FROM s3) c3
    """).df()
    ds = rd.from_pandas(df).repartition(5)
    out = funnel_counts(ds, key_col="user_id", ts_col="ts",
                        type_col="event_type", steps=STEPS,
                        horizon="7 days").to_pandas()
    assert out["n_keys"].tolist() == [int(oracle.c1[0]),
                                      int(oracle.c2[0]),
                                      int(oracle.c3[0])]
    # horizon can only shrink counts vs the unbounded funnel
    unb = funnel_counts(rd.from_pandas(df), key_col="user_id",
                        ts_col="ts", type_col="event_type",
                        steps=STEPS).to_pandas()
    assert (out["n_keys"].to_numpy() <= unb["n_keys"].to_numpy()).all()


def test_funnel_empty_and_validation(ray_session):
    import ray.data as rd

    df = _events(n=200, seed=3)
    df["event_type"] = "error"  # no funnel events at all
    out = funnel_counts(rd.from_pandas(df), key_col="user_id",
                        ts_col="ts", type_col="event_type",
                        steps=STEPS).to_pandas()
    assert out["n_keys"].tolist() == [0, 0, 0]
    assert out["conversion"].isna().all()

    ds = rd.from_pandas(_events(n=100))
    with pytest.raises(ValueError):
        funnel_counts(ds, key_col="user_id", ts_col="ts",
                      type_col="event_type", steps=["view"])
    with pytest.raises(ValueError):
        funnel_counts(ds, key_col="user_id", ts_col="ts",
                      type_col="event_type", steps=["view", "view"])


def test_funnel_latencies_vs_duckdb(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.funnel import funnel_latencies

    df = _events(seed=21)
    con = duckdb.connect()
    con.register("events", df)
    oracle = con.execute("""
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
          WHERE user_id IS NOT NULL AND event_type='view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN s1 USING (user_id) WHERE e.event_type='click'
          AND e.ts >= s1.t GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN s2 USING (user_id) WHERE e.event_type='purchase'
          AND e.ts >= s2.t GROUP BY 1)
        SELECT s3.user_id AS k,
          date_diff('microseconds', s1.t, s3.t) AS latency_us
        FROM s3 JOIN s1 USING (user_id) ORDER BY k
    """).df().astype({"k": "int64", "latency_us": "int64"})
    for parts in (1, 7):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        out = (funnel_latencies(ds, key_col="user_id", ts_col="ts",
                                type_col="event_type", steps=STEPS)
               .to_pandas().sort_values("k").reset_index(drop=True)
               .astype({"k": "int64", "latency_us": "int64"}))
        pd.testing.assert_frame_equal(out, oracle)
    assert (out["latency_us"] >= 0).all()
