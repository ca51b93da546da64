"""Rolling-window exact distinct (stages/rolling.py) vs the quadratic
DuckDB self-join, over adversarial day patterns."""

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pytest


def _events(seed=3, n=4000, n_users=60, span_days=45, null_frac=0.0):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    # bursty days: half the mass on 5 hot days, the rest anywhere
    hot = rng.choice(span_days, 5, replace=False)
    days = np.where(rng.random(n) < 0.5, rng.choice(hot, n),
                    rng.integers(0, span_days, n))
    ts = [base + dt.timedelta(days=int(d), minutes=int(m))
          for d, m in zip(days, rng.integers(0, 1440, n))]
    users = pd.array(rng.zipf(1.4, n).clip(1, n_users).astype("int64"),
                     dtype="Int64")
    if null_frac:
        users[rng.random(n) < null_frac] = pd.NA
    return pd.DataFrame({"user_id": users, "ts": ts})


def _oracle(df, window_days):
    con = duckdb.connect()
    con.register("events", df)
    return con.execute(f"""
        WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
        SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        FROM days d JOIN events e ON date_trunc('day', e.ts)
        BETWEEN d.day - INTERVAL {window_days - 1} DAY AND d.day
        GROUP BY d.day ORDER BY d.day
    """).df()


@pytest.mark.parametrize("window_days", [1, 7, 30])
def test_rolling_distinct_vs_duckdb(ray_session, window_days):
    import ray.data as rd

    from gostatix_ray.stages.rolling import rolling_distinct

    df = _events()
    out = rolling_distinct(
        rd.from_pandas(df).repartition(7), key_col="user_id", ts_col="ts",
        window_days=window_days,
    ).to_pandas().sort_values("day").reset_index(drop=True)
    expect = _oracle(df, window_days)
    pd.testing.assert_frame_equal(out, expect)


def test_rolling_distinct_null_keys_and_partitioning(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.rolling import rolling_distinct

    df = _events(seed=11, null_frac=0.1)
    outs = []
    for parts in (1, 13):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        out = rolling_distinct(ds, key_col="user_id", ts_col="ts",
                               window_days=7)
        outs.append(out.to_pandas().sort_values("day").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # NULL keys never counted (SQL count(DISTINCT) semantics)
    pd.testing.assert_frame_equal(outs[0], _oracle(df, 7))


def test_rolling_distinct_validates(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.rolling import rolling_distinct

    ds = rd.from_pandas(_events(n=50))
    with pytest.raises(ValueError):
        rolling_distinct(ds, key_col="user_id", ts_col="ts", window_days=0)


def _cohort_oracle(df):
    con = duckdb.connect()
    con.register("events", df)
    return con.execute("""
        WITH c AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
          FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
          FROM events WHERE user_id IS NOT NULL),
        cell AS (SELECT c.cohort_day,
          CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS offset_days,
          CAST(count(*) AS BIGINT) AS n_active
          FROM a JOIN c USING (user_id) GROUP BY 1, 2)
        SELECT cell.cohort_day, cell.offset_days, cell.n_active,
          cell.n_active * 1.0 / sz.cohort_size AS retention FROM cell JOIN
          (SELECT cohort_day, n_active AS cohort_size FROM cell
           WHERE offset_days = 0) sz USING (cohort_day)
        ORDER BY cohort_day, offset_days
    """).df()


def test_cohort_retention_vs_duckdb(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.rolling import cohort_retention

    df = _events(seed=5, null_frac=0.08)
    outs = []
    for parts in (1, 9):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        out = cohort_retention(ds, key_col="user_id", ts_col="ts")
        outs.append(out.to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], _cohort_oracle(df))
    # every cohort retains 100% of itself at offset 0
    z = outs[0][outs[0]["offset_days"] == 0]
    assert (z["retention"] == 1.0).all()


def _stickiness_oracle(df, long_days=30):
    con = duckdb.connect()
    con.register("events", df)
    out = con.execute(f"""
        WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
        dau AS (SELECT date_trunc('day', ts) AS day,
          CAST(count(DISTINCT user_id) AS BIGINT) AS dau FROM events GROUP BY 1),
        mau AS (SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS mau
          FROM days d JOIN events e
          ON date_trunc('day', e.ts)
             BETWEEN d.day - INTERVAL {long_days - 1} DAY AND d.day GROUP BY 1)
        SELECT d.day, dau.dau, mau.mau, dau.dau * 1.0 / mau.mau AS stickiness
        FROM days d JOIN dau USING (day) JOIN mau USING (day) ORDER BY d.day
    """).df()
    out["day"] = out["day"].astype("datetime64[us]")
    return out


def test_stickiness_vs_duckdb(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.rolling import stickiness

    df = _events(seed=9, null_frac=0.06)
    # bursty: drop a mid stretch so some days are unobserved
    df = df[~df["ts"].dt.floor("D").isin(
        pd.to_datetime(["1970-02-05", "1970-02-06", "1970-02-07"]))]
    df = df.reset_index(drop=True)
    oracle = _stickiness_oracle(df)
    for parts in (1, 6):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        out = stickiness(ds, key_col="user_id", ts_col="ts",
                         short_days=1, long_days=30
                         ).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
        assert (out["stickiness"].to_numpy()
                == oracle["stickiness"].to_numpy()).all()


def test_stickiness_validates(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.rolling import stickiness

    ds = rd.from_pandas(_events(n=50))
    with pytest.raises(ValueError):
        stickiness(ds, key_col="user_id", ts_col="ts",
                   short_days=7, long_days=7)


def test_hll_rolling_within_bound(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.rolling import (hll_rolling_distinct,
                                             rolling_distinct)

    df = _events(n=30_000, seed=17, null_frac=0.0)
    ds = rd.from_pandas(df).repartition(6)
    exact = rolling_distinct(ds, key_col="user_id", ts_col="ts",
                             window_days=7).to_pandas()
    est = hll_rolling_distinct(
        rd.from_pandas(df).repartition(6), key_col="user_id",
        ts_col="ts", window_days=7, m=1 << 12)
    merged = exact.merge(est, on="day")
    assert len(merged) == len(exact) == len(est)
    rel = np.abs(merged["n_active_est"] - merged["n_active"]) \
        / merged["n_active"]
    # 1.04/sqrt(4096) ~ 1.6% std error; allow 5 sigma
    assert rel.max() <= 5 * 1.04 / np.sqrt(4096), rel.max()
