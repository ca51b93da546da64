"""Rolling-window distinct counts — WAU/MAU-style "distinct keys in
the trailing N days, per day", EXACT and distributed.

``count(DISTINCT ...) OVER (RANGE ...)`` exists in no engine's window
executor (DuckDB included) because distinct doesn't decompose along a
sliding frame — the usual recourse is a per-day self-join (quadratic in
window width) or an approximate per-day HLL merge.  Exact CAN scale,
by partitioning on the KEY instead of time: distinct counts over
DISJOINT key sets are additive, so each key-bucket independently
computes its keys' contribution to every day and a tiny per-day sum
finishes the job.

In-bucket, a key contributes 1 to day d iff it was active in
[d-N+1, d] — i.e. each active day opens a coverage interval
[day, day+N-1], and the key's covered set is the UNION of its
intervals.  Merging per-key overlapping intervals (one vectorized
group-cummax, no per-key loop) makes them disjoint, so coverage counts
become a difference array: +1 at each merged start, -1 after each end,
prefix-summed once over the day axis in the final task.

Scale shape: the input collapses map-side to per-batch-distinct
(key, day) pairs; ONE key-bucket shuffle carries those slim pairs;
each bucket emits O(days) delta rows regardless of its row count; the
final task sees O(buckets × days) tiny rows.  Nothing is ever
quadratic in window width (compare the self-join twin) and no stage
holds more than a bucket's pairs.

The reference engine has no windowed operators (SURVEY.md §2.6); this
is a north-rule training-data/analytics extra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_US_PER_DAY = 86_400_000_000


def distinct_key_day(ds, *, key_col: str, ts_col: str):
    """ds -> slim per-batch-DISTINCT ``(k, dayi)`` pairs (int64 days
    since epoch; NULL keys dropped per SQL count(DISTINCT) semantics).
    The shared front end of every key-day analytics stage
    (rolling_distinct, cohort_retention): values never ride a shuffle,
    only the 16-byte pair."""

    def _pairs(batch: pa.Table):
        if batch.num_rows == 0:
            return
        ts = batch[ts_col]
        if ts.null_count:
            raise ValueError(f"distinct_key_day: {ts_col!r} has NULLs")
        # normalize to µs first — a pandas-born column arrives as ns
        ts_us = pc.cast(ts, pa.timestamp("us", getattr(ts.type, "tz", None)))
        dayi = pc.cast(ts_us, pa.int64()).to_numpy() // _US_PER_DAY
        key = batch[key_col]
        t = pa.table({"k": key, "dayi": pa.array(dayi, pa.int64())})
        if key.null_count:  # SQL count(DISTINCT) ignores NULL keys
            t = t.filter(pc.is_valid(t["k"]))
        if t.num_rows == 0:
            return
        # map-side dedup: a batch's repeats of (key, day) are one pair
        yield t.group_by(["k", "dayi"]).aggregate([])

    return ds.map_batches(_pairs, batch_format="pyarrow", batch_size=None)


def day_index_to_ts(dayi: np.ndarray) -> pd.Series:
    """int64 days-since-epoch -> datetime64[us] (the parquet-world unit)."""
    return pd.Series(pd.to_datetime(np.asarray(dayi, np.int64) * 86_400,
                                    unit="s")).astype("datetime64[us]")


def _merged_coverage_deltas(d: np.ndarray, gid: np.ndarray,
                            window_days: int):
    """(key-sorted active days d, per-key group ids gid) -> difference
    array of the union of per-key coverage intervals [day, day+N-1]:
    merged-union starts clip past the running per-key max end so each
    covered day counts exactly once; returns (days, deltas) with +1 at
    each merged start and -1 one past each merged end."""
    end = d + (window_days - 1)
    cm = end if window_days == 1 else (
        pd.Series(end).groupby(gid).cummax().to_numpy())
    prev_end = np.empty_like(d)
    prev_end[0] = np.iinfo(np.int64).min + 1
    prev_end[1:] = cm[:-1]
    newkey = np.concatenate([[True], gid[1:] != gid[:-1]])
    prev_end[newkey] = np.iinfo(np.int64).min + 1
    start = np.maximum(d, prev_end + 1)
    ok = start <= end
    days = np.concatenate([start[ok], end[ok] + 1])
    deltas = np.concatenate([np.ones(ok.sum(), np.int64),
                             -np.ones(ok.sum(), np.int64)])
    return days, deltas


def rolling_distinct(ds, *, key_col: str, ts_col: str, window_days: int,
                     out_col: str = "n_active", num_buckets: int = 64):
    """Per calendar day, the EXACT number of distinct ``key_col``
    values active in the trailing ``window_days`` days (inclusive).
    Returns one row per OBSERVED day (a day with at least one event):
    ``(day: timestamp[us], out_col: int64)``.

    SQL twin shape (quadratic, for checking only)::

        SELECT d.day, count(DISTINCT e.key) FROM days d JOIN events e
        ON date_trunc('day', e.ts) BETWEEN d.day - INTERVAL (N-1) DAY
        AND d.day GROUP BY d.day
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    from .dedup import bucketed_groupby

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop_duplicates(["k", "dayi"])
              .sort_values(["k", "dayi"], kind="stable"))
        d = df["dayi"].to_numpy(np.int64)
        gid = (df["k"] != df["k"].shift()).cumsum().to_numpy()
        days, deltas = _merged_coverage_deltas(d, gid, window_days)
        agg = pd.DataFrame({"dayi": days, "delta": deltas}).groupby(
            "dayi", as_index=False)["delta"].sum()
        obs = pd.DataFrame({"dayi": np.unique(d),
                            "delta": np.int64(0), "obs": np.int64(1)})
        agg["obs"] = np.int64(0)
        return pd.concat([agg, obs], ignore_index=True)

    deltas = bucketed_groupby(
        distinct_key_day(ds, key_col=key_col, ts_col=ts_col),
        ["k"], _bucket, num_buckets=num_buckets)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dayi", as_index=False)[["delta", "obs"]].sum()
        g = g.sort_values("dayi")
        cov = g["delta"].to_numpy(np.int64).cumsum()
        obs_mask = g["obs"].to_numpy(np.int64) > 0
        dayi = g["dayi"].to_numpy(np.int64)[obs_mask]
        out = pd.DataFrame({
            "day": day_index_to_ts(dayi),
            out_col: cov[obs_mask],
        })
        return out.reset_index(drop=True)

    return deltas.repartition(1).map_batches(
        _final, batch_format="pandas", batch_size=None)


def cohort_retention(ds, *, key_col: str, ts_col: str,
                     num_buckets: int = 64):
    """Cohort retention matrix — the product-analytics staple: keys
    cohorted by their FIRST active day; for every (cohort_day,
    offset_days) cell, the exact number of cohort keys active that
    many days later, plus the retention fraction vs the cohort size.

    Same additive-distinct trick as :func:`rolling_distinct`: all of a
    key's (key, day) pairs land in one bucket, so the bucket knows the
    key's cohort (its min day) and emits partial per-cell counts —
    O(cells) rows per bucket, never the pairs.  The final task sums
    cells (bounded by days^2/2 — 66k cells for a year) and divides by
    the offset-0 count, which IS the cohort size (every key is active
    on its own cohort day).  Retention is a float64 division of exact
    ints — bit-stable vs the SQL twin.

    Returns ``(cohort_day: timestamp[us], offset_days: int64,
    n_active: int64, retention: float64)``.
    """
    from .dedup import bucketed_groupby

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["k", "dayi"])
        cohort = df.groupby("k")["dayi"].transform("min")
        out = (pd.DataFrame({"cohorti": cohort.to_numpy(),
                             "offset_days": (df["dayi"] - cohort).to_numpy()})
               .groupby(["cohorti", "offset_days"], as_index=False)
               .size().rename(columns={"size": "n_active"}))
        return out.astype({"cohorti": "int64", "offset_days": "int64",
                           "n_active": "int64"})

    cells = bucketed_groupby(
        distinct_key_day(ds, key_col=key_col, ts_col=ts_col),
        ["k"], _bucket, num_buckets=num_buckets)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["cohorti", "offset_days"], as_index=False)
             ["n_active"].sum())
        size0 = (g.loc[g["offset_days"] == 0, ["cohorti", "n_active"]]
                 .rename(columns={"n_active": "cohort_size"}))
        g = g.merge(size0, on="cohorti")
        g = g.sort_values(["cohorti", "offset_days"]).reset_index(drop=True)
        return pd.DataFrame({
            "cohort_day": day_index_to_ts(g["cohorti"].to_numpy()),
            "offset_days": g["offset_days"].astype(np.int64),
            "n_active": g["n_active"].astype(np.int64),
            "retention": g["n_active"].to_numpy(np.int64)
                         * 1.0 / g["cohort_size"].to_numpy(np.int64),
        })

    return cells.repartition(1).map_batches(
        _final, batch_format="pandas", batch_size=None)


def stickiness(ds, *, key_col: str, ts_col: str, short_days: int = 1,
               long_days: int = 30, short_col: str = "dau",
               long_col: str = "mau", ratio_col: str = "stickiness",
               num_buckets: int = 64):
    """DAU/MAU stickiness — per observed day, the EXACT distinct-key
    counts over a short and a long trailing window plus their ratio
    (the classic engagement metric).  BOTH windows are computed from
    the SAME slim-pair shuffle in one bucket pass: each bucket emits
    the two windows' merged-coverage difference arrays side by side
    (tagged rows), so the long window costs no extra scan or exchange.

    Returns ``(day: timestamp[us], short_col: int64, long_col: int64,
    ratio_col: float64)`` — the ratio is the exact float64 division of
    the two exact ints (short <= long always, and long >= 1 on an
    observed day, so no division by zero).
    """
    if not (1 <= short_days < long_days):
        raise ValueError("need 1 <= short_days < long_days")
    from .dedup import bucketed_groupby

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop_duplicates(["k", "dayi"])
              .sort_values(["k", "dayi"], kind="stable"))
        d = df["dayi"].to_numpy(np.int64)
        gid = (df["k"] != df["k"].shift()).cumsum().to_numpy()
        frames = []
        for win, w_days in ((0, short_days), (1, long_days)):
            days, deltas = _merged_coverage_deltas(d, gid, w_days)
            frames.append(pd.DataFrame(
                {"dayi": days, "win": np.int64(win), "delta": deltas,
                 "obs": np.int64(0)}))
        frames.append(pd.DataFrame(
            {"dayi": np.unique(d), "win": np.int64(0),
             "delta": np.int64(0), "obs": np.int64(1)}))
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["dayi", "win"], as_index=False)[
            ["delta", "obs"]].sum()

    deltas = bucketed_groupby(
        distinct_key_day(ds, key_col=key_col, ts_col=ts_col),
        ["k"], _bucket, num_buckets=num_buckets)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dayi", "win"], as_index=False)[
            ["delta", "obs"]].sum()
        days_all = np.sort(g["dayi"].unique())
        pos = pd.Series(np.arange(len(days_all)), index=days_all)
        cov = np.zeros((2, len(days_all)), np.int64)
        obs = np.zeros(len(days_all), np.int64)
        for win in (0, 1):
            sub = g[g["win"] == win]
            at = pos.loc[sub["dayi"]].to_numpy()
            dd = np.zeros(len(days_all), np.int64)
            np.add.at(dd, at, sub["delta"].to_numpy(np.int64))
            cov[win] = dd.cumsum()
            if win == 0:
                np.add.at(obs, at, sub["obs"].to_numpy(np.int64))
        m = obs > 0
        short = cov[0][m]
        long_ = cov[1][m]
        return pd.DataFrame({
            "day": day_index_to_ts(days_all[m]),
            short_col: short,
            long_col: long_,
            ratio_col: short * 1.0 / long_,
        })

    return deltas.repartition(1).map_batches(
        _final, batch_format="pandas", batch_size=None)


def hll_rolling_distinct(ds, *, key_col: str, ts_col: str,
                         window_days: int, m: int = 1 << 12,
                         out_col: str = "n_active_est"):
    """Approximate rolling-window distinct — the 100 TB scale path
    beside :func:`rolling_distinct`: ONE grouped HLL build (one state
    per day; the raw stream is scanned once) and a driver-side sliding
    register-max over the tiny (days x m) state matrix.  Register max
    IS HLL union, so each day's estimate is a true merged-window HLL
    count with the standard 1.04/sqrt(m) relative error.

    Exact variant shuffles slim (key, day) pairs; this one ships only
    per-day m-byte states (bounded by days, independent of keys or
    rows) — the right trade when keys are billions.  Returns
    ``(day: timestamp[us], out_col: float64)`` over observed days.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    from ..kernels import hll
    from .build import SketchRequest, build_partials
    from .merge import collect_final, merge_partials_streaming

    def _day(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        ts_us = pc.cast(ts, pa.timestamp("us", getattr(ts.type, "tz", None)))
        dayi = pc.cast(ts_us, pa.int64()).to_numpy() // _US_PER_DAY
        # group keys are strings at the build-stage boundary
        return pa.table({"k": batch[key_col],
                         "dayi": pc.cast(pa.array(dayi.astype(np.int64)),
                                         pa.string())})

    partials = build_partials(
        ds.map_batches(_day, batch_format="pyarrow"),
        [SketchRequest("rolling_hll", "hll", hll.HLLSpec(m=m),
                       on=lambda b: pc.cast(b["k"], pa.string()),
                       group_by="dayi")],
    )
    final = collect_final(merge_partials_streaming(partials))
    days = np.array(sorted(int(gk) for (_, gk) in final), np.int64)
    if len(days) == 0:
        return pd.DataFrame({"day": day_index_to_ts(days),
                             out_col: np.zeros(0, np.float64)})
    regs = np.stack([hll.from_bytes(final[("rolling_hll", str(d))]).registers
                     for d in days])
    spec = hll.HLLSpec(m=m)
    est = np.empty(len(days), np.float64)
    for i, d in enumerate(days):
        lo = int(np.searchsorted(days, d - (window_days - 1)))
        merged = regs[lo:i + 1].max(axis=0)
        est[i] = hll.count(hll.HLLState(spec, merged))
    return pd.DataFrame({"day": day_index_to_ts(days), out_col: est})
