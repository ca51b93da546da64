"""Ordered funnel conversion — the product-analytics staple next to
sessionization and cohort retention: given an ordered list of step
event types (view -> click -> purchase), count the distinct keys that
REACHED each step, where "reached step i" means the key has a
qualifying step-i event at ``ts >= t_{i-1}`` (its first-reach time of
the previous step), chained from the key's FIRST step-1 event.  An
optional ``horizon`` additionally requires every step to land within
``horizon`` of the key's step-1 time.

Why this needs an operator: SQL expresses it only as a chain of
correlated min-aggregate joins (one scan + join per step — the twin
below), and no engine's window executor helps because the step-i
choice depends on the step-(i-1) choice.

Scale shape (same additive-distinct trick as stages/rolling.py): the
input collapses map-side to per-batch-distinct ``(key, step, ts)``
triples over ONLY the funnel's event types (a small subset of any real
event stream); ONE key-bucket shuffle co-locates each key's triples;
each bucket runs the first-reach chain vectorized across its keys
(n_steps small merges, no per-key loop) and emits exactly ``n_steps``
partial count rows — counts over disjoint key sets are additive, so a
tiny final task sums buckets and derives the conversion fractions.
:func:`funnel_latencies` rides the same shuffle and emits one row per
CONVERTING key (its first-to-last-step latency) — still distributed,
ready for the exact-quantile stages.  No stage ever holds more than
one bucket's triples; nothing is quadratic in steps or days.

The reference engine has no relational/windowed operators
(SURVEY.md §2.6); this is a north-rule training-data/analytics extra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _validate_steps(steps):
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel: steps must be distinct")


def _funnel_triples(ds, *, key_col: str, ts_col: str, type_col: str,
                    steps: list[str]):
    """ds -> slim per-batch-distinct ``(k, step, tsus)`` triples over
    the funnel's event types only (NULL keys dropped)."""

    def _triples(batch: pa.Table):
        if batch.num_rows == 0:
            return
        mask = pc.is_in(batch[type_col],
                        value_set=pa.array(steps, pa.string()))
        t = batch.filter(mask)
        if t.num_rows == 0:
            return
        ts = t[ts_col]
        if ts.null_count:
            raise ValueError(f"funnel: {ts_col!r} has NULLs")
        ts_us = pc.cast(pc.cast(ts, pa.timestamp(
            "us", getattr(ts.type, "tz", None))), pa.int64())
        # vectorized: each type's index in the (tiny) step list
        codes = pc.index_in(t[type_col], value_set=pa.array(steps))
        stepi = codes.to_numpy(zero_copy_only=False).astype(np.int64)
        slim = pa.table({"k": t[key_col], "step": pa.array(stepi),
                         "tsus": ts_us}).drop_null()
        if slim.num_rows == 0:
            return
        # map-side dedup: repeats of (key, step, ts) are one triple
        yield slim.group_by(["k", "step", "tsus"]).aggregate([])

    return ds.map_batches(_triples, batch_format="pyarrow",
                          batch_size=None)


def _chain(df: pd.DataFrame, n_steps: int, horizon_us):
    """Vectorized first-reach chain over one bucket's triples.
    Returns (per-step reach counts, the final step's reach frame with
    columns (k, tprev, t0))."""
    df = df.drop_duplicates(["k", "step", "tsus"])
    first = (df.loc[df["step"] == 0].groupby("k", as_index=False)
             ["tsus"].min().rename(columns={"tsus": "tprev"}))
    first["t0"] = first["tprev"]
    counts = [len(first)]
    prev = first  # columns (k, tprev, t0)
    for i in range(1, n_steps):
        cur = (df.loc[df["step"] == i, ["k", "tsus"]]
               .merge(prev, on="k"))
        cur = cur[cur["tsus"] >= cur["tprev"]]
        if horizon_us is not None:
            cur = cur[cur["tsus"] <= cur["t0"] + horizon_us]
        reach = (cur.groupby("k", as_index=False)
                 .agg(tprev=("tsus", "min"), t0=("t0", "first")))
        counts.append(len(reach))
        prev = reach
    return counts, prev


def funnel_counts(ds, *, key_col: str, ts_col: str, type_col: str,
                  steps: list[str], horizon=None, num_buckets: int = 64):
    """Per funnel step, the EXACT number of distinct ``key_col`` values
    that reached it (ordered first-reach chain, ``>=`` ties allowed).

    ``horizon`` (optional ``pandas.Timedelta``-coercible) bounds every
    step's first-reach time to ``t_1 + horizon``.

    Returns ``(step: int64 (1-based), event_type: string,
    n_keys: int64, conversion: float64)`` — conversion is the exact
    float64 division ``n_keys / n_keys(step 1)``.
    """
    _validate_steps(steps)
    from .dedup import bucketed_groupby

    horizon_us = (None if horizon is None
                  else int(pd.Timedelta(horizon).value // 1_000))
    n_steps = len(steps)
    triples = _funnel_triples(ds, key_col=key_col, ts_col=ts_col,
                              type_col=type_col, steps=steps)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        counts, _ = _chain(df, n_steps, horizon_us)
        return pd.DataFrame({"step": np.arange(1, n_steps + 1),
                             "n_keys": np.asarray(counts, np.int64)})

    partials = bucketed_groupby(triples, ["k"], _bucket,
                                num_buckets=num_buckets)
    # zero-count sentinel per step: an input with no funnel events
    # yields no partial blocks at all, and the final map would never
    # run — the sentinel guarantees one all-steps row set exists.
    import ray.data as rd
    sentinel = rd.from_pandas(pd.DataFrame(
        {"step": np.arange(1, n_steps + 1),
         "n_keys": np.zeros(n_steps, np.int64)}))
    partials = partials.union(sentinel)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("step", as_index=False)["n_keys"].sum()
             .sort_values("step").reset_index(drop=True))
        n = g["n_keys"].to_numpy(np.int64)
        base = n[0] if len(n) else 0
        conv = (n * 1.0 / base) if base > 0 \
            else np.full(len(n), np.nan)
        return pd.DataFrame({
            "step": g["step"].astype(np.int64),
            "event_type": [steps[i - 1] for i in g["step"]],
            "n_keys": n,
            "conversion": conv,
        })

    return partials.repartition(1).map_batches(
        _final, batch_format="pandas", batch_size=None)


def funnel_latencies(ds, *, key_col: str, ts_col: str, type_col: str,
                     steps: list[str], horizon=None,
                     num_buckets: int = 64):
    """One row per key that CONVERTED through the whole funnel:
    ``(k, latency_us: int64)`` — the first-reach chain's last-step time
    minus its step-1 time, in exact integer microseconds.

    Rides the same slim-triple shuffle as :func:`funnel_counts`; each
    bucket emits its converting keys only (bounded by distinct keys,
    not events), so the output is itself a distributed dataset ready
    for the exact-quantile stages or a per-cohort join.
    """
    _validate_steps(steps)
    from .dedup import bucketed_groupby

    horizon_us = (None if horizon is None
                  else int(pd.Timedelta(horizon).value // 1_000))
    n_steps = len(steps)
    triples = _funnel_triples(ds, key_col=key_col, ts_col=ts_col,
                              type_col=type_col, steps=steps)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        _, last = _chain(df, n_steps, horizon_us)
        return pd.DataFrame({
            "k": last["k"].to_numpy(),
            "latency_us": (last["tprev"].to_numpy(np.int64)
                           - last["t0"].to_numpy(np.int64)),
        })

    return bucketed_groupby(triples, ["k"], _bucket,
                            num_buckets=num_buckets)
