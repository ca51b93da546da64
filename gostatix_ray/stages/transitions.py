"""Event-type transition matrix — Markov path analytics: for every
ordered pair of consecutive events of the same key (ordered by
(ts, tiebreak)), the exact transition count and the conditional
probability P(dst | src).

SQL needs a full-width window pass (lead() over every event) plus a
grouped window for the row-normalization; here the input collapses to
slim (key, ts, tiebreak, type) rows over ONE key-bucket shuffle —
complete keys per bucket, so consecutive-pair extraction is a local
vectorized shift — and each bucket emits at most n_types² partial
count rows.  Counts over disjoint key sets are additive; a tiny final
task sums buckets and normalizes rows.  The probability is the exact
float64 division of two exact ints — bit-stable vs the SQL twin.

The reference engine has no relational/windowed operators
(SURVEY.md §2.6); this is a north-rule training-data/analytics extra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def transition_matrix(ds, *, key_col: str, ts_col: str, type_col: str,
                      order_col: str, num_buckets: int = 64):
    """EXACT (src_type, dst_type, n, p) over consecutive same-key
    events ordered by ``(ts_col, order_col)``; NULL keys and NULL
    types are dropped (SQL twin filters both).  ``p = n / Σ_dst n``
    per src row."""
    from .dedup import bucketed_groupby

    def _slim(batch: pa.Table):
        if batch.num_rows == 0:
            return
        ts = batch[ts_col]
        if ts.null_count:
            raise ValueError(f"transition_matrix: {ts_col!r} has NULLs")
        ts_us = pc.cast(pc.cast(ts, pa.timestamp(
            "us", getattr(ts.type, "tz", None))), pa.int64())
        t = pa.table({"k": batch[key_col], "tsus": ts_us,
                      "ord": batch[order_col], "typ": batch[type_col]})
        t = t.drop_null()
        if t.num_rows:
            yield t

    slim = ds.map_batches(_slim, batch_format="pyarrow", batch_size=None)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "tsus", "ord"], kind="stable")
        k = df["k"].to_numpy()
        typ = df["typ"].to_numpy()
        same = k[1:] == k[:-1]
        out = (pd.DataFrame({"src_type": typ[:-1][same],
                             "dst_type": typ[1:][same]})
               .groupby(["src_type", "dst_type"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out

    cells = bucketed_groupby(slim, ["k"], _bucket,
                             num_buckets=num_buckets)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["src_type", "dst_type"], as_index=False)
             ["n"].sum()
             .sort_values(["src_type", "dst_type"])
             .reset_index(drop=True))
        tot = g.groupby("src_type")["n"].transform("sum")
        return pd.DataFrame({
            "src_type": g["src_type"],
            "dst_type": g["dst_type"],
            "n": g["n"].astype(np.int64),
            "p": g["n"].to_numpy(np.int64) * 1.0
                 / tot.to_numpy(np.int64),
        })

    return cells.repartition(1).map_batches(
        _final, batch_format="pandas", batch_size=None)
