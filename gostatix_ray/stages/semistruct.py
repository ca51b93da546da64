"""Semi-structured (JSON-string) column handling.

Event/transcript tables routinely carry a JSON props/metadata string
column; pipelines need typed fields out of it without a per-row
json.loads (a Python loop over 10^12 rows).  For flat scalar fields a
vectorized RE2 extraction (`pc.extract_regex`) is exact and orders of
magnitude cheaper — and because DuckDB's regexp_extract is RE2 too, the
result is SQL-twinnable bit-for-bit.  Nested/escaped JSON needs a real
parser; this stage is explicitly for the flat-field fast path (the
schema contract of the generating pipeline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import bucketed_groupby


def extract_int_field(batch_col, field: str) -> pa.Array:
    """Vectorized ``json_string[field]`` as int64 (null when absent)."""
    if isinstance(batch_col, pa.ChunkedArray):
        batch_col = batch_col.combine_chunks()
    pat = rf'"{field}"\s*:\s*(?P<v>-?\d+)'
    m = pc.extract_regex(batch_col, pat)
    return pc.cast(pc.struct_field(m, "v"), pa.int64())


def json_int_field_stats(ds, *, json_col: str, field: str, group_col: str,
                         num_buckets: int = 16):
    """Grouped stats (n / sum / min / max) of an integer JSON field.

    Map-side: extract + collapse each batch to one partial row per group
    (vectorized sort-free reduceat via pandas agg on the tiny per-batch
    group set).  One coarse-bucket reduce combines partials (sum n, sum
    sum, min min, max max) — the JSON strings never cross the wire.
    """
    def _partial(batch: pa.Table) -> pa.Table:
        k = extract_int_field(batch[json_col], field)
        df = pd.DataFrame({
            "g": batch[group_col].to_numpy(zero_copy_only=False),
            "k": k.to_numpy(zero_copy_only=False),
        })
        agg = df.dropna().groupby("g", sort=False)["k"].agg(["count", "sum", "min", "max"])
        return pa.table({
            group_col: pa.array(agg.index.to_numpy()),
            "n_k": pa.array(agg["count"].to_numpy().astype(np.int64)),
            "sum_k": pa.array(agg["sum"].to_numpy().astype(np.int64)),
            "min_k": pa.array(agg["min"].to_numpy().astype(np.int64)),
            "max_k": pa.array(agg["max"].to_numpy().astype(np.int64)),
        })

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False, as_index=False).agg(
            n_k=("n_k", "sum"), sum_k=("sum_k", "sum"),
            min_k=("min_k", "min"), max_k=("max_k", "max"),
        )
        for c in ("n_k", "sum_k", "min_k", "max_k"):
            g[c] = g[c].astype(np.int64)
        return g

    return bucketed_groupby(ds.map_batches(_partial, batch_format="pyarrow"),
                            [group_col], _reduce, num_buckets=num_buckets)
