"""Low-cardinality group-by reduction without Ray's sort-based Aggregate.

Ray Data's ``groupby(...).aggregate(...)`` is a sort-based all-to-all:
it samples boundaries, range-partitions EVERY input row, and pays a
multi-second fixed cost regardless of group count (measured ~4 s on a
600k-row / 3-group count at sf0.1).  For GROUP BY over a LOW-cardinality
key — event types, languages, flags, days — the right distributed shape
is a combiner: collapse each block to ≤|groups| partial rows map-side,
coalesce the tiny partials into one block, and run the final combine in
a single task.  Same shape as a Ray AggregateFn's
accumulate/merge/finalize, minus the all-to-all.

The cap is the caller's contract: the final task holds one row per
group, so G in the millions belongs in the sort-based groupby (or
``dedup.bucketed_groupby``), not here.
"""

from __future__ import annotations

import pandas as pd

# (partial-stage pandas agg, final-combine pandas agg) per supported op.
# count partials are SIZES; combining partial counts is a SUM.
_OPS = {
    "sum": ("sum", "sum"),
    "count": ("size", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def small_group_agg(ds, group_cols, aggs: dict):
    """GROUP BY ``group_cols`` -> one row per group, streaming combiner.

    ``aggs``: ``{out_col: (src_col, op)}`` with op in sum|count|min|max
    (``count`` counts rows; its src_col is ignored).  Integer sums stay
    int64 end-to-end (exact, hash-stable vs SQL).  Output is a Dataset
    with columns ``group_cols + list(aggs)``.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    group_cols = list(group_cols)
    for out, (_, op) in aggs.items():
        if op not in _OPS:
            raise ValueError(f"small_group_agg: unsupported op {op!r} for {out!r}")

    partial_kw = {}
    final_kw = {}
    for out, (src, op) in aggs.items():
        p_op, f_op = _OPS[op]
        partial_kw[out] = (src if p_op != "size" else group_cols[0], p_op)
        final_kw[out] = (out, f_op)

    def _partial(df: pd.DataFrame):
        if df.empty:
            return  # empty partials would re-enter downstream schemaless
        yield (
            df.groupby(group_cols, sort=False, as_index=False, dropna=False)
            .agg(**partial_kw)
        )

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(group_cols, sort=False, as_index=False, dropna=False)
            .agg(**final_kw)
        )

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(_final, batch_format="pandas", batch_size=None)
    )
