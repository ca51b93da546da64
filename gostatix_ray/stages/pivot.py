"""Distributed PIVOT: long (row_key, col_key, value) -> wide per-row_key columns.

Classic SQL PIVOT with an explicit IN-list (the pivoted categories must
be enumerated up front — same contract as every SQL engine, and what
keeps the output schema static for Arrow).  No reference counterpart
(the reference is a sketch library); north-rule extra for the
feature-table shapes training pipelines export.

Scale shape: the pivot is computed MAP-SIDE — each batch collapses to
at most one wide partial row per distinct row_key in that batch
(vectorized bincount per pivot category), so the shuffle moves tiny
pre-aggregated wide rows, never events.  One coarse-bucket reduce
(dedup.bucketed_groupby) sums partials per row_key.  All outputs are
int64 (counts / integer cents), so partial sums are exactly associative
and the result hash-matches any SQL engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import bucketed_groupby


def pivot_table(ds, *, index: str, columns: str, values: list[str],
                sum_col: str | None = None, count_prefix: str = "n_",
                sum_prefix: str = "sum_", num_buckets: int = 16):
    """Pivot ``ds`` to one row per ``index`` value.

    For each category ``v`` in ``values`` (the explicit IN-list) emits
    ``{count_prefix}{v}`` = count of rows with ``columns == v``, and —
    when ``sum_col`` (an int64 column; convert money to cents first) is
    given — ``{sum_prefix}{v}`` = its per-category sum.  Rows whose
    category is not in ``values`` are ignored (SQL PIVOT semantics).
    """
    cats = list(values)
    cnt_names = [f"{count_prefix}{v}" for v in cats]
    sum_names = [f"{sum_prefix}{v}" for v in cats] if sum_col else []

    def _partial(batch: pa.Table) -> pa.Table:
        idx = batch[index].to_numpy(zero_copy_only=False)
        col = batch[columns].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(idx)
        n = len(uniq)
        out = {index: uniq}
        sv = None
        if sum_col:
            sv = batch[sum_col].to_numpy(zero_copy_only=False)
            if sv.dtype.kind not in "iu":
                raise TypeError(
                    f"pivot sum_col needs an integer column, got {sv.dtype} "
                    f"(convert money to integer cents first)"
                )
        for v, cn in zip(cats, cnt_names):
            mask = col == v
            out[cn] = np.bincount(codes[mask], minlength=n).astype(np.int64)
        for v, sn in zip(cats, sum_names):
            mask = col == v
            # exact int accumulation (np.add.at), not float64 bincount
            # weights — values / partial sums above 2^53 must keep bits
            # for the 'exactly associative' contract to hold
            acc = np.zeros(n, dtype=np.int64)
            np.add.at(acc, codes[mask], sv[mask].astype(np.int64))
            out[sn] = acc
        return pa.table(out)

    metric_cols = cnt_names + sum_names

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(index, sort=False, as_index=False)[metric_cols].sum()
        for c in metric_cols:
            g[c] = g[c].astype(np.int64)
        return g

    return bucketed_groupby(ds.map_batches(_partial, batch_format="pyarrow"),
                            [index], _reduce, num_buckets=num_buckets)


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable", value_name: str = "value"):
    """UNPIVOT / melt: wide -> long, one output row per (input row,
    value column).  Pure per-batch Arrow transform — NO shuffle; the
    k× row expansion streams through the executor.  ``value_cols`` are
    promoted to a COMMON type like SQL UNPIVOT (identical types kept;
    numeric mixes promote — any float → float64, all-int → int64;
    anything else must already share a type, rejected up front with a
    clear error rather than a mid-pipeline task failure)."""
    cols = list(value_cols)
    if not cols:
        raise ValueError("unpivot needs at least one value column")

    def _common_type(types: list) -> pa.DataType:
        if len({str(t) for t in types}) == 1:
            return types[0]
        if all(pa.types.is_integer(t) or pa.types.is_floating(t) for t in types):
            return (pa.float64() if any(pa.types.is_floating(t) for t in types)
                    else pa.int64())
        raise TypeError(
            f"unpivot: value columns have incompatible types "
            f"{[str(t) for t in types]}; cast them to a common type first")

    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = len(cols)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), k))
        out = {c: batch[c].take(idx) for c in id_cols}
        # dictionary-of-k values with repeated codes: no n×k Python
        # string objects, just an int8/int32 index buffer per batch
        var_codes = np.repeat(np.arange(k, dtype=np.int32), n)
        out[var_name] = pa.DictionaryArray.from_arrays(
            pa.array(var_codes), pa.array(cols, pa.string())
        ).cast(pa.string())
        vals = []
        for c in cols:
            v = batch[c]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            vals.append(v)
        t = _common_type([v.type for v in vals])
        out[value_name] = pa.concat_arrays([v.cast(t) for v in vals])
        return pa.table(out)

    return ds.map_batches(_melt, batch_format="pyarrow", zero_copy_batch=True)
