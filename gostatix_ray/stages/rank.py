"""Grouped top-k (per-key ranking) — the window-function workload.

The reference engine has no relational operators (SURVEY.md §2.6); the
engine supplies them Ray-Data-natively.  ``grouped_topk`` keeps the k
best rows per group by (order_col, tiebreak) — deterministic ranking —
with the scale-critical property that the shuffle is PRE-PRUNED:

  map side: each block keeps at most k rows per group it sees
            (one vectorized lexsort + rank-within-group mask);
  reduce side: one coarse-bucket shuffle of the surviving rows, then
            the same vectorized mask emits the final ranks.

So the exchange carries O(k · groups-per-block · blocks) rows instead
of the whole table — at 100 TB, a top-2-per-customer over lineitem
ships ~2 rows per (customer, block) rather than every line item.
Ties are broken by ``tiebreak`` ascending, making ranks deterministic
for any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _topk_mask(g: np.ndarray, v: np.ndarray, t: np.ndarray, k: int,
               descending: bool):
    """Row order + within-group rank for rows sorted by (g, v, t).

    Returns (sorted_row_indices, rank_within_group).
    """
    key_v = -v if descending else v
    order = np.lexsort((t, key_v, g))
    gs = g[order]
    n = len(gs)
    idx = np.arange(n, dtype=np.int64)
    newg = np.empty(n, dtype=bool)
    if n:
        newg[0] = True
        newg[1:] = gs[1:] != gs[:-1]
    gstart = np.maximum.accumulate(np.where(newg, idx, 0))
    return order, idx - gstart


def grouped_topk(ds, *, group_col: str, order_col: str, tiebreak: str,
                 k: int, descending: bool = True, rank_col: str = "rank",
                 num_buckets: int = 64):
    """Top-k rows per group with map-side pruning; adds 1-based
    ``rank_col``.  ``order_col`` must be numeric, ``tiebreak`` a unique
    orderable column (ascending) so results are partition-independent.
    """
    from .dedup import bucketed_groupby

    def _prune(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        v = batch[order_col].to_numpy(zero_copy_only=False)
        t = batch[tiebreak].to_numpy(zero_copy_only=False)
        order, rank = _topk_mask(g, v, t, k, descending)
        return batch.take(pa.array(order[rank < k]))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_col].to_numpy()
        v = df[order_col].to_numpy()
        t = df[tiebreak].to_numpy()
        order, rank = _topk_mask(g, v, t, k, descending)
        keep = rank < k
        out = df.iloc[order[keep]].reset_index(drop=True)
        out[rank_col] = rank[keep] + 1
        return out

    pruned = ds.map_batches(_prune, batch_format="pyarrow")
    return bucketed_groupby(pruned, [group_col], _final, num_buckets=num_buckets)


def global_topn(ds, *, order_col: str, tiebreak: str, n: int,
                descending: bool = True, rank_col: str = "rank",
                funnel_width: int | None = None):
    """Distributed ``ORDER BY order_col [DESC], tiebreak LIMIT n`` —
    the global-top-N shape, WITHOUT a global sort.

    Map side: every block keeps only its local top-n (one pandas stable
    sort + head), so the exchange carries at most ``n × blocks`` rows
    regardless of input size; final: coalesce to one block and rank the
    ≤ n × blocks survivors.  ``tiebreak`` (ascending, any orderable
    dtype — strings included) makes the cut deterministic for every
    partitioning.  Adds a 1-based ``rank_col``.

    ``funnel_width``: optional middle funnel level for VERY wide inputs
    (≥ ~10^5 blocks, where n × blocks no longer fits one task): survivors
    first coalesce into ``funnel_width`` blocks, each pruned back to its
    local top-n, so the final task sees ≤ n × funnel_width rows.  The
    prune is idempotent — any funnel shape yields the same top-n — but
    the extra exchange costs a fixed ~0.5-1 s, so it stays off by
    default for ordinary block counts.
    """
    import pandas as pd

    asc = [not descending, True]
    cols = [order_col, tiebreak]

    def _prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(cols, ascending=asc, kind="stable").head(n)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(cols, ascending=asc, kind="stable").head(n)
        out = out.reset_index(drop=True)
        out[rank_col] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    pruned = ds.map_batches(_prune, batch_format="pandas")
    if funnel_width:
        pruned = pruned.repartition(funnel_width).map_batches(
            _prune, batch_format="pandas", batch_size=None)
    # single final block: survivors are n×blocks (or n×funnel_width) rows —
    # driver-free, one task
    return pruned.repartition(1).map_batches(_final, batch_format="pandas", batch_size=None)
