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
