"""Broadcast hash join — the dimension-table join for sketch pipelines.

The reference has no relational operators (SURVEY.md §2.6); the engine
supplies them Ray-Data-natively.  ``broadcast_join`` handles the
BIG ⨝ SMALL case without any shuffle: the small side is ``ray.put``
once and every task attaches columns with Arrow kernels
(``pc.index_in`` + ``pc.take``) — zero Python per row.  For BIG ⨝ BIG
use a bloom semi-join (stages/membership.py) to prune, then co-partition
with ``bucketed_groupby`` (stages/dedup.py) — documented pattern, not
this function.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class _BroadcastJoin:
    """Task callable; small-side table resolves lazily once per worker."""

    def __init__(self, small_ref, key: str, small_key: str, columns: list[str], how: str):
        self._ref = small_ref
        self._key, self._small_key = key, small_key
        self._columns, self._how = columns, how
        self._small = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._small is None:
            import ray

            self._small = ray.get(self._ref) if not isinstance(self._ref, pa.Table) else self._ref
        small = self._small
        keys = batch[self._key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        skeys = small[self._small_key]
        if isinstance(skeys, pa.ChunkedArray):
            skeys = skeys.combine_chunks()
        idx = pc.index_in(keys.cast(skeys.type), value_set=skeys)
        if self._how == "inner":
            keep = idx.is_valid()
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        for col in self._columns:
            batch = batch.append_column(col, pc.take(small[col], idx))
        return batch


def broadcast_join(ds, small: pa.Table, *, key: str, small_key: str,
                   columns: list[str], how: str = "inner", concurrency=None):
    """Attach ``columns`` of the small table to ds rows by key.

    ``how``: "inner" drops non-matching rows; "left" keeps them with
    nulls.  Duplicate keys on the small side resolve to the FIRST
    occurrence (``pc.index_in`` semantics — deterministic).  The small
    table ships to the object store ONCE (ray.put) and each worker
    resolves it once — never re-pickled per batch.
    """
    import ray

    kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoin(ref, key, small_key, columns, how),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **kwargs,
    )


class _IntervalJoin:
    """Task callable; interval table resolves lazily once per worker."""

    def __init__(self, ref, value_col: str, lo_col: str, hi_col: str, columns: list[str]):
        self._ref = ref
        self._value_col, self._lo, self._hi = value_col, lo_col, hi_col
        self._columns = columns
        self._small = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._small is None:
            import ray

            self._small = ray.get(self._ref) if not isinstance(self._ref, pa.Table) else self._ref
        small = self._small
        import numpy as np

        v = batch[self._value_col].to_numpy(zero_copy_only=False)
        lo = small[self._lo].to_numpy(zero_copy_only=False)
        hi = small[self._hi].to_numpy(zero_copy_only=False)
        pieces = []
        for i in range(small.num_rows):
            rows = np.flatnonzero((v >= lo[i]) & (v < hi[i]))
            sub = batch.take(pa.array(rows))
            idx = pa.array(np.full(len(rows), i, dtype=np.int64))
            for col in self._columns:
                sub = sub.append_column(col, pc.take(small[col], idx))
            pieces.append(sub)
        return pa.concat_tables(pieces)


def interval_join(ds, intervals: pa.Table, *, value_col: str,
                  lo_col: str = "lo", hi_col: str = "hi",
                  columns: list[str], concurrency=None):
    """Range join of ds rows into a SMALL broadcast interval table:
    emit (row × interval) for every interval with lo <= value < hi
    (overlapping intervals emit one output row each — true join
    semantics, not binning).

    The interval table ships once (``ray.put``); each batch runs one
    vectorized mask per interval — right for dozens-to-hundreds of
    intervals (bands, SLA tiers, date ranges).  A large interval table
    needs an interval tree / sorted-endpoint search instead; at that
    point co-partition both sides on a coarse range key.
    """
    import ray

    kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    ref = ray.put(intervals)
    return ds.map_batches(
        _IntervalJoin(ref, value_col, lo_col, hi_col, columns),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **kwargs,
    )
