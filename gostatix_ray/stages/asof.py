"""As-of join — time-series join Ray Data has no native operator for.

The reference engine has no relational operators (SURVEY.md §2.6); the
engine supplies them Ray-Data-natively.  ``asof_join`` matches each
left row to the *nearest* right row of the same key at-or-before
(``direction="backward"``) / at-or-after (``"forward"``) its ``on``
value — the classic event-to-latest-state join of training-data and
feature pipelines.

Scale design (the documented partitioning assumption): both sides are
hash-CO-PARTITIONED on ``key`` with one coarse-bucket shuffle each
(never a sort of the full tables, never a driver collect), then every
bucket is matched with one vectorized numpy pass:

  sort (key, on, side, tiebreak) -> lexsort
  latest-right-so-far            -> np.maximum.accumulate over right
                                    row positions
  key-group fencing              -> cummax of group starts

so a bucket with B rows costs O(B log B) with zero per-row Python.
Skewed keys salt naturally: the bucket count is configurable and a
single hot key still resolves inside one vectorized call.

Tie semantics are DETERMINISTIC and partition-independent: among right
rows sharing (key, on), the one with the greatest ``tiebreak`` wins
(pass the right side's unique id).  Without a tiebreak, duplicate
(key, on) right rows would make the winner depend on block order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_sortable_i64(arr: np.ndarray) -> np.ndarray:
    """View datetimes as int64 so one code path sorts/compares all ``on``
    types (numeric kept as-is)."""
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.view("int64")
    return arr


class _AsofBucketMatch:
    """pyarrow map_groups callable: match one co-partitioned bucket.

    Arrow in/out keeps every payload column its ORIGINAL type — the
    tagged union carries typed nulls for the other side, and a pandas
    group format would upcast int64-with-null to float64/object before
    the match even runs.
    """

    def __init__(self, key, on, left_cols, right_cols, direction, tolerance=None):
        self._key, self._on = key, on
        self._left_cols = left_cols  # {src: out_name}
        self._right_cols = right_cols  # {src: out_name}
        self._direction = direction
        self._tolerance = tolerance

    def __call__(self, table: pa.Table) -> pa.Table:
        n = table.num_rows
        k = table[self._key].to_numpy(zero_copy_only=False)
        on_v = _as_sortable_i64(table[self._on].to_numpy(zero_copy_only=False))
        side = table["__side"].to_numpy(zero_copy_only=False)
        tb = table["__tb"].to_numpy(zero_copy_only=False)
        if self._direction == "forward":
            on_v = -on_v  # nearest-after == nearest-before on negated axis
        # primary key, then on, then rights-before-lefts at equal on,
        # then tiebreak ascending so the max-tiebreak right is LAST (wins
        # the cummax below) — fully deterministic for any block order.
        order = np.lexsort((tb, side, on_v, k))
        k_s, side_s = k[order], side[order]
        on_s = on_v[order]
        idx = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(side_s == 0, idx, -1))
        newg = np.empty(n, dtype=bool)
        if n:
            newg[0] = True
            newg[1:] = k_s[1:] != k_s[:-1]
        gstart = np.maximum.accumulate(np.where(newg, idx, 0))
        is_left = side_s == 1
        lpos = idx[is_left]
        match = last_right[is_left]
        valid = match >= gstart[is_left]
        if self._direction == "nearest" and n:
            # forward candidate: nearest STRICTLY-after right row (exact
            # matches are already the backward candidate at distance 0),
            # fenced to the key group; equal-(key,on) rights resolve to
            # the GREATEST tiebreak (the documented contract, same as
            # backward/forward) by jumping from the run's first right to
            # its last — rights of one (key, on) value are contiguous
            # and tb-ascending under the lexsort
            nxt = np.minimum.accumulate(
                np.where(side_s == 0, idx, n)[::-1])[::-1]
            starts = np.flatnonzero(newg)
            gend = np.repeat(np.append(starts[1:], n),
                             np.diff(np.append(starts, n)))
            runb = np.empty(n, dtype=bool)
            runb[0] = True
            runb[1:] = ((k_s[1:] != k_s[:-1]) | (on_s[1:] != on_s[:-1])
                        | (side_s[1:] != side_s[:-1]))
            rstarts = np.flatnonzero(runb)
            rlens = np.diff(np.append(rstarts, n))
            rend = np.repeat(rstarts + rlens - 1, rlens)
            match_f = nxt[lpos]
            valid_f = match_f < gend[lpos]
            match_f = rend[np.where(valid_f, match_f, 0)]
            on_l = on_s[lpos]
            d_b = on_l - on_s[np.where(valid, match, 0)]
            d_f = on_s[np.where(valid_f, match_f, 0)] - on_l
            if self._tolerance is not None:
                valid &= d_b <= self._tolerance
                valid_f &= d_f <= self._tolerance
            use_b = valid & (~valid_f | (d_b <= d_f))
            match = np.where(use_b, match, match_f)
            valid = valid | valid_f
        elif self._tolerance is not None:
            # bounded staleness: |left_on - right_on| <= tolerance (the
            # transformed axis makes the signed distance >= 0 for both
            # backward and forward)
            d = on_s[lpos] - on_s[np.where(valid, match, 0)]
            valid &= d <= self._tolerance
        left_rows = order[is_left]
        right_rows = order[np.where(valid, match, 0)]

        out: dict = {}
        for src, name in self._left_cols.items():
            out[name] = table[src].take(pa.array(left_rows))
        vmask = pa.array(valid)
        for src, name in self._right_cols.items():
            vals = table[src].take(pa.array(right_rows))
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            out[name] = pc.if_else(vmask, vals, pa.scalar(None, type=vals.type))
        return pa.table(out)


def asof_join(
    left,
    right,
    *,
    key: str,
    on: str,
    left_cols: dict,
    right_cols: dict,
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    num_buckets: int = 64,
):
    """LEFT as-of join of two Datasets (nulls where no right row
    qualifies).

    ``left_cols`` / ``right_cols``: {source column -> output name}.
    Output-name collisions across the two sides are the caller's to
    avoid.  ``tiebreak``: right-side column breaking (key, on) ties
    (greatest wins); REQUIRED whenever right rows can share (key, on),
    else results depend on block order.

    ``direction="nearest"``: the closer of the at-or-before and
    strictly-after matches (ties to backward — pandas ``merge_asof``
    semantics).  ``tolerance``: maximum |left_on − right_on| for a
    match, in the ``on`` column's storage unit (µs for timestamp[us]);
    farther rows fall to null like a miss — the bounded-staleness
    feature join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be >= 0")
    from ..hashing import hash128_keyed

    left_cols = dict(left_cols)
    right_cols = dict(right_cols)
    nb = np.uint64(num_buckets)

    def _tag(side_val: int, keep: list, all_payload: dict):
        # Unified schema for union: this side's payload + typed nulls for
        # the other side's, so Ray's zero-copy union sees one schema.
        def _fn(batch: pa.Table) -> pa.Table:
            ncols = {}
            h1, _ = hash128_keyed(pc.cast(batch[key], pa.string()), 31)
            n = batch.num_rows
            ncols[key] = batch[key]
            ncols[on] = batch[on]
            ncols["__side"] = pa.array(np.full(n, side_val, dtype=np.int8))
            if side_val == 0 and tiebreak is not None:
                ncols["__tb"] = pc.cast(batch[tiebreak], pa.int64())
            else:
                ncols["__tb"] = pa.array(np.zeros(n, dtype=np.int64))
            for src, typ in all_payload.items():
                if src in keep:
                    ncols[src] = batch[src]
                else:
                    ncols[src] = pa.nulls(n, type=typ)
            ncols["__bucket"] = pa.array((h1 % nb).astype(np.int64))
            return pa.Table.from_pydict(ncols)

        return _fn

    lschema, rschema = left.schema(), right.schema()
    if lschema is None or rschema is None:
        raise ValueError(
            "asof_join input has no schema: the dataset is empty and "
            "Ray could not infer a map_batches output schema over zero "
            "rows (see stages/joins.py _arrow_schema); check "
            "ds.schema() is not None before joining")
    payload: dict = {}  # key/on always ride along — never nulled out
    for src in left_cols:
        if src not in (key, on):
            payload[src] = lschema.base_schema.field(src).type
    for src in right_cols:
        if src in (key, on):
            raise ValueError("asof_join: right_cols may not reuse key/on names")
        if src not in payload:
            payload[src] = rschema.base_schema.field(src).type
    shared = set(left_cols) & set(right_cols)
    if shared:
        raise ValueError(f"asof_join: columns on both sides not supported: {shared}")

    tagged = left.map_batches(
        _tag(1, list(left_cols), payload), batch_format="pyarrow"
    ).union(right.map_batches(_tag(0, list(right_cols), payload), batch_format="pyarrow"))

    match = _AsofBucketMatch(key, on, left_cols, right_cols, direction, tolerance)
    # plain-function wrapper: map_groups reads fn.__name__ for its
    # operator label, which a callable instance lacks.
    return tagged.groupby("__bucket").map_groups(
        lambda t: match(t), batch_format="pyarrow"
    )
