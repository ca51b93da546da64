"""Distributed prefix-scan window backend — the hot-partition scale path.

``window_over`` (stages/window_fns.py) hash-co-partitions by the
partition key: a partition lives entirely inside ONE bucket, so a hot
key (one conversation holding 25% of the corpus — see BASELINE.md
"Skew evidence") serializes behind a single task.  Vectorized, so the
straggler costs vector time, not Python time — but it is still a
straggler, and at 10^12-turn scale a pathological partition could
exceed one worker's memory.

``window_scan`` computes the SCAN-DECOMPOSABLE window columns —
running sum (``ROWS UNBOUNDED PRECEDING``), ROW_NUMBER, and the
previous-row gap — without ever co-locating a partition:

1. ``ds.sort([part, order, tiebreak])`` — Ray Data's range-partitioned
   sort; a hot partition SPLITS across consecutive blocks instead of
   landing on one worker.
2. One ``map_batches`` pass computes each sorted block's LOCAL columns
   (cumsum / arange / diff rebased at partition fences — blocks arrive
   pre-sorted, no lexsort) and tags rows with a per-batch run id.
3. A summary pass reduces each contiguous run PIECE to ONE
   constant-size row (first/last partition, the EMBEDDED running
   values at its last row, boundary order values, its first sort key).
   Pieces are disjoint sorted ranges, so ordering them by first key
   recovers the global chain; the driver walks it once — O(#blocks),
   not O(rows) — computing each piece's carry-in.  Chain accumulators
   read the embedded (batch-rebased) values, so the walk stays correct
   even when Ray's dynamic block splitting cuts one task output into
   several pieces mid-partition.
4. A final ``map_batches`` adds the broadcast carries to the prefix of
   each piece that continues its batch's first partition.

The sort is the one all-to-all (same count as window_over's bucket
shuffle); passes 2-4 are streaming map stages over the materialized
sorted output plus one tiny driver reduce.  Requires (part, order,
tiebreak) to be UNIQUE per row and part non-null — the determinism
condition every oracle-checked window query already satisfies.

Results are bit-identical to ``window_over`` (tests/test_window_scan.py
asserts exact frame equality on uniform and 25%-hot-key inputs).
"""

from __future__ import annotations

import uuid

import numpy as np
import pyarrow as pa

from .asof import _as_sortable_i64


def _pieces(run_ids: np.ndarray) -> list[tuple[int, int]]:
    """Contiguous [start, end) ranges of equal run-id values."""
    n = len(run_ids)
    if n == 0:
        return []
    change = np.flatnonzero(run_ids[1:] != run_ids[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return list(zip(starts.tolist(), ends.tolist()))


def _identity(part_val, ord_int: int, tie_val) -> str:
    """Equality key of a piece = its first row's (part, order, tie)."""
    return f"{part_val!r}\x1f{ord_int}\x1f{tie_val!r}"


class _LocalScan:
    """Pass 2: per-batch local window columns over pre-sorted rows.

    Always emits internal ``__seq`` / ``__ord`` (the chain walk needs
    embedded counts and boundary order values even when the caller
    didn't ask for seq/gap); pass 4 drops them.
    """

    def __init__(self, part_col, order_col, tiebreak, sum_col, running_name,
                 gap_name, gap_default, keep):
        self.part_col, self.order_col, self.tiebreak = part_col, order_col, tiebreak
        self.sum_col, self.running_name = sum_col, running_name
        self.gap_name, self.gap_default = gap_name, gap_default
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            # emit the OUTPUT schema (an input-schema empty block would
            # crash the summary/apply passes on the missing bookkeeping
            # columns — same pitfall as bucketed_groupby's empty-block note)
            out = {c: batch[c] for c in self.keep}
            if self.sum_col is not None:
                out[self.running_name] = pa.array([], pa.int64())
            out["__seq"] = pa.array([], pa.int64())
            if self.gap_name is not None:
                out[self.gap_name] = pa.array([], pa.int64())
            out["__run"] = pa.array([], pa.string())
            out["__ord"] = pa.array([], pa.int64())
            return pa.table(out)
        ps = batch[self.part_col].to_numpy(zero_copy_only=False)
        newg = np.ones(n, dtype=bool)
        newg[1:] = ps[1:] != ps[:-1]
        idx = np.arange(n, dtype=np.int64)
        gstart = np.maximum.accumulate(np.where(newg, idx, 0))
        out = {c: batch[c] for c in self.keep}
        if self.sum_col is not None:
            v = batch[self.sum_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cs = np.cumsum(v)
            out[self.running_name] = pa.array(cs - cs[gstart] + v[gstart])
        out["__seq"] = pa.array(idx - gstart + 1)
        ov = _as_sortable_i64(batch[self.order_col].to_numpy(zero_copy_only=False)).astype(np.int64)
        if self.gap_name is not None:
            gap = np.empty(n, dtype=np.int64)
            gap[0] = self.gap_default
            gap[1:] = ov[1:] - ov[:-1]
            gap[newg] = self.gap_default
            out[self.gap_name] = pa.array(gap)
        out["__run"] = pa.array(np.full(n, uuid.uuid4().hex[:16]))
        out["__ord"] = pa.array(ov)
        return pa.table(out)


def window_scan(ds, *, part_col: str, order_col: str, tiebreak: str,
                sum_col: str | None = None, running_name: str = "running_sum",
                gap_name: str | None = "gap", gap_default: int = -1,
                seq_name: str | None = None, keep: list | None = None):
    """Scan-decomposable window columns via distributed prefix scan.

    Same semantics as ``window_over`` for ``running_name`` (running sum
    of integer ``sum_col``, current row inclusive), ``seq_name``
    (ROW_NUMBER, 1-based) and ``gap_name`` (order-value delta vs the
    previous row, ``gap_default`` at each partition's first row).
    Output row SET matches window_over exactly; output ORDER is the
    global (part, order, tiebreak) sort.
    """
    if keep is None:
        keep = [part_col, tiebreak]
    # passes 3-4 need part and tiebreak even when the caller drops them
    internal_keep = list(keep)
    for c in (part_col, tiebreak):
        if c not in internal_keep:
            internal_keep.append(c)

    local = ds.sort([part_col, order_col, tiebreak]).map_batches(
        _LocalScan(part_col, order_col, tiebreak, sum_col, running_name,
                   gap_name, gap_default, internal_keep),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).materialize()

    # ---- pass 3: constant-size per-piece summaries ----------------------
    def _summarize(batch: pa.Table):
        runs = batch["__run"].to_numpy(zero_copy_only=False)
        ps = batch[part_col].to_numpy(zero_copy_only=False)
        ords = batch["__ord"].to_numpy(zero_copy_only=False)
        seqs = batch["__seq"].to_numpy(zero_copy_only=False)
        rsum = batch[running_name].to_numpy(zero_copy_only=False) if sum_col else None
        ties = batch[tiebreak].to_numpy(zero_copy_only=False)
        rows = []
        for s, e in _pieces(runs):
            rows.append({
                "run": str(runs[s]),
                "key": _identity(ps[s], int(ords[s]), ties[s]),
                "min_part": ps[s], "min_ord": int(ords[s]), "min_tie": ties[s],
                "first_part": ps[s], "last_part": ps[e - 1],
                "last_running": int(rsum[e - 1]) if rsum is not None else 0,
                "last_seq": int(seqs[e - 1]),
                "last_ord": int(ords[e - 1]),
            })
        if not rows:
            # full summary schema, zero rows (a "run"-only empty table
            # would make the summaries dataset schema-inconsistent)
            empty_part = batch[part_col].slice(0, 0)
            empty_tie = batch[tiebreak].slice(0, 0)
            return pa.table({
                "run": pa.array([], pa.string()),
                "key": pa.array([], pa.string()),
                "min_part": empty_part, "min_ord": pa.array([], pa.int64()),
                "min_tie": empty_tie,
                "first_part": empty_part, "last_part": empty_part,
                "last_running": pa.array([], pa.int64()),
                "last_seq": pa.array([], pa.int64()),
                "last_ord": pa.array([], pa.int64()),
            })
        return pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]})

    entries = [r for r in local.map_batches(
        _summarize, batch_format="pyarrow", batch_size=None,
    ).take_all() if "key" in r]
    entries.sort(key=lambda r: (r["min_part"], r["min_ord"], r["min_tie"]))

    # ---- driver chain walk: O(#pieces) ----------------------------------
    # carries[key] = (sum_carry, seq_carry, prev_ord | None)
    # prev_ord is set only on the FIRST piece of a batch (later pieces'
    # first rows had an in-batch predecessor, so their local gap is
    # already correct).
    carries: dict[str, tuple[int, int, int | None]] = {}
    open_part = None  # partition open at the end of the previous piece
    acc_sum = acc_cnt = 0  # its accumulated total across all prior rows
    open_ord = 0
    cur_run = None
    batch_carry: tuple[int, int] | None = None  # pre-batch (sum, cnt)
    batch_first_part = None
    for e in entries:
        if e["run"] != cur_run:
            cur_run = e["run"]
            batch_first_part = e["first_part"]
            if open_part is not None and e["first_part"] == open_part:
                batch_carry = (acc_sum, acc_cnt)
                carries[e["key"]] = (acc_sum, acc_cnt, open_ord)
            else:
                batch_carry = None
        elif batch_carry is not None and e["first_part"] == batch_first_part:
            # later piece of the same batch, still inside the partition
            # that crosses the batch's left edge: embedded values are
            # batch-rebased, so the SAME pre-batch carry applies
            carries[e["key"]] = (batch_carry[0], batch_carry[1], None)
        # update the open-partition accumulators from EMBEDDED values:
        # last_running/last_seq count the open partition's rows within
        # this batch; add the pre-batch carry iff the batch's first
        # partition is still the open one
        base_s, base_c = (batch_carry if (batch_carry is not None and e["last_part"] == batch_first_part)
                          else (0, 0))
        acc_sum = base_s + e["last_running"]
        acc_cnt = base_c + e["last_seq"]
        open_part = e["last_part"]
        open_ord = e["last_ord"]

    # ---- pass 4: apply carries to each piece's first-partition prefix ---
    def _apply(batch: pa.Table) -> pa.Table:
        runs = batch["__run"].to_numpy(zero_copy_only=False)
        ps = batch[part_col].to_numpy(zero_copy_only=False)
        ords = batch["__ord"].to_numpy(zero_copy_only=False)
        ties = batch[tiebreak].to_numpy(zero_copy_only=False)
        rsum = batch[running_name].to_numpy(zero_copy_only=False).copy() if sum_col else None
        seqs = batch["__seq"].to_numpy(zero_copy_only=False).copy()
        gap = batch[gap_name].to_numpy(zero_copy_only=False).copy() if gap_name else None
        for s, e in _pieces(runs):
            c = carries.get(_identity(ps[s], int(ords[s]), ties[s]))
            if c is None:
                continue
            c_sum, c_cnt, c_ord = c
            first_part = ps[s]
            j = s
            while j < e and ps[j] == first_part:
                j += 1
            if rsum is not None:
                rsum[s:j] += c_sum
            seqs[s:j] += c_cnt
            if gap is not None and c_ord is not None:
                gap[s] = int(ords[s]) - c_ord
        out = {c: batch[c] for c in keep}
        if rsum is not None:
            out[running_name] = pa.array(rsum)
        if seq_name is not None:
            out[seq_name] = pa.array(seqs)
        if gap is not None:
            out[gap_name] = pa.array(gap)
        return pa.table(out)

    return local.map_batches(_apply, batch_format="pyarrow", batch_size=None)
