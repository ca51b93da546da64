"""Per-partition window functions — lag deltas and running aggregates.

Training-data and feature pipelines need ordered per-entity state (time
since previous event, cumulative counts per user/conversation) that Ray
Data has no native operator for.  The reference engine has none either
(SURVEY.md §2.6 — engine side); this is a north-rule extra.

Scale shape (same partitioning assumption as stages/asof.py and
hash_join): rows hash-co-partition by the partition key with ONE
coarse-bucket shuffle, then every window column is computed in one
vectorized pass per bucket — lexsort by (part, order, tiebreak), group
fences, a shifted diff for the lag, and group-rebased cumulative sums
for the running aggregate.  A bucket with B rows costs O(B log B) with
zero per-row Python; skewed partitions resolve inside one vectorized
call.

Running sums are restricted to INTEGER columns so results are exact and
bit-identical to any SQL engine evaluating the same frame order
(``ROWS UNBOUNDED PRECEDING``) — float running sums would depend on
summation association.  Convert money to integer cents first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .asof import _as_sortable_i64


def _window_min(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Vectorized min over arbitrary inclusive windows [lo[i], hi[i]]
    via a sparse-table RMQ: O(n log n) build, two lookups per row —
    handles variable-width (RANGE) and FOLLOWING frames that a rolling
    deque cannot."""
    n = vals.size
    length = hi - lo + 1
    max_len = int(length.max()) if len(lo) else 1
    # levels above floor(log2(max window width)) are never queried —
    # capping keeps memory O(n log w), not O(n log n) (a 2M-row bucket
    # with a 16-row frame builds 5 levels, not 21)
    tables = [vals]
    j = 1
    while (1 << j) <= n and (1 << j) <= max_len:
        prev, w = tables[-1], 1 << (j - 1)
        m = n - (1 << j) + 1
        tables.append(np.minimum(prev[:m], prev[w : w + m]))
        j += 1
    lev = np.zeros(len(lo), dtype=np.int64)
    if len(lo):
        lev = np.floor(np.log2(length.astype(np.float64))).astype(np.int64)
        # float log2 can round 2^k up at the boundary; clamp exactly
        np.clip(lev, 0, len(tables) - 1, out=lev)
        too_big = (np.int64(1) << lev) > length
        lev[too_big] -= 1
    out = np.empty(len(lo), dtype=vals.dtype)
    for L in np.unique(lev):
        t = tables[int(L)]
        m = lev == L
        out[m] = np.minimum(t[lo[m]], t[hi[m] - (np.int64(1) << L) + 1])
    return out


def _trailing_range_start(ovi: np.ndarray, newg: np.ndarray, K: int) -> np.ndarray:
    """Per-row first index j in the SAME partition with ov[j] >= ov[i]-K
    (rows lexsorted by (partition, ov)).  One global searchsorted: each
    group's values are shifted so consecutive groups sit > K apart, so
    the probe can never cross a partition fence.  Falls back to a
    per-group loop if the shifted key would overflow int64."""
    n = ovi.size
    gs = np.flatnonzero(newg)
    psz = np.diff(np.append(gs, n))
    ge = gs + psz - 1
    gmin, gmax = ovi[gs], ovi[ge]
    shift = np.zeros(len(gs), dtype=np.int64)
    if len(gs) > 1:
        deltas = gmax[:-1].astype(np.float64) - gmin[1:] + (K + 1)
        bound = np.abs(np.cumsum(deltas)).max() + max(abs(float(gmin.min())), abs(float(gmax.max()))) + K
        if bound < float(2**62):
            with np.errstate(over="ignore"):
                shift[1:] = np.cumsum(gmax[:-1] - gmin[1:] + np.int64(K + 1))
        else:  # pathological spread: exact but per-group
            fs = np.empty(n, dtype=np.int64)
            for s, e in zip(gs, gs + psz):
                fs[s:e] = s + np.searchsorted(ovi[s:e], ovi[s:e] - K, side="left")
            return fs
    adj = ovi + np.repeat(shift, psz)
    return np.searchsorted(adj, adj - K, side="left")


class _WindowBucket:
    """pyarrow map_groups callable: one co-partitioned bucket."""

    def __init__(self, part_col, order_col, tiebreak, sum_col, running_name,
                 gap_name, gap_default, keep, seq_name=None, dense_rank_name=None,
                 lead_col=None, lead_name="next_value", ntile_n=None,
                 ntile_name="ntile", rank_name=None, pct_rank_name=None,
                 cume_name=None, first_col=None, first_name="first_value",
                 frame_k=None, frame_sum_col=None, frame_sum_name="trailing_sum",
                 frame_avg_name=None, frame_min_col=None,
                 frame_min_name="trailing_min", frame_j=0,
                 range_k=None, range_sum_col=None, range_sum_name="range_sum",
                 range_avg_name=None, range_count_name=None,
                 range_min_col=None, range_min_name="range_min",
                 last_col=None, last_name="last_value",
                 nth_col=None, nth_k=2, nth_name="nth_value"):
        self._part, self._order, self._tb = part_col, order_col, tiebreak
        self._sum_col, self._running_name = sum_col, running_name
        self._gap_name, self._gap_default = gap_name, gap_default
        self._keep = keep
        self._seq_name, self._dense_rank_name = seq_name, dense_rank_name
        self._lead_col, self._lead_name = lead_col, lead_name
        self._ntile_n, self._ntile_name = ntile_n, ntile_name
        self._rank_name, self._pct_rank_name = rank_name, pct_rank_name
        self._cume_name = cume_name
        self._first_col, self._first_name = first_col, first_name
        self._frame_k = frame_k
        self._frame_sum_col, self._frame_sum_name = frame_sum_col, frame_sum_name
        self._frame_avg_name = frame_avg_name
        self._frame_min_col, self._frame_min_name = frame_min_col, frame_min_name
        self._frame_j = int(frame_j or 0)
        self._range_k = range_k
        self._range_sum_col, self._range_sum_name = range_sum_col, range_sum_name
        self._range_avg_name, self._range_count_name = range_avg_name, range_count_name
        self._range_min_col, self._range_min_name = range_min_col, range_min_name
        self._last_col, self._last_name = last_col, last_name
        self._nth_col, self._nth_k, self._nth_name = nth_col, int(nth_k), nth_name

    def __call__(self, table: pa.Table) -> pa.Table:
        import pandas as pd

        n = table.num_rows
        p, _ = pd.factorize(table[self._part].to_numpy(zero_copy_only=False))
        o = _as_sortable_i64(table[self._order].to_numpy(zero_copy_only=False))
        t = table[self._tb].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, o, p))
        ps = p[order]
        idx = np.arange(n, dtype=np.int64)
        newg = np.empty(n, dtype=bool)
        if n:
            newg[0] = True
            newg[1:] = ps[1:] != ps[:-1]
        out: dict = {}
        for src in self._keep:
            out[src] = table[src].take(pa.array(order))
        # shared fences, derived once per bucket call:
        #   gstart — each row's partition-start index;
        #   newval — peer-group boundaries (equal ORDER values are
        #     peers; the tiebreak only stabilizes physical order);
        #   npart  — each row's partition size
        gstart = np.maximum.accumulate(np.where(newg, idx, 0))
        ov = o[order]
        newval = None
        if (self._dense_rank_name is not None or self._rank_name
                or self._pct_rank_name or self._cume_name):
            newval = newg.copy()
            if n > 1:
                newval[1:] |= ov[1:] != ov[:-1]
        npart = None
        if self._pct_rank_name or self._cume_name or self._ntile_n is not None:
            psizes = np.diff(np.append(np.flatnonzero(newg), n))
            npart = np.repeat(psizes, psizes)
        if self._seq_name is not None:
            # ROW_NUMBER(): 1-based position within the partition
            out[self._seq_name] = pa.array(idx - gstart + 1)
        if self._dense_rank_name is not None:
            # DENSE_RANK() on the order column within the partition
            d = np.cumsum(newval.astype(np.int64))
            out[self._dense_rank_name] = pa.array(d - d[gstart] + 1)
        if self._gap_name is not None:
            ovi = ov.astype(np.int64)
            gap = np.empty(n, dtype=np.int64)
            if n:
                gap[0] = self._gap_default
                gap[1:] = ovi[1:] - ovi[:-1]
                gap[newg] = self._gap_default
            out[self._gap_name] = pa.array(gap)
        if n and (self._rank_name or self._pct_rank_name or self._cume_name):
            vstart = np.maximum.accumulate(np.where(newval, idx, 0))
            rank = vstart - gstart + 1
            if self._rank_name:
                out[self._rank_name] = pa.array(rank.astype(np.int64))
            if self._pct_rank_name:
                # (rank-1)/(n-1); defined 0 for single-row partitions
                pr = np.where(npart > 1,
                              (rank - 1) / np.maximum(npart - 1, 1), 0.0)
                out[self._pct_rank_name] = pa.array(pr.astype(np.float64))
            if self._cume_name:
                # rows through the END of the peer group, over n_part
                vs = np.flatnonzero(newval)
                vend = np.repeat(np.append(vs[1:], n), np.diff(np.append(vs, n)))
                out[self._cume_name] = pa.array((vend - gstart) / npart)
        if self._first_col is not None and n:
            # FIRST_VALUE at the partition's first (order, tiebreak) row
            colv = table[self._first_col].take(pa.array(order))
            if isinstance(colv, pa.ChunkedArray):
                colv = colv.combine_chunks()
            out[self._first_name] = colv.take(pa.array(gstart))
        if (self._last_col is not None or self._nth_col is not None) and n:
            # LAST_VALUE / NTH_VALUE over the FULL partition frame (ROWS
            # BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) — the
            # deterministic form: the default RANGE frame's last_value is
            # tie-order-dependent, so we pin the frame and order by
            # (order, tiebreak) like FIRST_VALUE
            import pyarrow.compute as pc

            if npart is None:
                psizes = np.diff(np.append(np.flatnonzero(newg), n))
                npart = np.repeat(psizes, psizes)
            gend = gstart + npart - 1
            if self._last_col is not None:
                colv = table[self._last_col].take(pa.array(order))
                if isinstance(colv, pa.ChunkedArray):
                    colv = colv.combine_chunks()
                out[self._last_name] = colv.take(pa.array(gend))
            if self._nth_col is not None:
                # 1-based from the partition start; typed NULL when the
                # partition has fewer than nth_k rows (SQL semantics)
                colv = table[self._nth_col].take(pa.array(order))
                if isinstance(colv, pa.ChunkedArray):
                    colv = colv.combine_chunks()
                pos = gstart + self._nth_k - 1
                valid = pos <= gend
                vals = colv.take(pa.array(np.where(valid, pos, gstart)))
                out[self._nth_name] = pc.if_else(
                    pa.array(valid), vals, pa.scalar(None, type=colv.type))
        if self._lead_col is not None and n:
            # LEAD(col): next ordered row's value within the partition,
            # typed NULL on each partition's last row (SQL semantics)
            import pyarrow.compute as pc

            colv = table[self._lead_col].take(pa.array(order))
            if isinstance(colv, pa.ChunkedArray):
                colv = colv.combine_chunks()
            last = np.empty(n, dtype=bool)
            last[-1] = True
            last[:-1] = newg[1:]
            nxt = np.where(last, 0, np.arange(1, n + 1, dtype=np.int64))
            vals = colv.take(pa.array(nxt))
            out[self._lead_name] = pc.if_else(
                pa.array(~last), vals, pa.scalar(None, type=colv.type))
        if self._ntile_n is not None and n:
            # NTILE(k): first (n_part % k) buckets get ceil(n_part/k)
            # rows, the rest floor(n_part/k) — the SQL-standard split
            k = int(self._ntile_n)
            i0 = idx - gstart
            q, r = npart // k, npart % k
            thresh = r * (q + 1)
            small = np.maximum(q, 1)  # parts with n<k: q=0, each row its own tile
            tile = np.where(
                i0 < thresh,
                i0 // np.maximum(q + 1, 1) + 1,
                r + (i0 - thresh) // small + 1,
            )
            out[self._ntile_name] = pa.array(tile.astype(np.int64))
        if self._sum_col is not None:
            v = table[self._sum_col].to_numpy(zero_copy_only=False)
            if v.dtype.kind not in "iu":
                raise TypeError(
                    f"window_over running sum needs an integer column, got {v.dtype} "
                    f"for {self._sum_col!r} (convert to integer cents/counts first)"
                )
            vs = v[order].astype(np.int64)
            c = np.cumsum(vs)
            base = c[gstart] - vs[gstart]
            out[self._running_name] = pa.array(c - base)
        if self._frame_k is not None and n:
            # bounded frame ROWS BETWEEN k PRECEDING AND j FOLLOWING
            # (j=0 = CURRENT ROW): per-row frame [fs, fe] clipped at the
            # partition fences; the sum is a global-cumsum difference
            # (cross-partition terms cancel because fs >= gstart), so the
            # whole frame family stays one vectorized pass — no per-row
            # loop
            k = int(self._frame_k)
            fs = np.maximum(idx - k, gstart)
            if self._frame_j:
                if npart is None:
                    psizes = np.diff(np.append(np.flatnonzero(newg), n))
                    npart = np.repeat(psizes, psizes)
                fe = np.minimum(idx + self._frame_j, gstart + npart - 1)
            else:
                fe = idx
            cnt = fe - fs + 1
            if self._frame_sum_col is not None:
                fv = table[self._frame_sum_col].to_numpy(zero_copy_only=False)
                if fv.dtype.kind not in "iu":
                    raise TypeError(
                        f"window_over frame sum needs an integer column, got "
                        f"{fv.dtype} for {self._frame_sum_col!r} (convert to "
                        f"integer cents/counts first)"
                    )
                fvs = fv[order].astype(np.int64)
                fc = np.cumsum(fvs)
                tsum = fc[fe] - np.where(fs > 0, fc[fs - 1], 0)
                out[self._frame_sum_name] = pa.array(tsum)
                if self._frame_avg_name is not None:
                    # int64 / int64 in float64 — bit-identical to any SQL
                    # engine doing AVG over the same exact-int frame sum
                    out[self._frame_avg_name] = pa.array(
                        tsum.astype(np.float64) / cnt.astype(np.float64))
            if self._frame_min_col is not None:
                mv = table[self._frame_min_col].to_numpy(zero_copy_only=False)[order]
                if self._frame_j:
                    mn = _window_min(mv, fs, fe)
                else:
                    import pandas as pd

                    # trailing-only: pandas C rolling-min (monotonic
                    # deque, O(n)); groups are contiguous post-lexsort so
                    # sort=False keeps row order
                    mn = (
                        pd.Series(mv)
                        .groupby(ps, sort=False)
                        .rolling(k + 1, min_periods=1)
                        .min()
                        .to_numpy()
                    )
                if mv.dtype.kind in "iu":
                    out[self._frame_min_name] = pa.array(mn.astype(np.int64))
                else:
                    out[self._frame_min_name] = pa.array(mn.astype(np.float64))
        if self._range_k is not None and n:
            # RANGE BETWEEN range_k PRECEDING AND CURRENT ROW over the
            # ORDER value itself (time-based trailing windows: "spend in
            # the last hour").  SQL RANGE semantics: the lower bound
            # admits every same-partition row with ov >= ov[i]-range_k;
            # the CURRENT ROW upper bound includes all PEERS (rows with
            # the current row's exact order value)
            fs = _trailing_range_start(ov.astype(np.int64), newg, int(self._range_k))
            nv = newg.copy()
            if n > 1:
                nv[1:] |= ov[1:] != ov[:-1]
            vs = np.flatnonzero(nv)
            fe = np.repeat(np.append(vs[1:], n) - 1, np.diff(np.append(vs, n)))
            cnt = fe - fs + 1
            if self._range_count_name:
                out[self._range_count_name] = pa.array(cnt.astype(np.int64))
            if self._range_sum_col is not None:
                rv = table[self._range_sum_col].to_numpy(zero_copy_only=False)
                if rv.dtype.kind not in "iu":
                    raise TypeError(
                        f"window_over range sum needs an integer column, got "
                        f"{rv.dtype} for {self._range_sum_col!r} (convert to "
                        f"integer cents/counts first)"
                    )
                rvs = rv[order].astype(np.int64)
                rc = np.cumsum(rvs)
                rsum = rc[fe] - np.where(fs > 0, rc[fs - 1], 0)
                out[self._range_sum_name] = pa.array(rsum)
                if self._range_avg_name is not None:
                    out[self._range_avg_name] = pa.array(
                        rsum.astype(np.float64) / cnt.astype(np.float64))
            if self._range_min_col is not None:
                mv = table[self._range_min_col].to_numpy(zero_copy_only=False)[order]
                mn = _window_min(mv, fs, fe)
                if mv.dtype.kind in "iu":
                    out[self._range_min_name] = pa.array(mn.astype(np.int64))
                else:
                    out[self._range_min_name] = pa.array(mn.astype(np.float64))
        return pa.table(out)


def window_over(ds, *, part_col: str, order_col: str, tiebreak: str,
                sum_col: str | None = None, running_name: str = "running_sum",
                gap_name: str | None = "gap", gap_default: int = -1,
                seq_name: str | None = None, dense_rank_name: str | None = None,
                lead_col: str | None = None, lead_name: str = "next_value",
                ntile_n: int | None = None, ntile_name: str = "ntile",
                rank_name: str | None = None, pct_rank_name: str | None = None,
                cume_name: str | None = None, first_col: str | None = None,
                first_name: str = "first_value",
                frame_k: int | None = None, frame_sum_col: str | None = None,
                frame_sum_name: str = "trailing_sum",
                frame_avg_name: str | None = None,
                frame_min_col: str | None = None,
                frame_min_name: str = "trailing_min", frame_j: int = 0,
                range_k: int | None = None, range_sum_col: str | None = None,
                range_sum_name: str = "range_sum",
                range_avg_name: str | None = None,
                range_count_name: str | None = None,
                range_min_col: str | None = None,
                range_min_name: str = "range_min",
                last_col: str | None = None, last_name: str = "last_value",
                nth_col: str | None = None, nth_k: int = 2,
                nth_name: str = "nth_value",
                keep: list | None = None, num_buckets: int = 64):
    """Per-partition ordered window columns over a Dataset.

    Emits, per row (ordered by ``order_col`` then ``tiebreak`` within
    each ``part_col`` partition):

    * ``gap_name``: this row's order value minus the previous row's
      (int64 — timestamps diff in their storage unit, e.g. µs);
      ``gap_default`` for each partition's first row (a sentinel, not
      null, so cross-engine hashes stay unambiguous);
    * ``running_name``: running sum of integer ``sum_col`` including
      the current row (``ROWS UNBOUNDED PRECEDING`` semantics);
    * ``lead_name`` (when ``lead_col`` given): LEAD(lead_col) — the
      next ordered row's value, typed NULL at each partition's end;
    * ``ntile_name`` (when ``ntile_n`` given): NTILE(ntile_n) — the
      SQL-standard positional split (first n%k tiles one row larger);
    * ``rank_name`` / ``pct_rank_name`` / ``cume_name``: RANK /
      PERCENT_RANK / CUME_DIST with TRUE PEER semantics — rows with
      equal ``order_col`` values are peers regardless of tiebreak
      (matching ``OVER (ORDER BY order_col)`` alone);
    * ``first_name`` (when ``first_col`` given): FIRST_VALUE(first_col)
      at the partition's first (order, tiebreak) row — deterministic;
    * ``last_name`` / ``nth_name`` (when ``last_col`` / ``nth_col``
      given): LAST_VALUE / NTH_VALUE(col, nth_k) over the FULL
      partition frame (``ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
      FOLLOWING``) — the deterministic form (the SQL-default RANGE
      frame's last_value depends on tie order); nth is 1-based from the
      partition start, typed NULL when the partition is shorter;
    * bounded-frame aggregates (when ``frame_k`` given): ``ROWS BETWEEN
      frame_k PRECEDING AND frame_j FOLLOWING`` (``frame_j=0`` =
      CURRENT ROW) over the same (order, tiebreak) physical order —
      ``frame_sum_name`` (exact int64 moving sum of integer
      ``frame_sum_col``), optional ``frame_avg_name`` (float64
      sum/count, bit-exact vs SQL AVG of the same ints), and
      ``frame_min_name`` (moving min of ``frame_min_col``; O(n) deque
      when trailing-only, sparse-table RMQ with a FOLLOWING bound);
    * value-range trailing aggregates (when ``range_k`` given): ``RANGE
      BETWEEN range_k PRECEDING AND CURRENT ROW`` over the ORDER value
      itself (time windows: order by a µs timestamp, ``range_k`` =
      3_600_000_000 for "the trailing hour"), SQL peer semantics at the
      upper bound — ``range_sum_name`` / ``range_avg_name`` /
      ``range_count_name`` / ``range_min_name``.

    ``keep``: passthrough columns (default: part, tiebreak).  Output row
    SET is partition-independent; row order follows bucket scheduling.
    """
    from ..hashing import hash128_keyed

    import pyarrow.compute as pc

    if keep is None:
        keep = [part_col, tiebreak]
    nb = np.uint64(num_buckets)

    def _bucket(batch: pa.Table) -> pa.Table:
        h1, _ = hash128_keyed(pc.cast(batch[part_col], pa.string()), 31)
        return batch.append_column("__bucket", pa.array((h1 % nb).astype(np.int64)))

    fn = _WindowBucket(part_col, order_col, tiebreak, sum_col, running_name,
                       gap_name, gap_default, keep, seq_name, dense_rank_name,
                       lead_col, lead_name, ntile_n, ntile_name,
                       rank_name, pct_rank_name, cume_name, first_col, first_name,
                       frame_k, frame_sum_col, frame_sum_name,
                       frame_avg_name, frame_min_col, frame_min_name, frame_j,
                       range_k, range_sum_col, range_sum_name,
                       range_avg_name, range_count_name,
                       range_min_col, range_min_name,
                       last_col, last_name, nth_col, nth_k, nth_name)
    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda t: fn(t), batch_format="pyarrow")
    )
