"""EXACT distributed quantiles — two-histogram-pass selection.

The sketch kernels (t-digest, KLL) answer quantiles approximately in one
pass; this operator answers them EXACTLY with two cheap passes and no
global sort (a `ds.sort()` is an all-to-all over the full table; this
never shuffles row data at all):

  pass 0  min/max (native Ray aggregate, column-pruned),
  pass 1  per-batch equi-width histogram (one `bins`-long uint64 blob
          per block, reduced with shuffle-free bundled combines like
          stages/merge.py),
  pass 2  gather ONLY the values living in the <=len(qs) bins that
          contain the target ranks (expected n/bins rows per bin) and
          select the exact order statistic inside each with
          `np.partition`.

Quantile definition matches DuckDB's ``quantile_disc``: the value at
0-based index ``max(ceil(q*n) - 1, 0)`` of the sorted column — so the
result is bit-identical to the SQL oracle (it IS an element of the
column, not an interpolation).

Scale note: pass-2 volume is ~n * len(qs) / bins rows; pathological skew
(one value repeated >> n/bins times) degrades the gather toward that
value's multiplicity — still correct, documented.  NaNs are excluded
(SQL NULL semantics).  The input dataset is consumed three times, so
pass a re-readable source (a parquet read) or a materialized dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _hist_stage(col: str, lo: float, hi: float, bins: int):
    scale = bins / (hi - lo)

    def _hist(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(((v - lo) * scale).astype(np.int64), 0, bins - 1)
        h = np.bincount(idx, minlength=bins).astype(np.uint64)
        return pa.table({"hist": pa.array([h.tobytes()], pa.large_binary())})

    return _hist


def _sum_hists(df: pd.DataFrame) -> pd.DataFrame:
    total = None
    for blob in df["hist"]:
        h = np.frombuffer(blob, dtype=np.uint64)
        total = h.copy() if total is None else total + h
    return pd.DataFrame({"hist": [total.tobytes()]})


def _order_statistics(ds, col: str, ranks_from_n, *, bins: int):
    """Shared engine of the two-histogram-pass selection: min/max pass,
    histogram reduce, then gather ONLY the bins holding the requested
    0-based ranks and select each exact order statistic in place.

    ``ranks_from_n``: callable ``n -> iterable of 0-based ranks`` (n =
    non-NaN row count).  Returns ``(n, lo, stats)`` where ``stats`` maps
    each requested rank to its exact value — or ``(0, lo, None)`` for
    the degenerate cases (empty/all-NaN input: lo is NaN; constant
    column: lo is the constant)."""
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(col), Max(col))
    mn = None if agg is None else agg.get(f"min({col})")
    if mn is None:
        # zero rows / all-NULL column: Ray's Min/Max return None — same
        # degenerate answer as all-NaN input (SQL: quantile of nothing
        # is NULL), not a float(None) crash
        return 0, float("nan"), None
    lo, hi = float(mn), float(agg[f"max({col})"])
    if not np.isfinite(lo) or lo == hi:
        return 0, lo, None

    partials = ds.map_batches(_hist_stage(col, lo, hi, bins), batch_format="pyarrow")
    for _ in range(2):  # shuffle-free bundled reduction (cf. merge.py)
        partials = partials.map_batches(_sum_hists, batch_format="pandas", batch_size=64)
    hist = None
    for batch in partials.iter_batches(batch_size=64, batch_format="pandas"):
        part = _sum_hists(batch)
        h = np.frombuffer(part["hist"].iloc[0], dtype=np.uint64)
        hist = h.copy() if hist is None else hist + h
    n = int(hist.sum())
    if n == 0:
        return 0, float("nan"), None

    cum = np.cumsum(hist)
    ranks = np.unique(np.asarray(list(ranks_from_n(n)), dtype=np.int64))
    target_bins = np.searchsorted(cum, ranks, side="right")
    offsets = ranks - np.concatenate([[0], cum])[target_bins]
    needed = np.unique(target_bins)

    scale = bins / (hi - lo)

    def _gather(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(((v - lo) * scale).astype(np.int64), 0, bins - 1)
        keep = np.isin(idx, needed)
        return pa.table({"v": pa.array(v[keep]), "b": pa.array(idx[keep])})

    by_bin: dict[int, list[np.ndarray]] = {int(b): [] for b in needed}
    for batch in ds.map_batches(_gather, batch_format="pyarrow").iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        v = batch["v"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        for bb in np.unique(b):
            by_bin[int(bb)].append(v[b == bb])
    stats = {}
    for j, r in enumerate(ranks):
        arr = np.concatenate(by_bin[int(target_bins[j])])
        k = int(offsets[j])
        stats[int(r)] = float(np.partition(arr, k)[k])
    return n, lo, stats


def _disc_rank(q: float, n: int) -> int:
    """0-based quantile_disc rank: max(ceil(q*n) - 1, 0), clamped."""
    return min(max(int(np.ceil(q * n)) - 1, 0), n - 1)


def exact_quantiles(ds, col: str, qs, *, bins: int = 1 << 16) -> pd.DataFrame:
    """DataFrame[q, value_exact] with the exact quantile_disc values."""
    qs = list(qs)
    n, lo, stats = _order_statistics(
        ds, col, lambda n: (_disc_rank(q, n) for q in qs), bins=bins)
    if stats is None:
        return pd.DataFrame({"q": qs, "value_exact": [lo] * len(qs)})
    return pd.DataFrame(
        {"q": qs, "value_exact": [stats[_disc_rank(q, n)] for q in qs]})


def exact_quantiles_cont(ds, col: str, qs, *, bins: int = 1 << 16) -> pd.DataFrame:
    """DataFrame[q, value_cont]: exact INTERPOLATED quantiles
    (``percentile_cont`` / DuckDB ``quantile_cont``).

    Same two-histogram-pass selection as :func:`exact_quantiles`, but
    each q needs the TWO bracketing order statistics at 0-based ranks
    floor(h) and ceil(h) of h = q·(n−1), interpolated as
    ``lower·(ceil(h)−h) + upper·(h−floor(h))`` — the formula DuckDB's
    quantile_cont uses (verified bit-identical empirically; the
    algebraically-equal ``lower + frac·(upper−lower)`` form is NOT
    always bit-identical in float64).  Pass-2 volume is still
    ~n·|ranks|/bins rows; NaNs excluded (SQL NULL semantics)."""
    qs = list(qs)

    def _ranks(n):
        rn = np.array([q * (n - 1) for q in qs], dtype=np.float64)
        return np.concatenate([np.floor(rn), np.ceil(rn)]).astype(np.int64)

    n, lo, stats = _order_statistics(ds, col, _ranks, bins=bins)
    if stats is None:
        return pd.DataFrame({"q": qs, "value_cont": [lo] * len(qs)})
    vals = []
    for q in qs:
        h = q * (n - 1)
        f, c = int(np.floor(h)), int(np.ceil(h))
        vals.append(stats[f] if f == c else stats[f] * (c - h) + stats[c] * (h - f))
    return pd.DataFrame({"q": qs, "value_cont": vals})


# ---------------------------------------------------------------------------
# grouped variant
# ---------------------------------------------------------------------------

def exact_quantiles_grouped(ds, col: str, group_col: str, qs, *, bins: int = 1 << 14,
                            max_groups: int = 10_000, mode: str = "disc") -> pd.DataFrame:
    """DataFrame[group, q, value_exact|value_cont]: exact per-group
    quantiles — ``mode="disc"`` (quantile_disc, an element of the
    column) or ``mode="cont"`` (percentile_cont, interpolated with the
    same DuckDB-bit-identical formula as :func:`exact_quantiles_cont`).

    Same two-histogram-pass selection as :func:`exact_quantiles`, with
    one histogram blob per (block, group).  Designed for LOW-cardinality
    group columns (per-group stats: event types, languages, shards) —
    the driver holds G x bins counters; ``max_groups`` guards the
    driver-side range scan against an accidental high-cardinality group
    column (G in the millions belongs in a sketch — t-digest/KLL per
    group — not here).
    """
    if mode not in ("disc", "cont"):
        raise ValueError(f"mode must be disc|cont, got {mode!r}")
    from ray.data.aggregate import Max, Min

    qs = list(qs)
    ranges = {}
    for row in ds.groupby(group_col).aggregate(Min(col), Max(col)).iter_rows():
        ranges[row[group_col]] = (float(row[f"min({col})"]), float(row[f"max({col})"]))
        if len(ranges) > max_groups:
            raise ValueError(
                f"exact_quantiles_grouped: >{max_groups} distinct {group_col!r} groups; "
                "use grouped_tdigest/grouped_kll for high-cardinality group columns"
            )
    groups = sorted(ranges)
    g_lo = {g: ranges[g][0] for g in groups}
    g_hi = {g: ranges[g][1] for g in groups}

    def _hists(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_numpy(zero_copy_only=False),
                "v": batch[col].to_numpy(zero_copy_only=False).astype(np.float64),
            }
        ).dropna()
        out_g, out_h = [], []
        for g, sub in df.groupby("g", sort=False):
            lo, hi = g_lo[g], g_hi[g]
            v = sub["v"].to_numpy()
            if hi == lo:
                h = np.zeros(bins, np.uint64)
                h[0] = len(v)
            else:
                idx = np.clip(((v - lo) * (bins / (hi - lo))).astype(np.int64), 0, bins - 1)
                h = np.bincount(idx, minlength=bins).astype(np.uint64)
            out_g.append(g)
            out_h.append(h.tobytes())
        return pa.table({"g": pa.array(out_g), "hist": pa.array(out_h, pa.large_binary())})

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        rows_g, rows_h = [], []
        for g, sub in df.groupby("g", sort=False):
            total = None
            for blob in sub["hist"]:
                h = np.frombuffer(blob, dtype=np.uint64)
                total = h.copy() if total is None else total + h
            rows_g.append(g)
            rows_h.append(total.tobytes())
        return pd.DataFrame({"g": rows_g, "hist": rows_h})

    partials = ds.map_batches(_hists, batch_format="pyarrow")
    for _ in range(2):
        partials = partials.map_batches(_combine, batch_format="pandas", batch_size=64)
    hists: dict = {}
    for batch in partials.iter_batches(batch_size=64, batch_format="pandas"):
        part = _combine(batch)
        for g, blob in zip(part["g"], part["hist"]):
            h = np.frombuffer(blob, dtype=np.uint64)
            hists[g] = h.copy() if g not in hists else hists[g] + h

    # per-group target bins + in-bin offsets
    needed: dict = {}
    plan: dict = {}
    for g in groups:
        hist = hists[g]
        n = int(hist.sum())
        cum = np.cumsum(hist)
        if mode == "disc":
            ranks = np.minimum([max(int(np.ceil(q * n)) - 1, 0) for q in qs], n - 1)
        else:  # both bracketing order statistics of h = q*(n-1) per q
            rn = np.array([q * (n - 1) for q in qs], dtype=np.float64)
            ranks = np.unique(np.concatenate([np.floor(rn), np.ceil(rn)]).astype(np.int64))
        tbins = np.searchsorted(cum, ranks, side="right")
        offs = ranks - np.concatenate([[0], cum])[tbins]
        plan[g] = (n, ranks, tbins, offs)
        needed[g] = set(int(b) for b in tbins)

    def _gather(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_numpy(zero_copy_only=False),
                "v": batch[col].to_numpy(zero_copy_only=False).astype(np.float64),
            }
        ).dropna()
        out = []
        for g, sub in df.groupby("g", sort=False):
            lo, hi = g_lo[g], g_hi[g]
            v = sub["v"].to_numpy()
            if hi == lo:
                idx = np.zeros(len(v), np.int64)
            else:
                idx = np.clip(((v - lo) * (bins / (hi - lo))).astype(np.int64), 0, bins - 1)
            keep = np.isin(idx, list(needed[g]))
            out.append(pd.DataFrame({"g": g, "v": v[keep], "b": idx[keep]}))
        res = pd.concat(out, ignore_index=True) if out else None
        if res is None or not len(res):
            return  # generator UDF: no survivors in this batch, emit no block
        yield pa.Table.from_pandas(res, preserve_index=False).replace_schema_metadata(None)

    by_gb: dict = {}
    for batch in ds.map_batches(_gather, batch_format="pyarrow").iter_batches(
        batch_size=65536, batch_format="pandas"
    ):
        for (g, b), sub in batch.groupby(["g", "b"], sort=False):
            by_gb.setdefault((g, int(b)), []).append(sub["v"].to_numpy())

    out_name = "value_exact" if mode == "disc" else "value_cont"
    rows = []
    for g in groups:
        n, ranks, tbins, offs = plan[g]
        stat = {}
        for r, tb, off in zip(ranks, tbins, offs):
            arr = np.concatenate(by_gb[(g, int(tb))])
            k = int(off)
            stat[int(r)] = float(np.partition(arr, k)[k])
        for j, q in enumerate(qs):
            if mode == "disc":
                val = stat[int(ranks[j])]
            else:
                h = q * (n - 1)
                f, c = int(np.floor(h)), int(np.ceil(h))
                val = stat[f] if f == c else stat[f] * (c - h) + stat[c] * (h - f)
            rows.append({group_col: g, "q": q, out_name: val})
    return pd.DataFrame(rows)


def quantile_bin(ds, col: str, *, nbins: int, id_col: str,
                 bin_col: str = "bin", bins: int = 1 << 16):
    """Equal-frequency binning (feature bucketing): assign every row
    the 1-based index of its quantile bin — ``1 + #cuts strictly below
    value`` where the cuts are the exact ``quantile_disc(j/nbins)``
    values (j = 1..nbins-1).  Rows with NULL ``col`` are dropped.

    Two histogram passes compute the cuts (see
    :func:`exact_quantiles`), the nbins-1 cut values broadcast in the
    task closure, and the assignment is one vectorized searchsorted
    per batch — three streaming scans total, nothing materialized.
    Ties equal to a cut stay in the lower bin, matching the SQL twin's
    ``1 + Σ (value > cut_j)``.
    """
    if nbins < 2:
        raise ValueError("quantile_bin: nbins must be >= 2")
    qs = [j / nbins for j in range(1, nbins)]
    cuts = np.asarray(exact_quantiles(ds, col, qs, bins=bins)
                      ["value_exact"].to_numpy(), np.float64)

    def _assign(batch: pa.Table) -> pa.Table:
        t = batch
        if t[col].null_count:
            t = t.filter(pc.is_valid(t[col]))
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(cuts, v, side="left") + 1
        return pa.table({id_col: t[id_col],
                         bin_col: pa.array(b.astype(np.int64))})

    return ds.map_batches(_assign, batch_format="pyarrow",
                          batch_size=None)
