"""Fixed-width histogram and grouped mode — map-side-combined frequency
reduces.

Both are one-pass operators whose shuffle moves only tiny pre-aggregated
partials (the classic combiner shape this engine uses everywhere —
SURVEY.md §4.2): a batch of B rows collapses to ≤ n_bins (histogram) or
≤ distinct (group, value) pairs (mode) partial rows before anything
crosses the wire.  No reference counterpart (SURVEY.md §2.6 engine
side); the exact histogram complements the engine's approximate
distributions (t-digest / KLL / moments) the way the exact set ops
complement Bloom/HLL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import bucketed_groupby


def fixed_width_histogram(ds, *, col: str, lo: float, hi: float, n_bins: int,
                          sum_col: str | None = None, num_buckets: int = 4):
    """Histogram of ``col`` over ``[lo, hi)`` in ``n_bins`` equal bins.

    Emits one row per non-empty bin: ``bin`` (0-based), ``n`` (count),
    and ``sum_{sum_col}`` when given (integer column — convert money to
    cents first).  Rows outside [lo, hi) are dropped (SQL-twin: WHERE
    filter).  Binning is ``floor((x - lo) / width)`` in float64 — the
    exact expression a SQL engine evaluates, so bin assignment is
    bit-identical cross-engine.
    """
    width = (hi - lo) / n_bins
    sum_name = f"sum_{sum_col}" if sum_col else None

    def _partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = (x >= lo) & (x < hi)
        # width can round DOWN in float64, letting a value just below hi
        # floor to n_bins — clamp to the last bin (SQL twin must LEAST()
        # the same way to stay bit-identical on non-exact widths).
        bins = np.minimum(np.floor((x[keep] - lo) / width).astype(np.int64),
                          n_bins - 1)
        out = {"bin": np.arange(n_bins, dtype=np.int64),
               "n": np.bincount(bins, minlength=n_bins).astype(np.int64)}
        if sum_col:
            sv = batch[sum_col].to_numpy(zero_copy_only=False)
            if sv.dtype.kind not in "iu":
                raise TypeError(f"histogram sum_col needs an integer column, got {sv.dtype}")
            # exact int accumulation (np.add.at), not float64 bincount
            # weights — partial sums above 2^53 must not lose bits
            acc = np.zeros(n_bins, dtype=np.int64)
            np.add.at(acc, bins, sv[keep].astype(np.int64))
            out[sum_name] = acc
        t = pa.table(out)
        return t.filter(pa.array(out["n"] > 0))

    metric = ["n"] + ([sum_name] if sum_col else [])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bin", sort=False, as_index=False)[metric].sum()
        for c in metric:
            g[c] = g[c].astype(np.int64)
        return g

    return bucketed_groupby(ds.map_batches(_partial, batch_format="pyarrow"),
                            ["bin"], _reduce, num_buckets=num_buckets)


def grouped_mode(ds, *, group_col: str, value_col: str, num_buckets: int = 32):
    """Per-group MODE with deterministic tie-break (max count, then min
    value) — SQL-twinnable unlike engine-defined ``mode()``.

    Map-side: each batch collapses to its distinct (group, value) pair
    counts (two factorizes + one bincount).  One bucket shuffle on the
    GROUP key (complete groups per bucket), then a vectorized
    sort-and-take-first per bucket.  Emits (group, value, n) per group.
    """
    def _partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        gc, gu = pd.factorize(g)
        vc, vu = pd.factorize(v)
        pair = gc.astype(np.int64) * len(vu) + vc
        # unique-with-counts, not a dense bincount: the (group x value)
        # cross space can vastly exceed the batch size
        upair, cnt = np.unique(pair, return_counts=True)
        return pa.table({
            group_col: pa.array(gu[upair // len(vu)]),
            value_col: pa.array(vu[upair % len(vu)]),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        s = (df.groupby([group_col, value_col], sort=False, as_index=False)["n"].sum()
               .sort_values([group_col, "n", value_col],
                            ascending=[True, False, True], kind="stable"))
        out = s.drop_duplicates(subset=[group_col], keep="first").reset_index(drop=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_groupby(ds.map_batches(_partial, batch_format="pyarrow"),
                            [group_col], _reduce, num_buckets=num_buckets)


def equi_depth_histogram(ds, *, col: str, n_buckets: int, bins: int = 1 << 16):
    """Equi-depth (quantile-boundary) histogram — the planner-statistics
    staple: bucket i spans (cut_{i-1}, cut_i] where cut_i is the EXACT
    quantile_disc(i/n_buckets) order statistic, so buckets hold ~equal
    row counts even under arbitrary skew.

    Two phases, both distributed: boundary selection via the exact
    two-histogram-pass machinery (stages/quantiles.py — no global
    sort), then ONE streamed counting pass (`searchsorted` per batch,
    ≤ n_buckets partial rows per block).  Returns a pandas DataFrame
    [bucket, hi, n] (hi = the bucket's inclusive upper cut; the last
    bucket's hi is +inf).  NaNs excluded (SQL NULL semantics).
    Assignment is `first cut >= value` — identical to the SQL twin's
    CASE WHEN value <= cut_1 ... chain, so counts are bit-stable
    cross-engine."""
    import pandas as pd

    from .quantiles import exact_quantiles

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = np.asarray(
        exact_quantiles(ds, col, qs, bins=bins)["value_exact"], dtype=np.float64)

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.searchsorted(cuts, v, side="left")
        h = np.bincount(b, minlength=n_buckets).astype(np.int64)
        return pa.table({"bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
                         "n": pa.array(h)})

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    total = np.zeros(n_buckets, dtype=np.int64)
    for chunk in parts.iter_batches(batch_size=4096, batch_format="pyarrow"):
        b = chunk["bucket"].to_numpy(zero_copy_only=False)
        n = chunk["n"].to_numpy(zero_copy_only=False)
        np.add.at(total, b, n)
    hi = np.append(cuts, np.inf)
    return pd.DataFrame({"bucket": np.arange(n_buckets, dtype=np.int64),
                         "hi": hi, "n": total})
