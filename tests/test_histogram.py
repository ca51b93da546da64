"""Fixed-width histogram and grouped mode (stages/histogram.py)."""

import numpy as np
import pandas as pd
import pytest

from gostatix_ray.stages.histogram import fixed_width_histogram, grouped_mode


def _ds(df, parts=6):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


def test_histogram_matches_numpy(ray_session):
    rng = np.random.default_rng(2)
    v = rng.uniform(-10, 110, 20_000)  # includes out-of-range rows
    amt = rng.integers(0, 100, 20_000).astype(np.int64)
    df = pd.DataFrame({"v": v, "amt": amt})
    got = (
        fixed_width_histogram(_ds(df), col="v", lo=0.0, hi=100.0, n_bins=10,
                              sum_col="amt")
        .to_pandas().sort_values("bin").reset_index(drop=True)
    )
    keep = (v >= 0) & (v < 100)
    bins = np.floor(v[keep] / 10.0).astype(int)
    want_n = np.bincount(bins, minlength=10)
    want_s = np.bincount(bins, weights=amt[keep], minlength=10).astype(np.int64)
    assert list(got["bin"]) == list(range(10))
    assert list(got["n"]) == list(want_n)
    assert list(got["sum_amt"]) == list(want_s)


def test_histogram_partition_independent(ray_session):
    rng = np.random.default_rng(8)
    df = pd.DataFrame({"v": rng.uniform(0, 50, 5000)})
    outs = [
        fixed_width_histogram(_ds(df, p), col="v", lo=0.0, hi=50.0, n_bins=5)
        .to_pandas().sort_values("bin").reset_index(drop=True)
        for p in (1, 11)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grouped_mode_with_ties(ray_session):
    # group 1: b wins on count; group 2: tie between a and c -> a (min value)
    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2, 2, 2, 3],
            "v": ["a", "b", "b", "c", "a", "a", "c", "z"],
        }
    )
    got = grouped_mode(_ds(df, 3), group_col="g", value_col="v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    assert list(map(tuple, got.itertuples(index=False))) == [
        (1, "b", 2), (2, "a", 2), (3, "z", 1)
    ]


def test_grouped_mode_matches_pandas(ray_session):
    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 200, 30_000),
            "v": rng.choice([f"v{i}" for i in range(30)], 30_000),
        }
    )
    got = grouped_mode(_ds(df), group_col="g", value_col="v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    cnt = df.groupby(["g", "v"]).size().reset_index(name="n")
    cnt = cnt.sort_values(["g", "n", "v"], ascending=[True, False, True], kind="stable")
    want = cnt.drop_duplicates("g").reset_index(drop=True)
    assert list(got["g"]) == list(want["g"])
    assert list(got["v"]) == list(want["v"])
    assert list(got["n"]) == list(want["n"])


def test_histogram_float_edge_clamped(ray_session):
    """ADVICE r3: when width rounds down, x just below hi floored to
    n_bins and crashed pa.table with a length mismatch — now clamped to
    the last bin."""
    lo, hi, n_bins = -3.630383126785457, 2.770888466262316, 3
    width = (hi - lo) / n_bins
    x = np.nextafter(hi, -np.inf)  # just below hi, floors to n_bins
    assert x < hi and int(np.floor((x - lo) / width)) == n_bins
    df = pd.DataFrame({"v": [x, lo, 0.0], "amt": np.array([5, 7, 11], dtype=np.int64)})
    got = (fixed_width_histogram(_ds(df, 2), col="v", lo=lo, hi=hi,
                                 n_bins=n_bins, sum_col="amt")
           .to_pandas().sort_values("bin").reset_index(drop=True))
    assert list(got["bin"]) == [0, 1, 2]
    assert list(got["n"]) == [1, 1, 1]
    assert list(got["sum_amt"]) == [7, 11, 5]


def test_histogram_sum_exact_above_2_53(ray_session):
    """Integer sums above 2^53 must not lose bits to float64 bincount."""
    big = (1 << 60) + 1
    df = pd.DataFrame({"v": [1.0, 1.5, 7.0],
                       "amt": np.array([big, 1, 3], dtype=np.int64)})
    got = (fixed_width_histogram(_ds(df, 2), col="v", lo=0.0, hi=10.0,
                                 n_bins=10, sum_col="amt")
           .to_pandas().sort_values("bin").reset_index(drop=True))
    assert list(got["bin"]) == [1, 7]
    assert list(got["sum_amt"]) == [big + 1, 3]


def test_histogram_randomized_vs_duckdb(ray_session):
    """Cross-engine fuzz: random float ranges (non-exact widths) vs the
    DuckDB twin carrying the same floor + clamp expression."""
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(19)
    for trial in range(3):
        lo, hi = (float(x) for x in sorted(rng.normal(0, 10, 2)))
        if hi - lo < 1e-6:
            hi = lo + 1.0
        n_bins = int(rng.integers(2, 40))
        vals = rng.normal((lo + hi) / 2, (hi - lo), 2000)
        vals[:5] = [lo, hi, (lo + hi) / 2, np.nextafter(hi, lo), lo - 1]
        ds = rd.from_items([{"v": float(v)} for v in vals]).repartition(4)
        out = (fixed_width_histogram(ds, col="v", lo=lo, hi=hi, n_bins=n_bins)
               .to_pandas().sort_values("bin").reset_index(drop=True))
        width = (hi - lo) / n_bins
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS v)",
                    [vals.tolist()])
        exp = con.execute(
            f"SELECT LEAST(CAST(floor((v - {lo!r}) / {width!r}) AS BIGINT), "
            f"{n_bins - 1}) AS bin, CAST(count(*) AS BIGINT) AS n "
            f"FROM t WHERE v >= {lo!r} AND v < {hi!r} "
            f"GROUP BY 1 ORDER BY 1"
        ).df().reset_index(drop=True)
        assert list(out["bin"]) == list(exp["bin"]), trial
        assert list(out["n"]) == list(exp["n"]), trial


def test_equi_depth_buckets_balanced_and_exact(ray_session):
    from gostatix_ray.stages.histogram import equi_depth_histogram

    rng = np.random.default_rng(29)
    vals = rng.lognormal(0, 2, 8000)  # heavy skew
    ds = _ds(pd.DataFrame({"value": vals}), parts=6)
    out = equi_depth_histogram(ds, col="value", n_buckets=4)
    assert list(out["bucket"]) == [0, 1, 2, 3]
    assert int(out["n"].sum()) == len(vals)
    # equi-depth under skew: every bucket within a few rows of n/4
    # (quantile_disc boundaries put ties in the lower bucket)
    assert (np.abs(out["n"].to_numpy() - 2000) <= 4).all()
    # boundaries are exact order statistics
    srt = np.sort(vals)
    for i, q in enumerate((0.25, 0.5, 0.75)):
        k = min(max(int(np.ceil(q * len(srt))) - 1, 0), len(srt) - 1)
        assert out["hi"].iloc[i] == srt[k]
