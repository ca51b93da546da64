"""t-digest + KLL: quantile-error bounds and merge behavior (north-rule extras)."""

import numpy as np
import pandas as pd
import pytest

from gostatix_ray.kernels import kll, tdigest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    return rng.lognormal(0.0, 1.0, 100_000)


def test_tdigest_quantile_bounds(data):
    s = tdigest.new(tdigest.TDigestSpec(compression=200.0))
    tdigest.update(s, data)
    srt = np.sort(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = float(tdigest.quantile(s, q)[0])
        # rank error: position of est within sorted data vs q
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.01, (q, est, rank)


def test_tdigest_merge_bounds(data):
    parts = np.array_split(data, 7)
    states = []
    for p in parts:
        s = tdigest.new(tdigest.TDigestSpec(compression=200.0))
        tdigest.update(s, p)
        states.append(s)
    merged = states[0]
    for s in states[1:]:
        merged = tdigest.merge(merged, s)
    assert tdigest.total_weight(merged) == len(data)
    srt = np.sort(data)
    for q in (0.05, 0.5, 0.95):
        est = float(tdigest.quantile(merged, q)[0])
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.015


def test_tdigest_centroid_budget(data):
    s = tdigest.new(tdigest.TDigestSpec(compression=100.0))
    tdigest.update(s, data)
    tdigest._flush(s)
    assert s.means.size <= 2 * 100  # ~delta centroids after compression


def test_tdigest_cdf(data):
    s = tdigest.new(tdigest.TDigestSpec(compression=200.0))
    tdigest.update(s, data)
    med = float(np.median(data))
    assert abs(float(tdigest.cdf(s, med)[0]) - 0.5) < 0.01


def test_tdigest_roundtrip(data):
    s = tdigest.new(tdigest.TDigestSpec())
    tdigest.update(s, data[:1000])
    s2 = tdigest.from_bytes(tdigest.to_bytes(s))
    assert tdigest.equals(s, s2)


def test_kll_rank_error(data):
    s = kll.new(kll.KLLSpec(k=200), seed=1)
    kll.update(s, data)
    srt = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = float(kll.quantile(s, q)[0])
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.03, (q, rank)


def test_kll_merge(data):
    parts = np.array_split(data, 5)
    states = []
    for i, p in enumerate(parts):
        s = kll.new(kll.KLLSpec(k=200), seed=i)
        kll.update(s, p)
        states.append(s)
    merged = states[0]
    for s in states[1:]:
        merged = kll.merge(merged, s)
    assert merged.n == len(data)
    srt = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        est = float(kll.quantile(merged, q)[0])
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.04


def test_kll_space_bound(data):
    s = kll.new(kll.KLLSpec(k=200))
    kll.update(s, data)
    assert sum(l.size for l in s.levels) < 3 * 200


def test_weighted_update_nan_alignment():
    """NaN values must drop their OWN weights, not shift everyone else's
    (round-1 ADVICE, medium: counts[:v.size] after the NaN filter attached
    weights to the wrong elements — weighted median came out 20 where 10
    is correct)."""
    vals = [10.0, np.nan, 20.0]
    wts = [100, 1, 1]  # the heavy weight belongs to 10.0
    t = tdigest.new(tdigest.TDigestSpec(compression=100.0))
    tdigest.update(t, vals, wts)
    assert float(tdigest.quantile(t, 0.5)[0]) == pytest.approx(10.0, abs=0.5)
    assert tdigest.total_weight(t) == 101
    k = kll.new(kll.KLLSpec(k=64))
    kll.update(k, vals, wts)
    assert float(kll.quantile(k, 0.5)[0]) == 10.0
    assert k.n == 101


def test_kll_roundtrip(data):
    s = kll.new(kll.KLLSpec(k=64))
    kll.update(s, data[:5000])
    s2 = kll.from_bytes(kll.to_bytes(s))
    assert s2.n == s.n
    assert float(kll.quantile(s2, 0.5)[0]) == pytest.approx(float(kll.quantile(s, 0.5)[0]), rel=0.1)


def test_tdigest_zero_weight_dropped():
    """count=0 rows must contribute nothing — kept, they produce 0/0 NaN
    centroid means (round-4 review finding)."""
    t = tdigest.new(tdigest.TDigestSpec(compression=100.0))
    tdigest.update(t, [1.0, 2.0], [1, 0])
    qs = tdigest.quantile(t, [0.5, 1.0])
    assert not np.isnan(qs).any()
    assert tdigest.total_weight(t) == 1
    # all-zero batch: no-op, not NaN poisoning
    t2 = tdigest.new(tdigest.TDigestSpec(compression=100.0))
    tdigest.update(t2, [5.0], [0])
    assert tdigest.total_weight(t2) == 0


def test_kll_huge_count_no_materialization():
    """A single pre-aggregated (value, 10^9) row must insert via bit
    decomposition, never an O(count) np.repeat (round-4 review finding:
    8 GB allocation)."""
    s = kll.new(kll.KLLSpec(k=64))
    kll.update(s, [42.0, 7.0], [10**9, 1])
    assert s.n == 10**9 + 1
    assert sum(l.size for l in s.levels) < 1000  # logical weights, not copies
    assert float(kll.quantile(s, 0.5)[0]) == 42.0
    assert float(kll.rank(s, 42.0)[0]) > 0.99


def test_quantile_bin_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from gostatix_ray.stages.quantiles import quantile_bin

    rng = np.random.default_rng(31)
    n = 8000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        # heavy ties: quantile cuts land ON repeated values
        "value": rng.choice([0.0, 1.0, 1.0, 2.5, 7.75, 99.0], n)
                 + rng.integers(0, 3, n) * 0.25,
    })
    df.loc[rng.random(n) < 0.03, "value"] = np.nan
    con = duckdb.connect()
    con.register("events", df)
    oracle = con.execute("""
        WITH c AS (SELECT quantile_disc(value, 0.2) AS c1,
          quantile_disc(value, 0.4) AS c2, quantile_disc(value, 0.6) AS c3,
          quantile_disc(value, 0.8) AS c4 FROM events)
        SELECT e.event_id, CAST(1 + CAST(e.value > c.c1 AS INT)
          + CAST(e.value > c.c2 AS INT) + CAST(e.value > c.c3 AS INT)
          + CAST(e.value > c.c4 AS INT) AS BIGINT) AS bin
        FROM events e, c WHERE e.value IS NOT NULL ORDER BY e.event_id
    """).df()
    for parts in (1, 6):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        out = (quantile_bin(ds, "value", nbins=5, id_col="event_id")
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
    # bins are roughly equal-frequency (ties distort, but all present)
    assert set(out["bin"].unique()) <= {1, 2, 3, 4, 5}

    with pytest.raises(ValueError):
        quantile_bin(rd.from_pandas(df), "value", nbins=1,
                     id_col="event_id")
