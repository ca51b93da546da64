"""t-digest + KLL: quantile-error bounds and merge behavior (north-rule extras)."""

import numpy as np
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
