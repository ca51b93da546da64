"""SpaceSaving / Misra-Gries kernel: exact-below-k regime, deficit
bounds under adversarial partitioning, heavy-hitter recovery, codec."""

import numpy as np
import pytest

from gostatix_ray.kernels import spacesaving as ss


def _zipf_stream(n=30_000, n_keys=500, seed=5):
    rng = np.random.default_rng(seed)
    keys = rng.zipf(1.3, n).clip(1, n_keys)
    return [f"key-{k:04d}" for k in keys]


def _true_counts(stream):
    from collections import Counter

    return Counter(stream)


def test_exact_when_distinct_below_k():
    stream = [f"t{i % 7}" for i in range(10_000)]
    st = ss.new(ss.SSSpec(k=16))
    ss.update(st, stream)
    assert st.err == 0
    truth = _true_counts(stream)
    assert dict(ss.values(st)) == dict(truth)
    # ... and stays exact under any partitioning (plain-addition merges)
    rng = np.random.default_rng(1)
    for nparts in (2, 5, 11):
        perm = rng.permutation(len(stream))
        parts = np.array_split(perm, nparts)
        states = []
        for p in parts:
            s = ss.new(ss.SSSpec(k=16))
            ss.update(s, [stream[i] for i in p])
            states.append(s)
        merged = states[0]
        for s2 in states[1:]:
            merged = ss.merge(merged, s2)
        assert dict(ss.values(merged)) == dict(truth)
        assert merged.err == 0


@pytest.mark.parametrize("k", [8, 32, 128])
def test_deficit_bounds_under_partitioning(k):
    stream = _zipf_stream()
    truth = _true_counts(stream)
    N = len(stream)
    rng = np.random.default_rng(9)
    for nparts in (1, 4, 13):
        perm = rng.permutation(N)
        parts = np.array_split(perm, nparts)
        states = []
        for p in parts:
            s = ss.new(ss.SSSpec(k=k))
            ss.update(s, [stream[i] for i in p])
            states.append(s)
        order = rng.permutation(nparts)
        merged = states[order[0]]
        for j in order[1:]:
            merged = ss.merge(merged, states[j])
        assert merged.n == N
        assert merged.err <= N // (k + 1)
        assert len(merged.counters) <= k
        for el, est in merged.counters.items():
            assert est <= truth[el]
            assert est >= truth[el] - merged.err
        # completeness: every item with true > err must be present
        for el, c in truth.items():
            if c > merged.err:
                assert el in merged.counters, (el, c, merged.err)


def test_heavy_hitter_recovery():
    stream = _zipf_stream()
    truth = _true_counts(stream)
    N = len(stream)
    st = ss.new(ss.SSSpec(k=64))
    ss.update(st, stream)
    hh = dict(ss.heavy_hitters(st, 0.02))
    for el, c in truth.items():
        if c > 0.02 * N + st.err:
            assert el in hh
    lo, hi = ss.estimate(st, "key-0001")
    assert lo <= truth["key-0001"] <= hi


def test_weighted_update_and_values_order():
    st = ss.new(ss.SSSpec(k=8))
    ss.update(st, ["b", "a", "c"], [5, 5, 2])
    top = ss.values(st, 2)
    assert top == [("a", 5), ("b", 5)]  # count desc, key asc
    assert st.n == 12


def test_codec_round_trip_and_validation():
    st = ss.new(ss.SSSpec(k=4))
    ss.update(st, _zipf_stream(n=2000, n_keys=50))
    rt = ss.from_bytes(ss.to_bytes(st))
    assert ss.equals(st, rt)
    with pytest.raises(ValueError):
        ss.SSSpec(k=0)
    with pytest.raises(ValueError):
        ss.merge(st, ss.new(ss.SSSpec(k=5)))
    with pytest.raises(ValueError):
        ss.from_bytes(b"XXXX1234")


def test_engine_path_exact_regime(ray_session, tmp_path):
    """Through build->merge: with distinct keys <= k the merged summary
    equals exact DuckDB-style counts regardless of block layout."""
    import pandas as pd
    import ray

    from gostatix_ray.stages.build import SketchRequest, build_partials
    from gostatix_ray.stages.merge import (collect_final,
                                           merge_partials_streaming)

    rng = np.random.default_rng(3)
    types = rng.choice(["view", "click", "buy", "refund"], 20_000,
                       p=[0.6, 0.25, 0.1, 0.05])
    path = str(tmp_path / "ev.parquet")
    pd.DataFrame({"event_type": types}).to_parquet(path)
    ds = ray.data.read_parquet(path).repartition(5)
    req = SketchRequest("ssk", "spacesaving", ss.SSSpec(k=16),
                        on="event_type")
    final = collect_final(merge_partials_streaming(
        build_partials(ds, [req], concurrency=2)))
    got = dict(ss.values(ss.from_bytes(final[("ssk", "")])))
    from collections import Counter

    assert got == dict(Counter(types))
