"""Moments sketch: exact integer power sums, byte-stable merges, estimators."""

import numpy as np
import pytest

from gostatix_ray.kernels import moments


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    return np.round(rng.lognormal(2.0, 1.0, 50_000), 2)  # money-like, 2dp


def _exact_sums(values, k, scale=100, weights=None):
    s = np.floor(np.asarray(values, dtype=np.float64) * scale + 0.5).astype(np.int64).astype(object)
    s = np.array([int(x) for x in s], dtype=object)
    w = np.ones(len(s), dtype=object) if weights is None else np.asarray(weights, dtype=object)
    return [int((w * s**p).sum()) for p in range(1, k + 1)]


def test_power_sums_exact(data):
    st = moments.new(moments.MomentsSpec(k=4, scale=100))
    moments.update(st, data)
    assert st.n == len(data)
    assert st.sums == _exact_sums(data, 4)
    s = np.floor(data * 100 + 0.5).astype(np.int64)
    assert st.vmin == int(s.min()) and st.vmax == int(s.max())


def test_merge_byte_identical_any_partitioning(data):
    spec = moments.MomentsSpec(k=4, scale=100)
    whole = moments.new(spec)
    moments.update(whole, data)
    ref = moments.to_bytes(whole)
    rng = np.random.default_rng(0)
    for n_parts in (2, 5, 16):
        idx = rng.permutation(len(data))
        parts = np.array_split(data[idx], n_parts)
        states = []
        for p in parts:
            s = moments.new(spec)
            moments.update(s, p)
            states.append(s)
        rng.shuffle(states)
        merged = states[0]
        for s in states[1:]:
            merged = moments.merge(merged, s)
        assert moments.to_bytes(merged) == ref  # byte-stable like the gostatix five


def test_weighted_and_nan_updates():
    st = moments.new(moments.MomentsSpec(k=3, scale=1))
    moments.update(st, [2.0, np.nan, 3.0, 5.0], counts=[4, 9, 0, 2])
    # nan masked with its own weight; zero-weight element dropped
    assert st.n == 6
    assert st.sums == [4 * 2 + 2 * 5, 4 * 4 + 2 * 25, 4 * 8 + 2 * 125]
    assert st.vmin == 2 and st.vmax == 5


def test_overflow_safe_large_values():
    # elements whose 4th power exceeds int64: exactness must survive the
    # object-dtype fallback and chunked reductions
    v = np.array([9e8, 8.7e8, 9.1e8] * 1000)
    st = moments.new(moments.MomentsSpec(k=4, scale=100))
    moments.update(st, v)
    assert st.sums == _exact_sums(v, 4)
    assert st.sums[3] > np.iinfo(np.int64).max  # really exercised the big path


def test_serialization_roundtrip(data):
    st = moments.new(moments.MomentsSpec(k=4, scale=100))
    moments.update(st, data)
    back = moments.from_bytes(moments.to_bytes(st))
    assert moments.equals(st, back)
    empty = moments.new(moments.MomentsSpec(k=2, scale=10))
    assert moments.equals(empty, moments.from_bytes(moments.to_bytes(empty)))


def test_estimators_match_numpy(data):
    st = moments.new(moments.MomentsSpec(k=4, scale=100))
    moments.update(st, data)
    cents = np.floor(data * 100 + 0.5)
    assert moments.mean_scaled(st) == pytest.approx(cents.mean(), rel=1e-12)
    assert moments.variance_scaled(st) == pytest.approx(cents.var(), rel=1e-9)
    assert moments.mean(st) == pytest.approx(cents.mean() / 100, rel=1e-12)
    assert moments.std(st) == pytest.approx(cents.std() / 100, rel=1e-9)
    m = cents.mean()
    m2 = ((cents - m) ** 2).mean()
    m3 = ((cents - m) ** 3).mean()
    m4 = ((cents - m) ** 4).mean()
    assert moments.skewness(st) == pytest.approx(m3 / m2**1.5, rel=1e-6)
    assert moments.kurtosis(st) == pytest.approx(m4 / m2**2 - 3, rel=1e-6)


def test_spec_mismatch_and_validation():
    a = moments.new(moments.MomentsSpec(k=2))
    b = moments.new(moments.MomentsSpec(k=3))
    with pytest.raises(ValueError):
        moments.merge(a, b)
    with pytest.raises(ValueError):
        moments.MomentsSpec(k=0)
    with pytest.raises(ValueError):
        moments.MomentsSpec(k=2, scale=0)


def test_grouped_pipeline_matches_exact(ray_session):
    """End-to-end: grouped moments over a Dataset == per-group numpy sums."""
    import pandas as pd
    import ray.data as rd

    from gostatix_ray.stages.build import SketchRequest, build_partials
    from gostatix_ray.stages.merge import collect_final, merge_partials_streaming

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "value": np.round(rng.exponential(50.0, 20_000), 2),
            "grp": rng.choice(["a", "b", "c"], 20_000),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    partials = build_partials(
        ds,
        [SketchRequest("m", "moments", moments.MomentsSpec(k=2, scale=100),
                       on="value", group_by="grp")],
        concurrency=2,
    )
    final = collect_final(merge_partials_streaming(partials))
    for g in ("a", "b", "c"):
        st = moments.from_bytes(final[("m", g)])
        sub = df.loc[df["grp"] == g, "value"].to_numpy()
        assert st.n == len(sub)
        assert st.sums == _exact_sums(sub, 2)


def test_weighted_overflow_object_path():
    """ADVICE r3: the int64/object decision must include the WEIGHT bound.

    max|s|^p fits int64 but max|s|^p * max(w) does not — the old code
    kept the int64 path and the per-element product wrapped silently.
    """
    st = moments.new(moments.MomentsSpec(k=2, scale=1))
    moments.update(st, [2e9], counts=[10])
    assert st.sums == [10 * 2_000_000_000, 10 * 2_000_000_000**2]
    # p=1 can overflow too when |s| * w > 2^63
    st = moments.new(moments.MomentsSpec(k=1, scale=1))
    moments.update(st, [float(2**62)], counts=[8])
    assert st.sums == [8 * int(float(2**62))]


def test_weighted_fuzz_exact():
    rng = np.random.default_rng(17)
    for _ in range(20):
        k = int(rng.integers(1, 5))
        n = int(rng.integers(1, 300))
        vals = rng.uniform(-1e9, 1e9, n)
        cnts = rng.integers(1, 2_000_000, n)
        st = moments.new(moments.MomentsSpec(k=k, scale=100))
        moments.update(st, vals, counts=cnts)
        assert st.sums == _exact_sums(vals, k, weights=[int(c) for c in cnts])
