"""DDSketch kernel: α relative-error guarantee vs exact quantiles,
byte-stable merges under any partitioning (incl. with collapse),
weighted updates, memory bound, codec round-trip."""

import numpy as np
import pytest

from gostatix_ray.kernels import ddsketch as dd

_QS = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def _exact(vals: np.ndarray, qs: np.ndarray) -> np.ndarray:
    s = np.sort(vals)
    k = np.clip(np.ceil(qs * len(s)).astype(np.int64), 1, len(s))
    return s[k - 1]


def _streams():
    rng = np.random.default_rng(42)
    return {
        "lognormal": rng.lognormal(3.0, 2.0, 20_000),
        "uniform": rng.uniform(0.5, 1e6, 20_000),
        "mixed_sign": np.concatenate([
            rng.normal(-100.0, 40.0, 8_000),
            np.zeros(500),
            rng.lognormal(1.0, 1.5, 11_500)]),
        "heavy_dups": np.repeat(rng.lognormal(0.0, 1.0, 50), 400),
    }


@pytest.mark.parametrize("alpha", [0.02, 0.005])
def test_relative_error_bound(alpha):
    for name, vals in _streams().items():
        spec = dd.DDSpec(alpha=alpha, max_bins=4096)
        st = dd.new(spec)
        dd.update(st, vals)
        assert not st.collapsed, name
        est = dd.quantile(st, _QS)
        exact = _exact(vals, _QS)
        ok = np.abs(est - exact) <= alpha * np.abs(exact) * (1 + 1e-9) \
            + spec.min_value
        assert ok.all(), (name, est, exact)


def test_byte_stable_partition_invariance():
    rng = np.random.default_rng(7)
    for max_bins in (4096, 64):  # 64 forces collapse
        for name, vals in _streams().items():
            spec = dd.DDSpec(alpha=0.01, max_bins=max_bins)
            ref = dd.new(spec)
            dd.update(ref, vals)
            ref_bytes = dd.to_bytes(ref)
            for nparts in (2, 5, 13):
                perm = rng.permutation(len(vals))
                parts = np.array_split(perm, nparts)
                states = []
                for p in parts:
                    s = dd.new(spec)
                    dd.update(s, vals[p])
                    states.append(s)
                order = rng.permutation(nparts)
                merged = states[order[0]]
                for j in order[1:]:
                    merged = dd.merge(merged, states[j])
                assert dd.to_bytes(merged) == ref_bytes, (name, max_bins,
                                                          nparts)


def test_collapse_bounds_memory_and_keeps_upper_quantiles():
    # ln-range of lognormal(3,2) spans ~900 α=0.01 buckets; 512 forces
    # a collapse whose floor (~value 2) sits below the median (~20)
    vals = _streams()["lognormal"]
    spec = dd.DDSpec(alpha=0.01, max_bins=512)
    st = dd.new(spec)
    dd.update(st, vals)
    assert st.collapsed
    assert st.pos.size <= 512 and st.neg.size <= 512
    # quantiles resolving above the collapse floor keep the α bound
    hi_qs = np.array([0.5, 0.75, 0.9, 0.99])
    est = dd.quantile(st, hi_qs)
    exact = _exact(vals, hi_qs)
    assert (np.abs(est - exact) <= 0.01 * np.abs(exact) * (1 + 1e-9)).all()


def test_weighted_update_equals_repeats():
    vals = np.array([3.5, -2.0, 3.5, 1e-12, 7.25])
    cnts = np.array([4, 3, 2, 5, 1])
    spec = dd.DDSpec()
    a = dd.new(spec)
    dd.update(a, vals, cnts)
    b = dd.new(spec)
    dd.update(b, np.repeat(vals, cnts))
    assert dd.equals(a, b)
    assert dd.to_bytes(a) == dd.to_bytes(b)
    assert a.n == cnts.sum()
    assert a.zero_count == 5  # |1e-12| < min_value


def test_nan_and_empty():
    st = dd.new(dd.DDSpec())
    dd.update(st, np.array([np.nan, np.nan]))
    assert st.n == 0
    assert np.isnan(dd.quantile(st, [0.5])).all()


def test_codec_round_trip():
    vals = _streams()["mixed_sign"]
    st = dd.new(dd.DDSpec(alpha=0.03, max_bins=256))
    dd.update(st, vals)
    rt = dd.from_bytes(dd.to_bytes(st))
    assert dd.equals(st, rt)
    assert rt.collapsed == st.collapsed
    assert dd.to_bytes(rt) == dd.to_bytes(st)


def test_rank_monotone_and_consistent():
    vals = _streams()["uniform"]
    st = dd.new(dd.DDSpec(alpha=0.01, max_bins=4096))
    dd.update(st, vals)
    xs = np.quantile(vals, [0.1, 0.5, 0.9])
    r = dd.rank(st, xs)
    assert (np.diff(r) > 0).all()
    assert np.abs(r - [0.1, 0.5, 0.9]).max() < 0.02


def test_spec_validation():
    with pytest.raises(ValueError):
        dd.DDSpec(alpha=0.0)
    with pytest.raises(ValueError):
        dd.DDSpec(max_bins=1)
    with pytest.raises(ValueError):
        dd.DDSpec(min_value=0.0)
    a, b = dd.new(dd.DDSpec(alpha=0.01)), dd.new(dd.DDSpec(alpha=0.02))
    with pytest.raises(ValueError):
        dd.merge(a, b)


def test_engine_path_matches_local_kernel(ray_session, tmp_path):
    """build_partials -> merge_partials_streaming over a parquet input
    yields the SAME bytes as a single local kernel build (the
    byte-stability contract through the whole engine path)."""
    import pandas as pd
    import ray

    from gostatix_ray.stages.build import SketchRequest, build_partials
    from gostatix_ray.stages.merge import (collect_final,
                                           merge_partials_streaming)

    rng = np.random.default_rng(11)
    vals = rng.lognormal(2.0, 1.0, 30_000)
    path = str(tmp_path / "vals.parquet")
    pd.DataFrame({"value": vals}).to_parquet(path)
    spec = dd.DDSpec(alpha=0.01, max_bins=512)
    ds = ray.data.read_parquet(path).repartition(6)
    req = SketchRequest("dd", "ddsketch", spec, on="value")
    final = collect_final(merge_partials_streaming(
        build_partials(ds, [req], concurrency=2)))
    got = dd.from_bytes(final[("dd", "")])
    want = dd.new(spec)
    dd.update(want, vals)
    assert dd.to_bytes(got) == dd.to_bytes(want)
