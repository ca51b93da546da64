"""Ported CMS oracles (/root/reference/count_min_sketch_test.go) + bounds."""

import math

import numpy as np
import pytest

from gostatix_ray.kernels import cms


def test_sizing():
    # count_min_sketch.go:48-52: w=ceil(e/eps), d=ceil(ln(1/delta))
    spec = cms.CMSSpec.from_error_rate(0.001, 0.999)
    assert spec.columns == math.ceil(math.e / 0.001) == 2719
    assert spec.rows == 1


def test_exact_small_counts():
    # count_min_sketch_test.go:13-33: foo x2, bar x1 -> foo=2 bar=1 baz=0
    s = cms.new(cms.CMSSpec.from_error_rate(0.001, 0.999))
    cms.update(s, ["foo", "foo", "bar"])
    counts = cms.count(s, ["foo", "bar", "baz"])
    assert list(counts) == [2, 1, 0]
    assert s.all_sum == 3


def test_weighted_updates():
    s = cms.new(cms.CMSSpec.from_error_rate(0.001, 0.999))
    cms.update(s, ["foo", "bar"], counts=[5, 3])
    assert list(cms.count(s, ["foo", "bar"])) == [5, 3]


def test_merge_additive():
    # count_min_sketch_test.go:35-68: A foo x3 baz x1; B foo x1 bar x2 baz x1
    spec = cms.CMSSpec.from_error_rate(0.001, 0.999)
    a, b = cms.new(spec), cms.new(spec)
    cms.update(a, ["foo", "foo", "foo", "baz"])
    cms.update(b, ["foo", "bar", "bar", "baz"])
    m = cms.merge(a, b)
    assert list(cms.count(m, ["foo", "bar", "baz", "faz"])) == [4, 2, 2, 0]
    assert m.all_sum == 8  # deviation from reference merge, which drops allSum (SURVEY.md §1.3.5)


def test_merge_shape_mismatch():
    # count_min_sketch_test.go:70-89
    a = cms.new(cms.CMSSpec(rows=2, columns=100))
    b = cms.new(cms.CMSSpec(rows=2, columns=200))
    with pytest.raises(ValueError):
        cms.merge(a, b)


def test_overestimate_only_and_bound():
    eps, delta = 0.005, 0.01
    spec = cms.CMSSpec.from_error_rate(eps, delta)
    s = cms.new(spec)
    rng = np.random.default_rng(7)
    # zipf-ish stream of 2000 distinct keys, 50k updates
    keys = [f"k{z}" for z in rng.zipf(1.5, 50_000) % 2000]
    s_counts: dict[str, int] = {}
    for k in keys:
        s_counts[k] = s_counts.get(k, 0) + 1
    cms.update(s, keys)
    qs = list(s_counts.keys())
    est = cms.count(s, qs)
    true = np.array([s_counts[k] for k in qs])
    over = est.astype(np.int64) - true
    assert (over >= 0).all()  # CMS never underestimates
    n = s.all_sum
    # eps*N bound with failure prob delta per query; allow a loose multiple
    assert (over <= spec.error_bound_eps() * n + 1).mean() > 1 - 5 * delta


def test_roundtrip():
    s = cms.new(cms.CMSSpec(rows=3, columns=500))
    cms.update(s, ["a", "b", "a"])
    s2 = cms.from_bytes(cms.to_bytes(s))
    assert cms.equals(s, s2)
    assert s2.all_sum == 3


def test_inner_product():
    spec = cms.CMSSpec(rows=5, columns=4096)
    a, b = cms.new(spec), cms.new(spec)
    # f_a = {x:3, y:2}; f_b = {x:4, z:5} => <f_a, f_b> = 12
    cms.update(a, ["x", "y"], counts=[3, 2])
    cms.update(b, ["x", "z"], counts=[4, 5])
    est = cms.inner_product(a, b)
    assert est >= 12
    assert est <= 12 + spec.error_bound_eps() * a.all_sum * b.all_sum + 1


def test_inner_product_spec_mismatch():
    with pytest.raises(ValueError):
        cms.inner_product(cms.new(cms.CMSSpec(rows=2, columns=64)), cms.new(cms.CMSSpec(rows=2, columns=128)))


def test_inner_product_exact_past_float53():
    # round-1 ADVICE (low): float64 accumulation loses precision past 2^53
    # and could UNDER-report, breaking the overestimate-only guarantee.
    spec = cms.CMSSpec(rows=2, columns=16)
    a, b = cms.new(spec), cms.new(spec)
    big = 1 << 40
    cms.update(a, ["x"], counts=[big])
    cms.update(b, ["x"], counts=[big])
    est = cms.inner_product(a, b)
    assert est >= big * big  # exact integer math: never under-reports
