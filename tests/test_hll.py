"""Ported HLL oracles (/root/reference/hyperloglog_test.go) + standard-mode bounds."""

import math

import numpy as np
import pytest

from gostatix_ray.kernels import hll


def test_compat_quirk_oracle():
    # hyperloglog_test.go:14-25: m=128, 1000 distinct decimal strings => 100 +- 2
    s = hll.new(hll.HLLSpec(m=128, mode="compat"))
    hll.update(s, [str(i) for i in range(1000)])
    est = hll.count(s, with_correction=True, with_rounding=True)
    assert 98 <= est <= 102


def test_merge_is_elementwise_max():
    # hyperloglog_test.go:27-46 (m=16; our compat mode requires m>=128, use standard)
    spec = hll.HLLSpec(m=16, mode="standard")
    a, b = hll.new(spec), hll.new(spec)
    hll.update(a, ["foo", "bar"])
    hll.update(b, ["abc", "xyz"])
    merged = hll.merge(a, b)
    assert np.array_equal(merged.registers, np.maximum(a.registers, b.registers))


def test_power_of_two_required():
    # base_hyperloglog.go:50-52
    with pytest.raises(ValueError):
        hll.HLLSpec(m=12)


def test_standard_error_bound():
    m = 1 << 14
    s = hll.new(hll.HLLSpec(m=m))
    true = 200_000
    hll.update(s, [f"conv-{i:08d}" for i in range(true)])
    est = hll.count(s)
    assert abs(est - true) / true <= 3 * 1.04 / math.sqrt(m)


def test_small_range_linear_counting():
    s = hll.new(hll.HLLSpec(m=1 << 12))
    hll.update(s, [f"u{i}" for i in range(100)])
    est = hll.count(s)
    assert abs(est - 100) <= 5


def test_accuracy_property():
    assert hll.HLLSpec(m=1 << 14).accuracy() == pytest.approx(1.04 / math.sqrt(1 << 14))


def test_compat_oob_raises_not_panics():
    # SURVEY.md §1.3.1: for small m the reference's quirk indexing (idx = 1 +
    # LeadingZeros64(h << b)) walks past the register array and panics; we raise.
    s = hll.new(hll.HLLSpec(m=16, mode="compat"))
    with pytest.raises(ValueError):
        hll.update_hashed(s, np.array([0], dtype=np.uint64))  # clz(0)=64 -> idx 65 > 16


def test_roundtrip_and_merge_count():
    spec = hll.HLLSpec(m=1 << 10)
    a, b = hll.new(spec), hll.new(spec)
    hll.update(a, [f"a{i}" for i in range(500)])
    hll.update(b, [f"b{i}" for i in range(500)])
    merged = hll.merge(a, b)
    rt = hll.from_bytes(hll.to_bytes(merged))
    assert hll.equals(merged, rt)
    est = hll.count(rt)
    assert abs(est - 1000) / 1000 < 0.15


def test_union_intersection_jaccard():
    spec = hll.HLLSpec(m=1 << 12)
    a, b = hll.new(spec), hll.new(spec)
    hll.update(a, [f"x{i}" for i in range(3000)])          # A = 0..2999
    hll.update(b, [f"x{i}" for i in range(2000, 5000)])    # B = 2000..4999
    assert abs(hll.union_count(a, b) - 5000) / 5000 < 0.1
    inter = hll.intersection_count(a, b)
    assert abs(inter - 1000) / 1000 < 0.35  # inclusion-exclusion noise
    assert 0.1 < hll.jaccard(a, b) < 0.3    # true 1000/5000 = 0.2
