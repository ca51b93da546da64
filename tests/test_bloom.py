"""Ported bloom oracles (/root/reference/bloom_filter_test.go) + merge/codec."""

import struct

import numpy as np
import pytest

from gostatix_ray.kernels import bloom


def test_membership_names():
    # bloom_filter_test.go:19-42 — size 1000 bits, k 4
    s = bloom.BloomState(bloom.BloomSpec(size=1000, num_hashes=4), np.zeros(16, np.uint64))
    bloom.update(s, ["John", "Alice"])
    assert list(bloom.contains(s, ["John", "Alice"])) == [True, True]
    assert list(bloom.contains(s, ["Jane", "Bob"])) == [False, False]


def test_membership_strings():
    # bloom_filter_test.go:93-118
    s = bloom.BloomState(bloom.BloomSpec(size=1000, num_hashes=4), np.zeros(16, np.uint64))
    bloom.update(s, ["This", "present", "bloom"])
    assert bloom.contains(s, ["This", "present", "bloom"]).all()
    assert not bloom.contains(s, ["is", "in", "blooms"]).any()


def test_membership_uint32_keys():
    # bloom_filter_test.go:68-91 — big-endian uint32 byte keys
    s = bloom.new(bloom.BloomSpec.from_params(1000, 0.01))
    keys = [struct.pack(">I", v) for v in (100, 101, 102)]
    bloom.update(s, keys)
    assert bloom.contains(s, keys).all()
    assert not bloom.contains(s, [struct.pack(">I", 103)]).any()


@pytest.mark.parametrize("n", [1000, 10000, 100000])
@pytest.mark.parametrize("p", [0.001, 0.01, 0.1])
def test_fpp_grid(n, p):
    # bloom_filter_test.go:133-180: estimated FPP <= 1.1 * configured p
    s = bloom.new(bloom.BloomSpec.from_params(n, p))
    keys = [struct.pack(">I", i) for i in range(n)]
    bloom.update(s, keys)
    assert bloom.positive_rate(s) <= 1.1 * p


def test_empirical_fpp():
    n, p = 10000, 0.01
    s = bloom.new(bloom.BloomSpec.from_params(n, p))
    bloom.update(s, [f"key-{i}" for i in range(n)])
    hits = bloom.contains(s, [f"absent-{i}" for i in range(20000)]).sum()
    assert hits / 20000 <= 2.0 * p


def test_merge_or_consistent_with_insert():
    spec = bloom.BloomSpec.from_params(1000, 0.01)
    a, b, c = bloom.new(spec), bloom.new(spec), bloom.new(spec)
    bloom.update(a, ["x", "y"])
    bloom.update(b, ["z"])
    bloom.update(c, ["x", "y", "z"])
    assert bloom.equals(bloom.merge(a, b), c)


def test_merge_spec_mismatch():
    a = bloom.new(bloom.BloomSpec.from_params(1000, 0.01))
    b = bloom.new(bloom.BloomSpec.from_params(2000, 0.01))
    with pytest.raises(ValueError):
        bloom.merge(a, b)


def test_roundtrip():
    s = bloom.new(bloom.BloomSpec.from_params(500, 0.05))
    bloom.update(s, ["alpha", "beta"])
    s2 = bloom.from_bytes(bloom.to_bytes(s))
    assert bloom.equals(s, s2)
    assert bloom.contains(s2, ["alpha", "beta"]).all()


def test_sizing_formulas():
    # util/base.go:19-25 for n=10000, p=0.001: size = ceil(-n ln p / ln^2 2)
    spec = bloom.BloomSpec.from_params(10000, 0.001)
    assert spec.size == 143776
    assert spec.num_hashes == 10  # ceil(floor(143776/10000) * ln2) = ceil(14*0.693) = 10


def test_approximate_count():
    s = bloom.new(bloom.BloomSpec.from_params(10000, 0.01))
    bloom.update(s, [f"item-{i}" for i in range(5000)])
    est = bloom.approximate_count(s)
    assert abs(est - 5000) / 5000 < 0.05  # Swamidass-Baldi estimate


def test_positive_rate_reference_formula():
    # bloom_filter.go:228-231: (1 - exp(-bitCount/size))^numHashes
    import math

    import numpy as np

    s = bloom.new(bloom.BloomSpec.from_params(1000, 0.01))
    bloom.update(s, [f"k{i}" for i in range(500)])
    set_bits = int(np.unpackbits(s.bits.view(np.uint8)).sum())
    expect = (1.0 - math.exp(-set_bits / s.spec.size)) ** s.spec.num_hashes
    assert bloom.positive_rate(s) == expect
