"""Ported cuckoo oracles (/root/reference/cuckoo_filter_test.go)."""

import numpy as np
import pytest

from gostatix_ray.kernels import cuckoo


def make_small():
    # cuckoo_filter_test.go:93-122: size=20, b=4, retries=500, eps=0.01
    return cuckoo.new(cuckoo.CuckooSpec.from_error_rate(20, 4, 500, 0.01))


def test_insert_lookup():
    s = make_small()
    cuckoo.insert_batch(s, ["alice", "andrew", "bob", "sam"] * 2)
    assert s.length == 8
    assert cuckoo.lookup_batch(s, ["alice"]).all()
    assert not cuckoo.lookup_batch(s, ["samx", "samy", "joe"]).any()


def test_remove():
    # cuckoo_filter_test.go:124-148
    s = make_small()
    cuckoo.insert_batch(s, ["alice", "bob"])
    assert cuckoo.remove_batch(s, ["alice"]).all()
    assert not cuckoo.lookup_batch(s, ["alice"]).any()
    assert cuckoo.lookup_batch(s, ["bob"]).all()
    assert not cuckoo.remove_batch(s, ["ghost"]).any()


def test_full_filter_raises_not_panics():
    # cuckoo_filter_test.go:80-91 (reference panics; we raise, SURVEY.md §1.3.6)
    spec = cuckoo.CuckooSpec(size=2, bucket_size=2, fp_length=2, retries=5)
    s = cuckoo.new(spec)
    with pytest.raises(cuckoo.CuckooFullError):
        cuckoo.insert_batch(s, [f"v{i}" for i in range(20)], destructive=True)


def test_rollback_restores_state():
    # cuckoo_filter_test.go:150-229: non-destructive failure restores buckets
    spec = cuckoo.CuckooSpec(size=2, bucket_size=2, fp_length=2, retries=5)
    s = cuckoo.new(spec)
    inserted = []
    try:
        for i in range(20):
            cuckoo.insert_batch(s, [f"v{i}"], destructive=False)
            inserted.append(f"v{i}")
    except cuckoo.CuckooFullError:
        pass
    # everything inserted before the failure must still be present
    assert cuckoo.lookup_batch(s, inserted).all()


def test_positive_rate_and_sizing():
    spec = cuckoo.CuckooSpec.from_error_rate(20, 4, 500, 0.01)
    assert spec.size == 5  # ceil(20*0.955/4)
    assert spec.fp_length == 2  # ceil((log2(1/0.01)+log2(8))/8) -> ceil(9.64.../8)? = 2 bytes
    assert spec.positive_rate() == pytest.approx(2.0 ** (np.log2(8.0) - 2))


def test_deterministic_given_seed():
    a = cuckoo.new(cuckoo.CuckooSpec(size=8, bucket_size=2, fp_length=3, retries=50), seed=1)
    b = cuckoo.new(cuckoo.CuckooSpec(size=8, bucket_size=2, fp_length=3, retries=50), seed=1)
    vals = [f"item-{i}" for i in range(12)]
    cuckoo.insert_batch(a, vals)
    cuckoo.insert_batch(b, vals)
    assert cuckoo.equals(a, b)


def test_roundtrip():
    s = make_small()
    cuckoo.insert_batch(s, ["alice", "bob"])
    s2 = cuckoo.from_bytes(cuckoo.to_bytes(s))
    assert cuckoo.equals(s, s2)
    assert s2.length == 2
