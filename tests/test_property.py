"""Property-based tests (hypothesis): hash equivalence, sketch invariants."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gostatix_ray.hashing import hash128, murmur3_x64_128
from gostatix_ray.kernels import bloom, cms, hll

keys = st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=20), st.integers(0, 2**32 - 1))
def test_vectorized_hash_equals_scalar(vals, seed):
    h1, h2 = hash128(vals, seed)
    for v, a, b in zip(vals, h1, h2):
        assert (int(a), int(b)) == murmur3_x64_128(v, seed)


@settings(max_examples=25, deadline=None)
@given(keys)
def test_bloom_no_false_negatives(vals):
    s = bloom.new(bloom.BloomSpec.from_params(1000, 0.01))
    bloom.update(s, vals)
    assert bloom.contains(s, vals).all()


@settings(max_examples=25, deadline=None)
@given(keys, st.integers(1, 4))
def test_cms_never_underestimates_and_split_invariant(vals, nparts):
    spec = cms.CMSSpec(rows=3, columns=512)
    whole = cms.new(spec)
    cms.update(whole, vals)
    parts = [cms.new(spec) for _ in range(nparts)]
    for i, v in enumerate(vals):
        cms.update(parts[i % nparts], [v])
    merged = parts[0]
    for p in parts[1:]:
        merged = cms.merge(merged, p)
    assert cms.to_bytes(merged) == cms.to_bytes(whole)
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1
    qs = list(true)
    est = cms.count(whole, qs)
    assert all(int(e) >= true[q] for e, q in zip(est, qs))


@settings(max_examples=25, deadline=None)
@given(keys, keys)
def test_hll_merge_commutes_and_dominates(a_vals, b_vals):
    spec = hll.HLLSpec(m=256)
    a, b = hll.new(spec), hll.new(spec)
    hll.update(a, a_vals)
    hll.update(b, b_vals)
    ab, ba = hll.merge(a, b), hll.merge(b, a)
    assert hll.to_bytes(ab) == hll.to_bytes(ba)
    assert (ab.registers >= a.registers).all() and (ab.registers >= b.registers).all()
    both = hll.new(spec)
    hll.update(both, list(a_vals) + list(b_vals))
    assert hll.to_bytes(both) == hll.to_bytes(ab)
