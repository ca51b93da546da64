"""North-rule associativity: any partitioning/order => byte-identical state.

FIXTURES.md §B.10: fixed seeded stream of 10k byte-keys, randomly split
into 1..16 partitions in shuffled orders; merged HLL/CMS/Bloom (and
top-k candidate-union) states must be byte-identical across all splits.
(t-digest / KLL are excluded by design: their merges are bound-
preserving, not byte-stable — documented in their kernel modules.)
"""

import numpy as np
import pytest

from gostatix_ray.kernels import bloom, cms, hll, topk

STREAM = [f"key-{i % 3000:06d}" for i in range(10_000)]  # duplicates included


def _build(kernel, spec, part):
    s = kernel.new(spec)
    kernel.update(s, part)
    return s


@pytest.mark.parametrize("kernel,spec", [
    (bloom, bloom.BloomSpec.from_params(5000, 0.01)),
    (hll, hll.HLLSpec(m=1 << 12)),
    (hll, hll.HLLSpec(m=128, mode="compat")),
    (cms, cms.CMSSpec(rows=5, columns=4096)),
])
def test_partition_invariance(kernel, spec):
    rng = np.random.default_rng(13)
    reference = _build(kernel, spec, STREAM)
    ref_bytes = kernel.to_bytes(reference)
    for nparts in (1, 2, 7, 16):
        perm = rng.permutation(len(STREAM))
        parts = np.array_split(perm, nparts)
        states = [_build(kernel, spec, [STREAM[i] for i in p]) for p in parts]
        order = rng.permutation(nparts)
        merged = states[order[0]]
        for j in order[1:]:
            merged = kernel.merge(merged, states[j])
        assert kernel.to_bytes(merged) == ref_bytes, nparts


def test_merge_commutative_associative():
    spec = cms.CMSSpec(rows=3, columns=1024)
    a = _build(cms, spec, STREAM[:3000])
    b = _build(cms, spec, STREAM[3000:7000])
    c = _build(cms, spec, STREAM[7000:])
    ab_c = cms.merge(cms.merge(a, b), c)
    a_bc = cms.merge(a, cms.merge(b, c))
    b_ca = cms.merge(b, cms.merge(c, a))
    assert cms.to_bytes(ab_c) == cms.to_bytes(a_bc) == cms.to_bytes(b_ca)


def test_topk_merge_value_invariance():
    """Top-K final values are partition-order independent (SURVEY.md §1.3.7).

    Guaranteed when the top-k is unambiguous (the k-th distinct count
    strictly exceeds the (k+1)-th): every partitioning's local top-k then
    contains the true top elements it saw, so the candidate union covers
    the global top-k.  With a tie plateau crossing the k boundary the
    *selection among tied elements* may differ across partitionings —
    the same stream-order dependence the reference's heap has
    (top_k.go:100-112).
    """
    skewed = [f"hot-{j:03d}" for j in range(40) for _ in range(200 - 4 * j)]
    spec = topk.TopKSpec(k=20)
    rng = np.random.default_rng(3)
    single = _build(topk, spec, skewed)
    expected = topk.values(single)
    assert [e for e, _ in expected] == [f"hot-{j:03d}" for j in range(20)]
    for nparts in (2, 5, 9):
        perm = rng.permutation(len(skewed))
        parts = np.array_split(perm, nparts)
        states = [_build(topk, spec, [skewed[i] for i in p]) for p in parts]
        order = rng.permutation(nparts)
        merged = states[order[0]]
        for j in order[1:]:
            merged = topk.merge(merged, states[j])
        assert topk.values(merged) == expected


def test_metro_mode_merge_laws():
    """Metro-hash states obey the same byte-identity-under-partitioning
    laws as murmur states (the hash only affects updates, never merges)."""
    import numpy as np

    rng = np.random.default_rng(17)
    keys = [f"k{i}" for i in range(2000)]
    for split in (1, 3, 7):
        parts = np.array_split(np.array(keys), split)
        b = bloom.new(bloom.BloomSpec.from_params(5000, 0.01, hash="metro"))
        h = hll.new(hll.HLLSpec(m=1 << 10, hash="metro"))
        c = cms.new(cms.CMSSpec(rows=3, columns=512, hash="metro"))
        for p in rng.permutation(split):
            pb = bloom.new(b.spec); bloom.update(pb, list(parts[p])); b = bloom.merge(b, pb)
            ph = hll.new(h.spec); hll.update(ph, list(parts[p])); h = hll.merge(h, ph)
            pc_ = cms.new(c.spec); cms.update(pc_, list(parts[p])); c = cms.merge(c, pc_)
        if split == 1:
            ref = (bloom.to_bytes(b), hll.to_bytes(h), cms.to_bytes(c))
        else:
            assert bloom.to_bytes(b) == ref[0]
            assert hll.to_bytes(h) == ref[1]
            assert cms.to_bytes(c) == ref[2]
