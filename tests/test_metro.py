"""MetroHash128 kernel + hash="metro" sketch compat mode.

The reference hashes bloom/HLL/CMS/top-k keys with metro.Hash128(data,
1373) (bloom_filter.go:322-325, base_hyperloglog.go:85,
base_count_min_sketch.go:54).  What we pin: the OFFICIAL published
MetroHash128 test vectors (testvector.h, seeds 0 and 1 — the canonical
no-length-fold variant, now the default), scalar == vectorized on
randomized inputs, golden self-vectors (regression), and the
reference's statistical oracles re-validated under metro mode.
go-metro's own fold choice remains offline-unverifiable (flag kept).
"""

import numpy as np
import pytest

from gostatix_ray.kernels import bloom, cms, hll, topk
from gostatix_ray.metro import metro_hash128, metrohash128


def test_scalar_equals_vectorized_randomized():
    rng = np.random.default_rng(3)
    vals = [bytes(rng.integers(0, 256, int(rng.integers(0, 201)), dtype=np.uint8)) for _ in range(300)]
    for seed in (0, 1373):
        h1, h2 = metro_hash128(vals, seed)
        for i, v in enumerate(vals):
            assert metrohash128(v, seed) == (int(h1[i]), int(h2[i])), (seed, i, len(v))


def test_scalar_equals_vectorized_arrow_strings():
    import pyarrow as pa

    vals = ["", "a", "hello world", "x" * 31, "y" * 32, "z" * 33, "w" * 64, "v" * 100]
    arr = pa.array(vals)
    h1, h2 = metro_hash128(arr, 1373)
    for i, v in enumerate(vals):
        assert metrohash128(v.encode(), 1373) == (int(h1[i]), int(h2[i]))


def test_published_golden_vectors():
    """THE official MetroHash128 test vectors (testvector.h of the
    public jandrewrogers/MetroHash repository): the 63-byte numeric key
    at seeds 0 and 1.  Byte order follows the C++ reference (two
    little-endian u64 words).  Two independent 128-bit matches pin the
    canonical (no-length-fold) variant beyond transcription error."""
    key63 = b"012345678901234567890123456789012345678901234567890123456789012"
    for seed, expect_hex in (
        (0, "C77CE2BFA4ED9F9B0548B2AC5074A297"),
        (1, "45A3CDB838199D7FBDD68D867A14ECEF"),
    ):
        h1, h2 = metrohash128(key63, seed, fold_len=False)
        got = (h1.to_bytes(8, "little") + h2.to_bytes(8, "little")).hex().upper()
        assert got == expect_hex, (seed, got)


def test_golden_self_vectors():
    """Regression pins for THIS implementation under the (canonical)
    default — protect against accidental kernel drift."""
    assert metrohash128(b"", 0) == (0x0005F3CA3D41D1CB, 0x4606B14684C65FB6)
    key63 = b"012345678901234567890123456789012345678901234567890123456789012"
    assert metrohash128(key63, 0) == (0x9B9FEDA4BFE27CC7, 0x97A27450ACB24805)
    assert metrohash128(b"hello", 1373) == (0x28C1D966ADD82CA1, 0x0F4D023CB5BCA3DE)
    # the standalone fold variant stays pinned behind its flag
    assert metrohash128(key63, 0, fold_len=True) == (0x064D600BBDFE08B3, 0x0883690033D117BB)
    assert metrohash128(b"hello", 1373, fold_len=True) == (0xBDA391C6E28C9362, 0xA3DD78462948DC2D)


def test_hll_100_plus_minus_2_under_metro():
    # hyperloglog_test.go's statistical oracle, re-run under hash="metro"
    s = hll.new(hll.HLLSpec(m=1 << 14, hash="metro"))
    hll.update(s, [f"user-{i}" for i in range(100)])
    assert abs(hll.count(s) - 100) <= 2


def test_bloom_fpp_and_membership_under_metro():
    spec = bloom.BloomSpec.from_params(10000, 0.01, hash="metro")
    s = bloom.new(spec)
    keys = [f"k{i}" for i in range(10000)]
    bloom.update(s, keys)
    assert bloom.contains(s, keys).all()  # no false negatives
    neg = bloom.contains(s, [f"other{i}" for i in range(10000)])
    assert neg.mean() <= 1.5 * 0.01  # FPP near configured
    assert bloom.positive_rate(s) <= 1.1 * 0.01


def test_cms_exact_small_counts_under_metro():
    s = cms.new(cms.CMSSpec.from_error_rate(0.001, 0.01, hash="metro"))
    cms.update(s, ["a", "b", "a", "c"], counts=[2, 3, 1, 5])
    got = cms.count(s, ["a", "b", "c"])
    assert list(got) == [3, 3, 5]  # exact at this load (overestimate-only)


def test_topk_under_metro():
    s = topk.new(topk.TopKSpec(k=2, hash="metro"))
    topk.update(s, ["x"] * 5 + ["y"] * 3 + ["z"])
    assert [e for e, _ in topk.values(s)] == ["x", "y"]
    assert s.cms.spec.hash == "metro"


def test_metro_state_roundtrip_and_spec_isolation():
    # metro and murmur states never merge (spec mismatch), and binary
    # round-trips preserve the hash mode
    a = bloom.new(bloom.BloomSpec.from_params(100, 0.01, hash="metro"))
    b = bloom.new(bloom.BloomSpec.from_params(100, 0.01))
    with pytest.raises(ValueError):
        bloom.merge(a, b)
    bloom.update(a, ["q"])
    rt = bloom.from_bytes(bloom.to_bytes(a))
    assert rt.spec.hash == "metro" and bloom.equals(rt, a)
    c = cms.new(cms.CMSSpec(rows=2, columns=64, hash="metro"))
    cms.update(c, ["q"])
    rt = cms.from_bytes(cms.to_bytes(c))
    assert rt.spec.hash == "metro" and cms.equals(rt, c)
    h = hll.new(hll.HLLSpec(m=256, mode="compat", hash="metro"))
    hll.update(h, ["q", "r"])
    rt = hll.from_bytes(hll.to_bytes(h))
    assert rt.spec.hash == "metro" and rt.spec.mode == "compat" and hll.equals(rt, h)


def test_metro_differs_from_murmur():
    # sanity: the two modes really produce different states
    a = bloom.new(bloom.BloomSpec(size=1024, num_hashes=3, hash="metro"))
    b = bloom.new(bloom.BloomSpec(size=1024, num_hashes=3))
    bloom.update(a, ["same-key"])
    bloom.update(b, ["same-key"])
    assert not np.array_equal(a.bits, b.bits)


def test_fold_len_variants_scalar_equals_vector():
    """Both initializer variants: scalar == vectorized, bit for bit."""
    import numpy as np
    import pyarrow as pa

    from gostatix_ray.metro import metro_hash128, metrohash128

    rng = np.random.default_rng(9)
    data = [bytes(rng.integers(0, 256, rng.integers(0, 200)).astype(np.uint8))
            for _ in range(200)]
    col = pa.array(data, pa.binary())
    for fold in (True, False):
        h1, h2 = metro_hash128(col, 1373, fold_len=fold)
        for i, d in enumerate(data):
            s1, s2 = metrohash128(d, 1373, fold_len=fold)
            assert (int(h1[i]), int(h2[i])) == (s1, s2), (fold, i, len(d))


def test_fold_len_variants_differ():
    """The two variants must actually produce different hashes on
    non-empty input (guards against the flag silently no-opping)."""
    from gostatix_ray.metro import metrohash128

    for d in (b"x", b"0123456789abcdef", b"a" * 32, b"a" * 100):
        assert metrohash128(d, 1373, fold_len=True) != metrohash128(d, 1373, fold_len=False), d
    # len 0: the fold adds 0, so the variants coincide by construction
    assert metrohash128(b"", 1373, fold_len=True) == metrohash128(b"", 1373, fold_len=False)


def test_default_variant_is_canonical_metrohash128():
    from gostatix_ray import metro

    assert metro.DEFAULT_FOLD_LEN is False
    assert metro.metrohash128(b"abc", 1373) == metro.metrohash128(b"abc", 1373, fold_len=False)
