"""Reference binary WriteTo/ReadFrom stream framing round-trips
(bloom_filter.go:279-320, hyperloglog.go:124-172,
count_min_sketch.go:156-218, cuckoo_filter.go:223-297,
top_k.go:216-301)."""

import numpy as np

from gostatix_ray import stream_codec as sc
from gostatix_ray.kernels import bloom, cms, cuckoo, hll, topk


def test_bloom_stream_roundtrip():
    s = bloom.new(bloom.BloomSpec.from_params(1000, 0.01, hash="metro"))
    bloom.update(s, [f"k{i}" for i in range(100)])
    blob = sc.write_stream("bloom", s)
    rt, used = sc.read_stream("bloom", blob)
    assert used == len(blob)
    assert bloom.equals(rt, s) and rt.spec.hash == "metro"
    # header layout: BE size / numHashes / bitset size / bit length
    import struct

    size, k, bs, bl = struct.unpack_from(">QQQQ", blob, 0)
    assert size == s.spec.size == bs == bl and k == s.spec.num_hashes


def test_hll_stream_roundtrip():
    s = hll.new(hll.HLLSpec(m=1 << 10, mode="compat", hash="metro"))
    hll.update(s, [f"u{i}" for i in range(500)])
    blob = sc.write_stream("hll", s)
    assert len(blob) == 24 + s.spec.m
    rt, used = sc.read_stream("hll", blob)
    assert used == len(blob) and hll.equals(rt, s)


def test_cms_stream_roundtrip():
    s = cms.new(cms.CMSSpec(rows=4, columns=512, hash="metro"))
    cms.update(s, ["a", "b", "a"], counts=[2, 1, 3])
    blob = sc.write_stream("cms", s)
    rt, used = sc.read_stream("cms", blob)
    assert used == len(blob) and cms.equals(rt, s) and rt.all_sum == 6


def test_cuckoo_stream_roundtrip_nonfull_buckets():
    # non-full buckets exercise the reference writeTo/readFrom asymmetry
    # we adjudicate (module docstring): every slot framed, empties len-0
    spec = cuckoo.CuckooSpec(size=64, bucket_size=4, fp_length=8, retries=50)
    s = cuckoo.new(spec)
    cuckoo.insert_batch(s, [f"item-{i}" for i in range(40)])
    blob = sc.write_stream("cuckoo", s)
    rt, used = sc.read_stream("cuckoo", blob)
    assert used == len(blob)
    assert rt.length == s.length
    assert np.array_equal(rt.buckets, s.buckets)
    assert cuckoo.lookup_batch(rt, ["item-0", "item-39", "nope"]).tolist() == [True, True, False]


def test_topk_stream_roundtrip():
    s = topk.new(topk.TopKSpec(k=3, hash="metro"))
    topk.update(s, ["x"] * 5 + ["y"] * 3 + ["z"] * 2 + ["w"])
    blob = sc.write_stream("topk", s)
    rt, used = sc.read_stream("topk", blob)
    assert used == len(blob)
    assert topk.values(rt) == topk.values(s)
    assert rt.spec.hash == "metro" and rt.cms.spec.hash == "metro"


def test_topk_pads_to_k_entries():
    s = topk.new(topk.TopKSpec(k=5))
    topk.update(s, ["only"])
    blob = sc.write_stream("topk", s)
    rt, used = sc.read_stream("topk", blob, hash_mode="murmur")
    assert used == len(blob)
    assert [e for e, _ in topk.values(rt)] == ["only"]


def test_fuzz_roundtrips_all_kinds():
    """Randomized states round-trip exactly through the reference stream
    framing for every structure and both hash modes."""
    rng = np.random.default_rng(11)
    for trial in range(20):
        hash_mode = "metro" if trial % 2 else "murmur"
        keys = [f"k{rng.integers(0, 1 << 30)}" for _ in range(int(rng.integers(1, 400)))]
        b = bloom.new(bloom.BloomSpec.from_params(int(rng.integers(100, 5000)), 0.01, hash=hash_mode))
        bloom.update(b, keys)
        rt, used = sc.read_stream("bloom", sc.write_stream("bloom", b), hash_mode=hash_mode)
        assert bloom.equals(rt, b) and used > 0
        h = hll.new(hll.HLLSpec(m=1 << int(rng.integers(4, 12)), hash=hash_mode))
        hll.update(h, keys)
        rt, _ = sc.read_stream("hll", sc.write_stream("hll", h), hash_mode=hash_mode, mode="standard")
        assert hll.equals(rt, h)
        c = cms.new(cms.CMSSpec(rows=int(rng.integers(1, 6)), columns=int(rng.integers(16, 512)), hash=hash_mode))
        cms.update(c, keys, counts=rng.integers(1, 100, len(keys)))
        rt, _ = sc.read_stream("cms", sc.write_stream("cms", c), hash_mode=hash_mode)
        assert cms.equals(rt, c) and rt.all_sum == c.all_sum
        t = topk.new(topk.TopKSpec(k=int(rng.integers(1, 8)), hash=hash_mode))
        topk.update(t, keys)
        rt, _ = sc.read_stream("topk", sc.write_stream("topk", t), hash_mode=hash_mode)
        assert topk.values(rt) == topk.values(t)
        ck = cuckoo.new(cuckoo.CuckooSpec(size=64, bucket_size=4, fp_length=8, retries=100))
        cuckoo.insert_batch(ck, keys[:100])
        rt, _ = sc.read_stream("cuckoo", sc.write_stream("cuckoo", ck))
        assert np.array_equal(rt.buckets, ck.buckets) and rt.length == ck.length


def test_hll_stream_nbp_is_log2_m():
    """numBytesPerHash on the wire must equal log2(numRegisters)
    (base_hyperloglog.go:55) — the reference uses the imported value
    directly in getRegisterIndexAndCount, so 64-b corrupts every
    subsequent Update/Count on the Go side."""
    import struct

    for m in (16, 128, 1 << 14):
        s = hll.new(hll.HLLSpec(m=m))
        blob = sc.write_stream("hll", s)
        _m, nbp, _bias = struct.unpack_from(">QQd", blob, 0)
        assert _m == m
        assert nbp == int(np.log2(m)) == s.spec.b


def test_topk_stream_heap_order_is_frequency_ascending():
    """The reference's ReadFrom appends entries in stream order with no
    heap.Init, and minHeap.Less is frequency-ascending (top_k.go:33-35):
    a frequency-ascending array is the only Go-safe emit order."""
    import struct

    s = topk.new(topk.TopKSpec(k=4))
    topk.update(s, ["a"] * 7 + ["b"] * 4 + ["c"] * 9 + ["d"] * 2 + ["e"] * 1)
    blob = sc.write_stream("topk", s)
    # skip header (3x8) + embedded cms (3x8 header + rows*cols*8)
    off = 24
    rows, cols, _ = struct.unpack_from(">QQQ", blob, off)
    off += 24 + 8 * rows * cols
    freqs = []
    for _ in range(4):
        (ln,) = struct.unpack_from(">Q", blob, off)
        off += 8 + ln
        (f,) = struct.unpack_from(">Q", blob, off)
        off += 8
        freqs.append(f)
    assert freqs == sorted(freqs), "stream must be a valid Go min-heap array"
    # round-trip still recovers the same top-k values
    rt, _ = sc.read_stream("topk", blob, hash_mode="murmur")
    assert topk.values(rt) == topk.values(s)
