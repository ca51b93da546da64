"""Reference-shaped JSON codec round-trips (Export/Import parity, SURVEY.md §2.5)."""

import json

import numpy as np

from gostatix_ray import codec
from gostatix_ray.kernels import bloom, cms, cuckoo, hll, topk


def test_bloom_json_roundtrip():
    s = bloom.new(bloom.BloomSpec.from_params(500, 0.01))
    bloom.update(s, ["alpha", "beta"])
    blob = codec.export_bloom(s)
    d = json.loads(blob)
    assert set(d) == {"m", "k", "b", "hash"}  # reference fields + murmur marker
    s2 = codec.import_bloom(blob)
    assert bloom.equals(s, s2)


def test_hll_json_roundtrip():
    s = hll.new(hll.HLLSpec(m=256, mode="compat"))
    hll.update(s, [str(i) for i in range(100)])
    blob = codec.export_hll(s)
    d = json.loads(blob)
    assert {"nr", "nbp", "c", "r", "k"} <= set(d)  # hyperloglog.go:102-105
    s2 = codec.import_hll(blob)
    assert hll.equals(s, s2)
    assert hll.count(s2) == hll.count(s)


def test_cms_json_roundtrip():
    s = cms.new(cms.CMSSpec(rows=3, columns=64))
    cms.update(s, ["x", "x", "y"])
    blob = codec.export_cms(s)
    d = json.loads(blob)
    assert set(d) == {"r", "c", "s", "m", "k", "hash"}  # reference fields + murmur marker
    s2 = codec.import_cms(blob)
    assert cms.equals(s, s2)
    assert s2.all_sum == 3


def test_cuckoo_json_roundtrip():
    s = cuckoo.new(cuckoo.CuckooSpec.from_error_rate(20, 4, 500, 0.01))
    cuckoo.insert_batch(s, ["alice", "bob"])
    blob = codec.export_cuckoo(s)
    d = json.loads(blob)
    assert {"s", "bs", "fpl", "l", "r", "b"} == set(d)  # cuckoo_filter.go:169-174
    assert all(isinstance(e, str) for b in d["b"] for e in b["e"])  # decimal-string fps
    s2 = codec.import_cuckoo(blob)
    assert s2.length == 2
    assert cuckoo.lookup_batch(s2, ["alice", "bob"]).all()


def test_topk_json_roundtrip():
    s = topk.new(topk.TopKSpec(k=3))
    topk.update(s, ["a", "a", "b", "c", "c", "c"])
    blob = codec.export_topk(s)
    d = json.loads(blob)
    assert {"k", "er", "a", "s", "h", "hk"} == set(d)  # top_k.go:144-149
    s2 = codec.import_topk(blob)
    assert topk.values(s2) == topk.values(s)


def test_generic_dispatch():
    s = hll.new(hll.HLLSpec(m=64))
    hll.update(s, ["q"])
    s2 = codec.import_json("hll", codec.export_json("hll", s))
    assert hll.equals(s, s2)


def test_hll_json_nbp_is_log2_m():
    """'nbp' = log2(numRegisters) (base_hyperloglog.go:55), not 64-b."""
    s = hll.new(hll.HLLSpec(m=256))
    d = json.loads(codec.export_json("hll", s))
    assert d["nbp"] == 8 == s.spec.b


def test_hll_json_legacy_hash_defaults():
    """A blob with our 'mode' extension but no 'hash' marker is one of OUR
    pre-metro exports => default murmur; a reference-shaped blob (no
    'mode') defaults metro."""
    s = hll.new(hll.HLLSpec(m=64, hash="murmur"))
    hll.update(s, ["x", "y"])
    d = json.loads(codec.export_json("hll", s))
    d.pop("hash", None)  # simulate a pre-metro-change export
    legacy = codec.import_json("hll", json.dumps(d).encode())
    assert legacy.spec.hash == "murmur"
    d.pop("mode")  # reference-shaped blob
    ref = codec.import_json("hll", json.dumps(d).encode())
    assert ref.spec.hash == "metro"


def test_import_cuckoo_go_style_empty_slots():
    """The reference exports ALL bucket slots, empty ones as ""
    (bucket_mem.go:42-44) — import must skip them like Go's add("")
    no-op, not crash on int("") (round-4 review finding)."""
    import json

    from gostatix_ray import codec
    from gostatix_ray.kernels import cuckoo

    blob = json.dumps({
        "s": 4, "bs": 2, "fpl": 8, "l": 2, "r": 10,
        "b": [
            {"s": 2, "l": 1, "e": ["37", ""]},
            {"s": 2, "l": 0, "e": ["", ""]},
            {"s": 2, "l": 1, "e": ["", "99"]},  # occupied slot compacts to front
            {"s": 2, "l": 0, "e": ["", ""]},
        ],
    }).encode()
    st = codec.import_cuckoo(blob)
    assert st.length == 2
    assert int(st.buckets[0][0]) == 37
    assert int(st.buckets[2][0]) == 99  # compacted, Go add() semantics


def test_export_cuckoo_emits_all_slots():
    import json

    from gostatix_ray import codec
    from gostatix_ray.kernels import cuckoo

    spec = cuckoo.CuckooSpec(size=8, bucket_size=4, fp_length=8, retries=10)
    st = cuckoo.new(spec)
    cuckoo.insert_batch(st, ["a", "b"])
    d = json.loads(codec.export_cuckoo(st))
    for b in d["b"]:
        assert len(b["e"]) == 4  # every slot, "" for empty
        assert b["l"] == sum(1 for e in b["e"] if e != "")
    st2 = codec.import_cuckoo(codec.export_cuckoo(st))
    assert cuckoo.lookup_batch(st2, ["a", "b"]).all()


def test_bloom_json_reference_double_encoding():
    """The reference's "b" field is base64(JSON-quoted URL-base64 of the
    BitSet.WriteTo frame) — bloom_filter.go:253-259 + bitset_mem.go:72-78
    (round-4 review finding: we emitted a single std-base64)."""
    import base64
    import json

    from gostatix_ray import codec
    from gostatix_ray.kernels import bloom

    spec = bloom.BloomSpec.from_params(100, 0.01)
    st = bloom.new(spec)
    bloom.update(st, ["x", "y", "z"])
    d = json.loads(codec.export_bloom(st))
    inner = base64.b64decode(d["b"])
    assert inner[:1] == b'"' and inner[-1:] == b'"'  # JSON-quoted string bytes
    frame = base64.urlsafe_b64decode(inner[1:-1])
    assert int.from_bytes(frame[:8], "big") == spec.size  # WriteTo bit-length
    st2 = codec.import_bloom(codec.export_bloom(st))
    assert bloom.equals(st, st2)
    assert bloom.contains(st2, ["x", "y", "z"]).all()


def test_export_topk_heap_is_min_heap_and_capped():
    """Go Import rebuilds the heap in array order with no heap.Init
    (top_k.go:167-180): the exported "h" must be frequency-ascending and
    hold at most k entries (round-4 review finding)."""
    import json

    from gostatix_ray import codec
    from gostatix_ray.kernels import topk

    spec = topk.TopKSpec(k=2)
    st = topk.new(spec)
    topk.update(st, ["a"] * 100 + ["b"] * 1 + ["c"] * 50)
    d = json.loads(codec.export_topk(st))
    freqs = [e["f"] for e in d["h"]]
    assert len(d["h"]) <= 2
    assert freqs == sorted(freqs)  # valid min-heap in array order
    assert {e["v"] for e in d["h"]} == {"a", "c"}  # the true top-2
