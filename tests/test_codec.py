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
