"""Reference-shaped JSON codec (gostatix ``Export``/``Import`` parity).

Mirrors the short field names of the reference's JSON serialization
(SURVEY.md §2.5):

* bloom  — {"m": size_bits, "k": num_hashes, "b": <bitset blob>}
  (bloom_filter.go:246-272); ``b`` carries the bits-and-blooms binary
  layout: 8-byte big-endian bit-length followed by big-endian uint64
  words, bit i stored in word i//64 at bit i%64 — identical in-word
  order to our packed array, so conversion is a byteswap;
* hll    — {"nr","nbp","c","r","k"} with registers base64
  (Go []uint8 marshals to base64) (hyperloglog.go:102-119);
* cms    — {"r","c","s","m","k"} with the matrix as nested arrays
  (count_min_sketch.go:94-120);
* cuckoo — {"s","bs","fpl","l","r","b":[{"s","l","e"}]} with decimal-
  string fingerprints (cuckoo_filter.go:160-218);
* topk   — {"k","er","a","s":<cms>,"h":[{"v","f"}],"hk"}
  (top_k.go:136-189).

The binary checkpoint format lives in each kernel's
``to_bytes``/``from_bytes``; this codec exists for interop/debugging and
is round-trip tested in tests/test_codec.py.

Hash-mode defaulting: imports with no ``hash`` field default to the
reference's metrohash, EXCEPT an HLL blob carrying our ``mode``
extension field (which the reference never writes) — that proves our
exporter produced it, and our pre-metro exports were murmur-hashed with
no marker.  Bloom/CMS/TopK JSON exported by this engine before the
metro change must be re-exported (they are indistinguishable from
reference blobs by design); the binary ``from_bytes`` path is
unaffected (legacy magic maps to murmur).
"""

from __future__ import annotations

import base64
import json


import numpy as np

from .kernels import bloom, cms, cuckoo, hll, topk


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------

def _bitset_to_blob(state: bloom.BloomState) -> bytes:
    """bits-and-blooms BinaryMarshal layout: BE uint64 length + BE words."""
    out = bytearray(int(state.spec.size).to_bytes(8, "big"))
    for w in state.bits:
        out += int(w).to_bytes(8, "big")
    return bytes(out)


def _bitset_from_blob(blob: bytes) -> tuple[int, np.ndarray]:
    size = int.from_bytes(blob[:8], "big")
    words = np.frombuffer(blob[8:], dtype=">u8").astype(np.uint64)
    return size, words


def export_bloom(state: bloom.BloomState) -> bytes:
    return json.dumps(
        {
            "m": state.spec.size,
            "k": state.spec.num_hashes,
            "b": base64.b64encode(_bitset_to_blob(state)).decode(),
            # "hash" marker only for the non-reference hash: a metro-mode
            # export carries EXACTLY the reference's field set (interop)
            **({"hash": "murmur"} if state.spec.hash == "murmur" else {}),
        }
    ).encode()


def import_bloom(data: bytes) -> bloom.BloomState:
    d = json.loads(data)
    size, words = _bitset_from_blob(base64.b64decode(d["b"]))
    if size != d["m"]:
        raise ValueError(f"bloom bitset length {size} != m {d['m']}")
    return bloom.BloomState(
        bloom.BloomSpec(size=d["m"], num_hashes=d["k"], hash=d.get("hash", "metro")), words
    )


# ---------------------------------------------------------------------------
# hll
# ---------------------------------------------------------------------------

def export_hll(state: hll.HLLState) -> bytes:
    m = state.spec.m
    return json.dumps(
        {
            "nr": m,
            "nbp": state.spec.b,  # numBytesPerHash = log2(numRegisters) (base_hyperloglog.go:55)
            "c": hll._alpha(m),
            "r": base64.b64encode(state.registers.tobytes()).decode(),
            "k": "",
            "mode": state.spec.mode,  # our extension (absent => compat)
            **({"hash": "murmur"} if state.spec.hash == "murmur" else {}),
        }
    ).encode()


def import_hll(data: bytes) -> hll.HLLState:
    d = json.loads(data)
    reg = np.frombuffer(base64.b64decode(d["r"]), dtype=np.uint8).copy()
    # Legacy-default disambiguation: the reference never writes "mode",
    # so its presence proves OUR exporter produced the blob — and our
    # pre-metro exports were murmur-hashed with no "hash" marker.
    default_hash = "murmur" if "mode" in d else "metro"
    spec = hll.HLLSpec(m=d["nr"], mode=d.get("mode", "compat"), hash=d.get("hash", default_hash))
    if len(reg) != spec.m:
        raise ValueError("register array length != nr")
    return hll.HLLState(spec, reg)


# ---------------------------------------------------------------------------
# cms
# ---------------------------------------------------------------------------

def export_cms(state: cms.CMSState) -> bytes:
    return json.dumps(
        {
            "r": state.spec.rows,
            "c": state.spec.columns,
            "s": state.all_sum,
            "m": state.matrix.tolist(),
            "k": "",
            **({"hash": "murmur"} if state.spec.hash == "murmur" else {}),
        }
    ).encode()


def import_cms(data: bytes) -> cms.CMSState:
    d = json.loads(data)
    mat = np.array(d["m"], dtype=np.uint64).reshape(d["r"], d["c"])
    return cms.CMSState(
        cms.CMSSpec(rows=d["r"], columns=d["c"], hash=d.get("hash", "metro")), mat, d["s"]
    )


# ---------------------------------------------------------------------------
# cuckoo
# ---------------------------------------------------------------------------

def export_cuckoo(state: cuckoo.CuckooState) -> bytes:
    buckets = []
    for row in state.buckets:
        elements = [str(int(fp)) for fp in row if fp != cuckoo.EMPTY]
        buckets.append({"s": state.spec.bucket_size, "l": len(elements), "e": elements})
    return json.dumps(
        {
            "s": state.spec.size,
            "bs": state.spec.bucket_size,
            "fpl": state.spec.fp_length,
            "l": state.length,
            "r": state.spec.retries,
            "b": buckets,
        }
    ).encode()


def import_cuckoo(data: bytes) -> cuckoo.CuckooState:
    d = json.loads(data)
    spec = cuckoo.CuckooSpec(size=d["s"], bucket_size=d["bs"], fp_length=d["fpl"], retries=d["r"])
    state = cuckoo.new(spec)
    for i, b in enumerate(d["b"]):
        for j, el in enumerate(b["e"]):
            state.buckets[i][j] = np.uint64(int(el))
    state.length = d["l"]
    return state


# ---------------------------------------------------------------------------
# topk
# ---------------------------------------------------------------------------

def export_topk(state: topk.TopKState) -> bytes:
    return json.dumps(
        {
            "k": state.spec.k,
            "er": state.spec.error_rate,
            "a": state.spec.accuracy,
            "s": json.loads(export_cms(state.cms)),
            "h": [{"v": v, "f": f} for v, f in sorted(state.candidates.items())],
            "hk": "",
        }
    ).encode()


def import_topk(data: bytes) -> topk.TopKState:
    d = json.loads(data)
    cms_state = import_cms(json.dumps(d["s"]).encode())
    cand = {e["v"]: e["f"] for e in d["h"]}
    return topk.TopKState(
        topk.TopKSpec(k=d["k"], error_rate=d["er"], accuracy=d["a"], hash=cms_state.spec.hash),
        cms_state,
        cand,
    )


EXPORTERS = {
    "bloom": (export_bloom, import_bloom),
    "hll": (export_hll, import_hll),
    "cms": (export_cms, import_cms),
    "cuckoo": (export_cuckoo, import_cuckoo),
    "topk": (export_topk, import_topk),
}


def export_json(kind: str, state) -> bytes:
    return EXPORTERS[kind][0](state)


def import_json(kind: str, data: bytes):
    return EXPORTERS[kind][1](data)
