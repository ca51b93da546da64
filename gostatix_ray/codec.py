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
    """bits-and-blooms ``BitSet.WriteTo`` layout: BE uint64 bit-length +
    BE uint64 words (bitset_mem.go:108-119 wraps this for streams)."""
    out = bytearray(int(state.spec.size).to_bytes(8, "big"))
    for w in state.bits:
        out += int(w).to_bytes(8, "big")
    return bytes(out)


def _bitset_from_blob(blob: bytes) -> tuple[int, np.ndarray]:
    size = int.from_bytes(blob[:8], "big")
    words = np.frombuffer(blob[8:], dtype=">u8").astype(np.uint64)
    return size, words


def export_bloom(state: bloom.BloomState) -> bytes:
    # The reference's "b" field is DOUBLE-encoded (bloom_filter.go:253-259
    # + bitset_mem.go:72-78): BitSet.MarshalJSON returns the bytes of a
    # JSON-QUOTED URL-base64 string of the WriteTo frame, and Go's
    # encoding/json then std-base64-encodes those bytes into the []byte
    # field.  A single std-base64 of the raw frame (our pre-round-4
    # layout) is unreadable by the Go importer and vice versa.
    inner = b'"' + base64.urlsafe_b64encode(_bitset_to_blob(state)) + b'"'
    return json.dumps(
        {
            "m": state.spec.size,
            "k": state.spec.num_hashes,
            "b": base64.b64encode(inner).decode(),
            # "hash" marker only for the non-reference hash: a metro-mode
            # export carries EXACTLY the reference's field set (interop)
            **({"hash": "murmur"} if state.spec.hash == "murmur" else {}),
        }
    ).encode()


def import_bloom(data: bytes) -> bloom.BloomState:
    d = json.loads(data)
    blob = base64.b64decode(d["b"])
    if blob[:1] == b'"':  # reference layout: JSON-quoted URL-base64
        blob = base64.urlsafe_b64decode(blob[1:-1])
    size, words = _bitset_from_blob(blob)
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
    # bucket.getElements() returns ALL slots, empty ones as ""
    # (bucket_mem.go:42-44); "l" is the OCCUPIED count (getLength)
    buckets = []
    for row in state.buckets:
        elements = [str(int(fp)) if fp != cuckoo.EMPTY else "" for fp in row]
        n_occ = int(sum(1 for fp in row if fp != cuckoo.EMPTY))
        buckets.append({"s": state.spec.bucket_size, "l": n_occ, "e": elements})
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
        # mirror the reference's Import: bucket.add(el) skips "" (empty
        # slots — cuckoo_filter.go:207-214, bucket_mem.go:57-60) and
        # compacts occupied fingerprints into the first free slots
        j = 0
        for el in b["e"]:
            if el == "":
                continue
            state.buckets[i][j] = np.uint64(int(el))
            j += 1
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
            # the reference marshals its live min-heap (<= k entries,
            # heap-ordered by frequency ascending) and Import rebuilds it
            # in array order with no heap.Init (top_k.go:159-180): emit
            # the top-k selection frequency-ASCENDING — a valid min-heap
            # — never the name-sorted, uncapped candidate table (which
            # would break Go-side Insert gating and Values() sizing)
            "h": [
                {"v": v, "f": f}
                for v, f in sorted(
                    sorted(state.candidates.items(), key=lambda kv: (-kv[1], kv[0]))[: state.spec.k],
                    key=lambda kv: (kv[1], kv[0]),
                )
            ],
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
