"""Reference binary WriteTo/ReadFrom stream parity (SURVEY.md §2.5).

Byte-level re-creation of the reference's big-endian stream framing:

* bloom  — u64 size, u64 numHashes, then the BitSetMem frame: u64 size
  again, then bits-and-blooms ``BitSet.WriteTo``: u64 bit-length + BE
  uint64 words (bloom_filter.go:279-320, bitset_mem.go:110-137).
* hll    — u64 numRegisters, u64 numBytesPerHash, f64 correctionBias,
  raw registers bytes (hyperloglog.go:124-172).
* cms    — u64 rows, u64 columns, u64 allSum, rows×columns BE uint64
  (count_min_sketch.go:156-218).
* cuckoo — u64 size, bucketSize, fingerPrintLength, length, retries,
  then per bucket: u64 size, u64 length, and one (u64 len + bytes)
  entry PER SLOT — the reference's writeTo emits every slot including
  empties (bucket_mem.go:116-139) while its readFrom consumes only
  ``length`` entries (bucket_mem.go:144-175), which desyncs the stream
  for non-full buckets — a reference bug.  Adjudication: we WRITE the
  reference's exact writeTo layout and our READER consumes one entry
  per slot (the layout actually on the wire), so our round-trip is
  lossless and a Go-written stream reads correctly in all cases too
  (Go's writeTo is the source of truth for what's on the wire).
* topk   — u64 k, f64 errorRate, f64 accuracy, embedded cms stream,
  then k × (u64 len, value bytes, u64 frequency) (top_k.go:216-301).
  The reference iterates its private heap array order; we emit our
  canonical (count desc, element asc) order — same set, deterministic.

Hash note: these streams carry no hash-mode field (the reference knows
only metrohash).  ``read_stream`` therefore defaults specs to
``hash="metro"``; pass ``hash_mode="murmur"`` for engine-native states.
"""

from __future__ import annotations

import struct

import numpy as np

from .kernels import bloom, cms, cuckoo, hll, topk


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------

def write_bloom(state: bloom.BloomState) -> bytes:
    size = int(state.spec.size)
    words = np.ascontiguousarray(state.bits, dtype=np.uint64).astype(">u8")
    return (
        struct.pack(">QQ", size, state.spec.num_hashes)
        + struct.pack(">Q", size)  # BitSetMem.size
        + struct.pack(">Q", size)  # bits-and-blooms BitSet length (bits)
        + words.tobytes()
    )


def read_bloom(data: bytes, hash_mode: str = "metro") -> tuple[bloom.BloomState, int]:
    size, k, bs_size, bb_len = struct.unpack_from(">QQQQ", data, 0)
    if bs_size != size or bb_len != size:
        raise ValueError("inconsistent bloom stream lengths")
    nwords = (size + 63) // 64
    off = 32
    words = np.frombuffer(data, dtype=">u8", count=nwords, offset=off).astype(np.uint64)
    off += 8 * nwords
    return bloom.BloomState(bloom.BloomSpec(size=size, num_hashes=k, hash=hash_mode), words), off


# ---------------------------------------------------------------------------
# hll
# ---------------------------------------------------------------------------

def write_hll(state: hll.HLLState) -> bytes:
    m = state.spec.m
    # numBytesPerHash = log2(numRegisters) = b (base_hyperloglog.go:55);
    # the reference uses it directly in getRegisterIndexAndCount, so a
    # wrong value silently mis-indexes registers after a Go-side import.
    nbp = state.spec.b
    return (
        struct.pack(">QQd", m, nbp, hll._alpha(m))
        + state.registers.tobytes()
    )


def read_hll(data: bytes, hash_mode: str = "metro", mode: str = "compat") -> tuple[hll.HLLState, int]:
    m, _nbp, _bias = struct.unpack_from(">QQd", data, 0)
    off = 24
    reg = np.frombuffer(data, dtype=np.uint8, count=m, offset=off).copy()
    off += m
    return hll.HLLState(hll.HLLSpec(m=m, mode=mode, hash=hash_mode), reg), off


# ---------------------------------------------------------------------------
# cms
# ---------------------------------------------------------------------------

def write_cms(state: cms.CMSState) -> bytes:
    mat = np.ascontiguousarray(state.matrix, dtype=np.uint64).astype(">u8")
    return struct.pack(">QQQ", state.spec.rows, state.spec.columns, state.all_sum) + mat.tobytes()


def read_cms(data: bytes, hash_mode: str = "metro") -> tuple[cms.CMSState, int]:
    rows, cols, all_sum = struct.unpack_from(">QQQ", data, 0)
    off = 24
    mat = np.frombuffer(data, dtype=">u8", count=rows * cols, offset=off).astype(np.uint64).reshape(rows, cols)
    off += 8 * rows * cols
    return cms.CMSState(cms.CMSSpec(rows=rows, columns=cols, hash=hash_mode), mat, all_sum), off


# ---------------------------------------------------------------------------
# cuckoo
# ---------------------------------------------------------------------------

def write_cuckoo(state: cuckoo.CuckooState) -> bytes:
    spec = state.spec
    out = [struct.pack(">QQQQQ", spec.size, spec.bucket_size, spec.fp_length, state.length, spec.retries)]
    for row in state.buckets:
        out.append(struct.pack(">QQ", spec.bucket_size, int((row != cuckoo.EMPTY).sum())))
        for fp in row:  # EVERY slot, empties as len-0 (bucket_mem.go:116-139)
            if fp == cuckoo.EMPTY:
                out.append(struct.pack(">Q", 0))
            else:
                raw = str(int(fp)).encode()
                out.append(struct.pack(">Q", len(raw)))
                out.append(raw)
    return b"".join(out)


def read_cuckoo(data: bytes) -> tuple[cuckoo.CuckooState, int]:
    size, bucket_size, fpl, length, retries = struct.unpack_from(">QQQQQ", data, 0)
    off = 40
    spec = cuckoo.CuckooSpec(size=size, bucket_size=bucket_size, fp_length=fpl, retries=retries)
    state = cuckoo.new(spec)
    for i in range(size):
        _bsize, _blen = struct.unpack_from(">QQ", data, off)
        off += 16
        for j in range(bucket_size):
            (ln,) = struct.unpack_from(">Q", data, off)
            off += 8
            if ln:
                state.buckets[i][j] = np.uint64(int(data[off : off + ln].decode()))
                off += ln
    state.length = length
    return state, off


# ---------------------------------------------------------------------------
# topk
# ---------------------------------------------------------------------------

def write_topk(state: topk.TopKState) -> bytes:
    out = [struct.pack(">Qdd", state.spec.k, state.spec.error_rate, state.spec.accuracy)]
    out.append(write_cms(state.cms))
    # Top-k selection first (count desc, element asc), then emit
    # frequency-ASCENDING: the reference's ReadFrom appends entries in
    # stream order with no heap.Init, and minHeap.Less orders by
    # frequency ascending (top_k.go:33-35) — an ascending array is a
    # valid min-heap, so Go-side heap.Push/Pop behaves after import.
    selected = sorted(state.candidates.items(), key=lambda kv: (-kv[1], kv[0]))[: state.spec.k]
    entries = sorted(selected, key=lambda kv: (kv[1], kv[0]))
    while len(entries) < state.spec.k:  # Go always writes exactly k heap slots
        entries.insert(0, ("", 0))  # empty slots have frequency 0 → heap front
    for el, freq in entries:
        raw = el.encode()
        out.append(struct.pack(">Q", len(raw)))
        out.append(raw)
        out.append(struct.pack(">Q", freq))
    return b"".join(out)


def read_topk(data: bytes, hash_mode: str = "metro") -> tuple[topk.TopKState, int]:
    k, err, acc = struct.unpack_from(">Qdd", data, 0)
    off = 24
    cms_state, used = read_cms(data[off:], hash_mode=hash_mode)
    off += used
    cand: dict[str, int] = {}
    for _ in range(k):
        (ln,) = struct.unpack_from(">Q", data, off)
        off += 8
        el = data[off : off + ln].decode()
        off += ln
        (freq,) = struct.unpack_from(">Q", data, off)
        off += 8
        if el:
            cand[el] = freq
    return (
        topk.TopKState(topk.TopKSpec(k=k, error_rate=err, accuracy=acc, hash=hash_mode), cms_state, cand),
        off,
    )


WRITERS = {
    "bloom": (write_bloom, read_bloom),
    "hll": (write_hll, read_hll),
    "cms": (write_cms, read_cms),
    "cuckoo": (write_cuckoo, read_cuckoo),
    "topk": (write_topk, read_topk),
}


def write_stream(kind: str, state) -> bytes:
    return WRITERS[kind][0](state)


def read_stream(kind: str, data: bytes, **kw):
    """Returns (state, bytes_consumed)."""
    return WRITERS[kind][1](data, **kw)
