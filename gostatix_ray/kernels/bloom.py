"""Bloom filter kernel — packed-bit numpy state, enhanced double hashing.

Semantics re-created from /root/reference/bloom_filter.go:
  * sizing: size = ceil(-n*ln(p)/ln(2)^2), k = ceil(floor(size/n)*ln(2))
    (`internal/util/base.go:19-25`; note the reference floors size/n via
    Go integer division before multiplying by ln 2 — replicated here);
  * index scheme (enhanced double hashing): idx_i = (h1 + i*h2 +
    (i^3 - i)/6) mod size   (`bloom_filter.go:327-330`);
  * Lookup = AND of the k bits (`bloom_filter.go:188-215`);
  * BloomPositiveRate = (popcount/size)^k estimate of realized FPP
    (`bloom_filter.go:228-231`).

The reference has **no merge** (single-process); bitwise OR of
equal-spec filters is the natural associative merge consistent with
Insert and is what the distributed build relies on (SURVEY.md §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass
import math
import struct

import numpy as np

from ..hashing import SEED_BLOOM, hash128, sketch_hash128

_MAGIC = b"GXBL"
_MAGIC_METRO = b"GXB2"  # same layout, hash="metro"
# sparse layout (low-fill states, e.g. per-block PARTIALS of a large
# filter): SET BIT POSITIONS — <QQ size,k> <Q npos> pos:uint32[npos]
# (sorted).  A 2M-key p=1e-4 filter is a 4.8 MB bitmap; a 65k-row block
# partial sets ~90k bits => ~360 KB positions, and the zlib stage (the
# build hot path's single biggest cost: the dense bitmap zlib'd at
# ~3 ms/MB, a high-entropy word-sparse blob at ~12 ms/MB) is skipped
# entirely by compress_state's incompressibility sampling.  Encoding is
# chosen by CONTENT (fill ratio), so equal states serialize identically
# — merge byte-identity holds.  Positions cap at 2^32 bits per filter;
# dense beyond.
_MAGIC_SPARSE = b"GXBS"
_MAGIC_SPARSE_METRO = b"GXBT"


@dataclass(frozen=True)
class BloomSpec:
    size: int  # number of bits
    num_hashes: int
    hash: str = "murmur"  # "metro" = reference-compatible metrohash128(1373)

    @classmethod
    def from_params(cls, num_items: int, error_rate: float, hash: str = "murmur") -> "BloomSpec":
        if num_items <= 0 or not (0.0 < error_rate < 1.0):
            raise ValueError("num_items must be > 0 and 0 < error_rate < 1")
        size = math.ceil(-(num_items * math.log(error_rate)) / (math.log(2) ** 2))
        # reference quirk: integer division before * ln2 (util/base.go:23-25)
        num_hashes = math.ceil((size // num_items) * math.log(2))
        return cls(size=size, num_hashes=max(1, num_hashes), hash=hash)


class BloomState:
    __slots__ = ("spec", "bits", "journal")

    def __init__(self, spec: BloomSpec, bits: np.ndarray, journal=None):
        self.spec = spec
        self.bits = bits  # uint64[ceil(size/64)] packed, little-bit-first within word
        # journal: list of bit-index arrays covering EXACTLY the set bits
        # (maintained while every mutation flows through update_hashed on
        # a fresh/sparse-loaded state; None once unknowable, e.g. after a
        # bitmap merge).  Lets the sparse to_bytes emit positions without
        # scanning the bitmap — the build hot path writes one partial per
        # block, and the scan was 13 ms/block on a 4.8 MB filter.
        self.journal = journal

    def copy(self) -> "BloomState":
        return BloomState(self.spec, self.bits.copy(),
                          None if self.journal is None else list(self.journal))


def new(spec: BloomSpec) -> BloomState:
    return BloomState(spec, np.zeros((spec.size + 63) // 64, dtype=np.uint64), journal=[])


def _indices(spec: BloomSpec, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(n, k) bit indices via enhanced double hashing (bloom_filter.go:327-330)."""
    k = spec.num_hashes
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        delta = i * h2[:, None] + ((i * i * i - i) // np.uint64(6))
        idx = (h1[:, None] + delta) % np.uint64(spec.size)
    return idx


def update_hashed(state: BloomState, h1: np.ndarray, h2: np.ndarray) -> None:
    idx = _indices(state.spec, h1, h2).ravel()
    words = (idx >> np.uint64(6)).astype(np.int64)
    masks = np.uint64(1) << (idx & np.uint64(63))
    np.bitwise_or.at(state.bits, words, masks)
    if state.journal is not None:
        state.journal.append(idx)


def update(state: BloomState, values) -> None:
    h1, h2 = sketch_hash128(values, SEED_BLOOM, state.spec.hash)
    update_hashed(state, h1, h2)


def contains_hashed(state: BloomState, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    idx = _indices(state.spec, h1, h2)
    words = (idx >> np.uint64(6)).astype(np.int64)
    bit = (state.bits[words] >> (idx & np.uint64(63))) & np.uint64(1)
    return bit.all(axis=1)


def contains(state: BloomState, values) -> np.ndarray:
    h1, h2 = sketch_hash128(values, SEED_BLOOM, state.spec.hash)
    return contains_hashed(state, h1, h2)


def positive_rate(state: BloomState) -> float:
    """Realized-FPP estimate, reference formula (bloom_filter.go:228-231):
    ``(1 - exp(-bitCount/size))^numHashes``."""
    set_bits = int(_popcount(state.bits).sum())
    return (1.0 - math.exp(-set_bits / state.spec.size)) ** state.spec.num_hashes


def approximate_count(state: BloomState) -> float:
    """Cardinality estimate from the fill ratio: -(m/k)·ln(1 - X/m)
    (Swamidass & Baldi 2007).  No reference counterpart; standard
    bloom-filter query."""
    m, k = state.spec.size, state.spec.num_hashes
    x = int(_popcount(state.bits).sum())
    if x >= m:
        return float("inf")
    return -(m / k) * math.log(1.0 - x / m)


def merge(a: BloomState, b: BloomState) -> BloomState:
    if a.spec != b.spec:
        raise ValueError(f"bloom spec mismatch: {a.spec} vs {b.spec}")
    return BloomState(a.spec, a.bits | b.bits)  # journal=None: scan on serialize


def merge_blobs(blobs: list) -> BloomState:
    """Bulk-merge serialized states WITHOUT materializing one bitmap per
    blob: position-format blobs concatenate into one unique-sort
    (~1 ms/partial instead of ~30 ms of scatter+OR+zlib each — the
    merge stage cost at 10^12-turn partial counts); dense blobs OR in.
    The result carries the merged positions as its journal, so
    re-serializing skips the bitmap scan too."""
    pos_list = []
    spec = None
    dense = None
    for b in blobs:
        magic = bytes(b[:4])
        if magic in (_MAGIC_SPARSE, _MAGIC_SPARSE_METRO):
            size, k, npos = struct.unpack_from("<QQQ", b, 4)
            s = BloomSpec(size=size, num_hashes=k,
                          hash="metro" if magic == _MAGIC_SPARSE_METRO else "murmur")
            pos_list.append(np.frombuffer(b, dtype=np.uint32, count=npos, offset=28))
        else:
            st = from_bytes(bytes(b))
            s = st.spec
            dense = st.bits if dense is None else dense | st.bits
        if spec is None:
            spec = s
        elif spec != s:
            raise ValueError(f"bloom spec mismatch: {spec} vs {s}")
    nwords = (spec.size + 63) // 64
    bits = np.zeros(nwords, dtype=np.uint64) if dense is None else dense
    journal = None
    # scatter each (already-sorted) position array independently — a
    # per-input reduceat is O(n) with no global sort; unique-sorting the
    # concatenation measured seconds per bundle at ~50M total positions
    total = 0
    for pos in pos_list:
        if pos.size == 0:
            continue
        total += pos.size
        wi = (pos >> np.uint32(6)).astype(np.int64)
        bv = np.uint64(1) << (pos & np.uint32(63)).astype(np.uint64)
        starts = np.flatnonzero(np.concatenate(([True], wi[1:] != wi[:-1])))
        bits[wi[starts]] |= np.bitwise_or.reduceat(bv, starts)
    # keep a journal only while the (deduped-on-serialize) positions stay
    # clearly below dense size (same budget as _sorted_positions)
    if pos_list and dense is None and total * 4 + 28 < (nwords * 8) // 2:
        journal = [pos.astype(np.uint64) for pos in pos_list]
    return BloomState(spec, bits, journal=journal)


def equals(a: BloomState, b: BloomState) -> bool:
    return a.spec == b.spec and bool(np.array_equal(a.bits, b.bits))


def _sorted_positions(state: BloomState) -> np.ndarray | None:
    """Sorted unique set-bit positions, or None if dense wins.

    Fast path: the update journal (exact by construction) needs only a
    unique-sort of the recorded indices.  Fallback: scan the bitmap
    (merged/deserialized states without a journal)."""
    # positions must be at most HALF the dense size to pay for their
    # downstream cost (each merge level re-sorts them; a borderline
    # positions blob that survives one merge forces multi-million-entry
    # unique-sorts at the next level — measured 15 s in the final merge)
    nwords = state.bits.size
    budget = (nwords * 8) // 2
    if state.journal is not None:
        if not state.journal:
            return np.empty(0, np.uint32)
        pos = np.unique(np.concatenate(state.journal))
        return pos.astype(np.uint32) if pos.size * 4 + 28 < budget else None
    nzw = np.flatnonzero(state.bits)
    npos = int(_popcount(state.bits[nzw]).sum()) if nzw.size else 0
    if npos * 4 + 28 >= budget:
        return None
    # expand nonzero words to sorted set-bit positions (vectorized:
    # unpackbits over the nonzero words, flat index => already sorted)
    w8 = state.bits[nzw].view(np.uint8)
    flat = np.flatnonzero(np.unpackbits(w8, bitorder="little"))  # 1-D: fast path
    return (nzw[flat >> 6].astype(np.uint32) << np.uint32(6)) | (flat & 63).astype(np.uint32)


def to_bytes(state: BloomState) -> bytes:
    pos = _sorted_positions(state) if state.spec.size < (1 << 32) else None
    if pos is not None:
        magic = _MAGIC_SPARSE_METRO if state.spec.hash == "metro" else _MAGIC_SPARSE
        return (
            magic
            + struct.pack("<QQQ", state.spec.size, state.spec.num_hashes, pos.size)
            + pos.tobytes()
        )
    magic = _MAGIC_METRO if state.spec.hash == "metro" else _MAGIC
    return magic + struct.pack("<QQ", state.spec.size, state.spec.num_hashes) + state.bits.tobytes()


def _popcount(x: np.ndarray) -> np.ndarray:
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    with np.errstate(over="ignore"):
        return (x * h01) >> np.uint64(56)


def from_bytes(data: bytes) -> BloomState:
    magic = data[:4]
    if magic in (_MAGIC_SPARSE, _MAGIC_SPARSE_METRO):
        size, k, npos = struct.unpack_from("<QQQ", data, 4)
        pos = np.frombuffer(data, dtype=np.uint32, count=npos, offset=28)
        bits = np.zeros((size + 63) // 64, dtype=np.uint64)
        if npos:
            wi = (pos >> np.uint32(6)).astype(np.int64)
            bv = np.uint64(1) << (pos & np.uint32(63)).astype(np.uint64)
            # positions are sorted => OR-reduce per distinct word via reduceat
            starts = np.flatnonzero(np.concatenate(([True], wi[1:] != wi[:-1])))
            bits[wi[starts]] = np.bitwise_or.reduceat(bv, starts)
        hash_mode = "metro" if magic == _MAGIC_SPARSE_METRO else "murmur"
        # seed the journal with the just-decoded positions: a sparse
        # partial that is loaded, updated and re-serialized keeps the
        # documented scan-free to_bytes fast path
        return BloomState(BloomSpec(size=size, num_hashes=k, hash=hash_mode), bits,
                          journal=[pos.astype(np.uint64)])
    if magic not in (_MAGIC, _MAGIC_METRO):
        raise ValueError("not a bloom state blob")
    size, k = struct.unpack_from("<QQ", data, 4)
    bits = np.frombuffer(data, dtype=np.uint64, offset=20).copy()
    hash_mode = "metro" if magic == _MAGIC_METRO else "murmur"
    return BloomState(BloomSpec(size=size, num_hashes=k, hash=hash_mode), bits)
