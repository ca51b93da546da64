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
    __slots__ = ("spec", "bits")

    def __init__(self, spec: BloomSpec, bits: np.ndarray):
        self.spec = spec
        self.bits = bits  # uint64[ceil(size/64)] packed, little-bit-first within word

    def copy(self) -> "BloomState":
        return BloomState(self.spec, self.bits.copy())


def new(spec: BloomSpec) -> BloomState:
    return BloomState(spec, np.zeros((spec.size + 63) // 64, dtype=np.uint64))


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
    set_bits = int(np.bitwise_count(state.bits).sum()) if hasattr(np, "bitwise_count") else int(
        np.unpackbits(state.bits.view(np.uint8)).sum()
    )
    return (1.0 - math.exp(-set_bits / state.spec.size)) ** state.spec.num_hashes


def approximate_count(state: BloomState) -> float:
    """Cardinality estimate from the fill ratio: -(m/k)·ln(1 - X/m)
    (Swamidass & Baldi 2007).  No reference counterpart; standard
    bloom-filter query."""
    m, k = state.spec.size, state.spec.num_hashes
    x = int(np.bitwise_count(state.bits).sum()) if hasattr(np, "bitwise_count") else int(
        np.unpackbits(state.bits.view(np.uint8)).sum()
    )
    if x >= m:
        return float("inf")
    return -(m / k) * math.log(1.0 - x / m)


def merge(a: BloomState, b: BloomState) -> BloomState:
    if a.spec != b.spec:
        raise ValueError(f"bloom spec mismatch: {a.spec} vs {b.spec}")
    return BloomState(a.spec, a.bits | b.bits)


def equals(a: BloomState, b: BloomState) -> bool:
    return a.spec == b.spec and bool(np.array_equal(a.bits, b.bits))


def to_bytes(state: BloomState) -> bytes:
    magic = _MAGIC_METRO if state.spec.hash == "metro" else _MAGIC
    return magic + struct.pack("<QQ", state.spec.size, state.spec.num_hashes) + state.bits.tobytes()


def from_bytes(data: bytes) -> BloomState:
    if data[:4] not in (_MAGIC, _MAGIC_METRO):
        raise ValueError("not a bloom state blob")
    size, k = struct.unpack_from("<QQ", data, 4)
    bits = np.frombuffer(data, dtype=np.uint64, offset=20).copy()
    hash_mode = "metro" if data[:4] == _MAGIC_METRO else "murmur"
    return BloomState(BloomSpec(size=size, num_hashes=k, hash=hash_mode), bits)
