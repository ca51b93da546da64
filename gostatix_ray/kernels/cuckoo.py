"""Cuckoo filter kernel — numpy bucket matrix, deterministic PRNG.

Reference semantics (/root/reference/cuckoo_filter.go,
base_cuckoo_filter.go:77-94):
  * fingerprint = first fp_length chars of the *decimal string* of
    murmur3-h1(data); stored as its integer value here (always < 2^64);
  * first index = h mod size; second = (first XOR h(fingerprint)) mod size;
  * Insert: bucket1 if free, else bucket2, else eviction loop up to
    `retries`, evicting a random victim; non-destructive mode rolls back
    evictions on failure (cuckoo_filter.go:74-115);
  * full filter: the reference panics (cuckoo_filter.go:111) — we raise
    ``CuckooFullError`` instead (SURVEY.md §1.3.6);
  * eviction randomness (`rand.Float32/Float64`) is replaced by a
    deterministic ``numpy.random.Generator`` seeded per state, so
    distributed builds are reproducible;
  * sizing with error rate: fp_length bytes = ceil((log2(1/eps) +
    log2(2*bucket_size))/8), capacity = ceil(size*0.955/bucket_size)
    (cuckoo_filter.go:57-63, internal/util/base.go:27-30).

Cuckoo filters are **not associatively mergeable** (evictions + capacity
are order-dependent).  The distributed form is a *partitioned filter*:
one kernel filter per key-partition, lookups routed / OR-ed across
partitions (see stages/membership.py).  ``Remove`` is only sound on a
single mutable filter (actor-held) or per-partition.
"""

from __future__ import annotations

from dataclasses import dataclass
import math
import struct

import numpy as np

from ..hashing import SEED_CUCKOO, hash128, murmur3_x64_128

_MAGIC = b"GXCK"
EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


class CuckooFullError(RuntimeError):
    pass


_POW10 = np.array([10**i for i in range(20)], dtype=np.uint64)


def fingerprint_length_for(size: int, error_rate: float) -> int:
    """internal/util/base.go:27-30 (bytes of decimal-string fingerprint)."""
    v = math.ceil(math.log2(1.0 / error_rate) + math.log2(2.0 * size))
    return max(1, math.ceil(v / 8))


@dataclass(frozen=True)
class CuckooSpec:
    size: int  # number of buckets
    bucket_size: int
    fp_length: int
    retries: int = 500

    @classmethod
    def from_error_rate(cls, size: int, bucket_size: int, retries: int, error_rate: float) -> "CuckooSpec":
        """cuckoo_filter.go:57-63: fp from (size, eps); capacity = ceil(size*0.955/b)."""
        fp_len = fingerprint_length_for(size, error_rate)
        capacity = math.ceil(size * 0.955 / bucket_size)
        return cls(size=capacity, bucket_size=bucket_size, fp_length=fp_len, retries=retries)

    def positive_rate(self) -> float:
        """base_cuckoo_filter.go:73-75."""
        return 2.0 ** (math.log2(2.0 * self.bucket_size) - self.fp_length)

    def cell_size(self) -> int:
        """Total slots = size * bucket_size (base_cuckoo_filter.go:60-63)."""
        return self.size * self.bucket_size


class CuckooState:
    __slots__ = ("spec", "buckets", "length", "rng")

    def __init__(self, spec: CuckooSpec, buckets: np.ndarray, length: int, rng: np.random.Generator):
        self.spec = spec
        self.buckets = buckets  # uint64[size, bucket_size], EMPTY sentinel
        self.length = length
        self.rng = rng

    def copy(self) -> "CuckooState":
        rng = np.random.default_rng(0)
        rng.bit_generator.state = self.rng.bit_generator.state
        return CuckooState(self.spec, self.buckets.copy(), self.length, rng)


def new(spec: CuckooSpec, seed: int = 0) -> CuckooState:
    buckets = np.full((spec.size, spec.bucket_size), EMPTY, dtype=np.uint64)
    return CuckooState(spec, buckets, 0, np.random.default_rng(seed))


def positions(spec: CuckooSpec, values) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (fp int, first idx, second idx) for a batch."""
    h1s = hash128(values, SEED_CUCKOO)[0]
    size = np.uint64(spec.size)
    first = h1s % size
    # decimal prefix: digits = floor(log10(h))+1; fp = h // 10^(digits - fp_len)
    hf = h1s.astype(np.float64)
    ndig = np.where(h1s == 0, 1, np.floor(np.log10(np.maximum(hf, 1.0))).astype(np.int64) + 1)
    # float log10 can be off by one near powers of 10 — correct exactly
    pow10 = np.power(10.0, ndig.astype(np.float64))
    too_big = hf >= pow10  # ndig underestimated
    ndig = ndig + too_big
    pow10lo = np.power(10.0, (ndig - 1).astype(np.float64))
    too_small = (hf < pow10lo) & (h1s > 0)
    ndig = ndig - too_small
    shift = np.maximum(ndig - spec.fp_length, 0)
    # integer division by 10^shift, exact via object -> uint64 (shift <= 20)
    tens = _POW10[np.minimum(shift, 19).astype(np.int64)]
    fp = h1s // tens
    short = ndig < spec.fp_length
    if short.any():
        raise ValueError("fingerprint length is higher than the hash length")
    fp_strs = [str(int(f)) for f in fp]
    fh = hash128(fp_strs, SEED_CUCKOO)[0]
    second = (first ^ fh) % size
    return fp, first, second


def insert_batch(state: CuckooState, values, destructive: bool = False) -> int:
    """Sequential insert of a batch; returns number inserted.

    Raises CuckooFullError when an element cannot be placed (reference
    panics, cuckoo_filter.go:111); non-destructive mode rolls back the
    evictions of the failing element first (cuckoo_filter.go:105-110).
    """
    fps, firsts, seconds = positions(state.spec, values)
    spec = state.spec
    buckets = state.buckets
    bsize = spec.bucket_size
    for fp, fi, si in zip(fps.tolist(), firsts.tolist(), seconds.tolist()):
        fp = np.uint64(fp)
        placed = False
        for idx in (fi, si):
            row = buckets[idx]
            free = np.where(row == EMPTY)[0]
            if free.size:
                row[free[0]] = fp
                placed = True
                break
        if placed:
            state.length += 1
            continue
        # eviction loop (cuckoo_filter.go:85-104)
        index = fi if state.rng.random() < 0.5 else si
        curr = fp
        trail: list[tuple[int, int, np.uint64]] = []
        ok = False
        for _ in range(spec.retries):
            vict = math.ceil(state.rng.random() * (bsize - 1))
            prev = buckets[index][vict]
            trail.append((index, vict, prev))
            buckets[index][vict] = curr
            prev_str = str(int(prev))
            phash = murmur3_x64_128(prev_str.encode(), SEED_CUCKOO)[0]
            new_index = (index ^ phash) % spec.size
            row = buckets[new_index]
            free = np.where(row == EMPTY)[0]
            if free.size:
                row[free[0]] = prev
                state.length += 1
                ok = True
                break
            index = new_index
            curr = prev
        if not ok:
            if not destructive:
                for bidx, slot, prev_fp in reversed(trail):
                    buckets[bidx][slot] = prev_fp
            raise CuckooFullError("cannot insert element, cuckoo filter is full")
    return len(fps)


def lookup_batch(state: CuckooState, values) -> np.ndarray:
    fps, firsts, seconds = positions(state.spec, values)
    b = state.buckets
    hit1 = (b[firsts.astype(np.int64)] == fps[:, None]).any(axis=1)
    hit2 = (b[seconds.astype(np.int64)] == fps[:, None]).any(axis=1)
    return hit1 | hit2


def remove_batch(state: CuckooState, values) -> np.ndarray:
    """Remove one copy of each value; returns bool per value (cuckoo_filter.go:128-144)."""
    fps, firsts, seconds = positions(state.spec, values)
    out = np.zeros(len(fps), dtype=bool)
    for i, (fp, fi, si) in enumerate(zip(fps.tolist(), firsts.tolist(), seconds.tolist())):
        fp = np.uint64(fp)
        for idx in (fi, si):
            row = state.buckets[idx]
            slots = np.where(row == fp)[0]
            if slots.size:
                row[slots[0]] = EMPTY
                state.length -= 1
                out[i] = True
                break
    return out


def update(state: CuckooState, values, counts=None) -> None:
    """Registry-protocol alias (counts ignored: membership semantics)."""
    insert_batch(state, values, destructive=False)


def merge(a: CuckooState, b: CuckooState):
    """Cuckoo filters are NOT associatively mergeable (SURVEY.md §2.4):
    eviction chains and capacity are insert-order state.  The distributed
    form is a partitioned filter — see stages/membership.py
    PartitionedCuckoo — never a state merge."""
    raise NotImplementedError(
        "cuckoo filters cannot be merged; build a partitioned filter "
        "(stages.membership.build_partitioned_cuckoo) instead"
    )


def equals(a: CuckooState, b: CuckooState) -> bool:
    return a.spec == b.spec and bool(np.array_equal(a.buckets, b.buckets))


def to_bytes(state: CuckooState) -> bytes:
    head = struct.pack("<QQQQQ", state.spec.size, state.spec.bucket_size, state.spec.fp_length, state.spec.retries, state.length)
    return _MAGIC + head + state.buckets.tobytes()


def from_bytes(data: bytes) -> CuckooState:
    if data[:4] != _MAGIC:
        raise ValueError("not a cuckoo state blob")
    size, bsize, fplen, retries, length = struct.unpack_from("<QQQQQ", data, 4)
    buckets = np.frombuffer(data, dtype=np.uint64, offset=44).reshape(size, bsize).copy()
    spec = CuckooSpec(size=size, bucket_size=bsize, fp_length=fplen, retries=retries)
    return CuckooState(spec, buckets, length, np.random.default_rng(0))
