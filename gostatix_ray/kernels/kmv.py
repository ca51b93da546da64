"""KMV (bottom-k / theta-style) distinct sketch — pure numpy kernel.

Not in the reference (gostatix covers cardinality with HLL only,
`hyperloglog.go`); added for SET ALGEBRA with provable bounds: HLL
intersection is inclusion-exclusion (`kernels/hll.py:169-177`) whose
error grows with |A∪B|/|A∩B|, while a bottom-k sketch keeps an actual
uniform hash SAMPLE of the keys, so intersections/differences are
estimated directly from sample overlap at relative error
~1/sqrt(k-2) of the UNION (Bar-Yossef et al. 2002 "Counting distinct
elements in a data stream"; Beyer et al. 2007 KMV; the Apache
DataSketches theta sketch is the production form of the same idea).

State = the k smallest DISTINCT 64-bit murmur3 hash values of the keys,
kept sorted.  Properties that matter to the engine:

* merge(a, b) = k-smallest of the union — associative, commutative,
  idempotent and BYTE-STABLE (any partition order yields bit-identical
  state), so it rides the standard combiner tree (registry BYTE_STABLE).
* estimate: exact |S| while |S| < k (the sketch IS the distinct set's
  hashes); else (k-1) / theta with theta = kth smallest hash normalized
  to (0, 1] — the classic unbiased KMV estimator.
* set ops: under the SHARED threshold theta = min(theta_a, theta_b)
  both sketches are uniform samples of their sets at rate theta, so
  |A ∩ B| ≈ |samples_a ∩ samples_b below theta| / theta, and the same
  for union/difference — no inclusion-exclusion cancellation.

Weights are ignored (set semantics), like bloom/hll.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..hashing import hash128

_MAGIC = b"KMV1"
_SEED_KMV = 1373  # house seed, same as bloom/hll/cms (hashing.py:56-58)
_U64 = float(2 ** 64)


@dataclass(frozen=True)
class KMVSpec:
    k: int = 1024

    def __post_init__(self):
        if self.k < 8:
            raise ValueError("kmv k must be >= 8")

    def relative_standard_error(self) -> float:
        """RSE of the cardinality estimate ~ 1/sqrt(k-2) (Beyer 2007)."""
        return 1.0 / np.sqrt(self.k - 2)


class KMVState:
    __slots__ = ("spec", "hashes")

    def __init__(self, spec: KMVSpec, hashes: np.ndarray):
        self.spec = spec
        self.hashes = hashes  # sorted uint64, len <= k, distinct

    def copy(self) -> "KMVState":
        return KMVState(self.spec, self.hashes.copy())


def new(spec: KMVSpec) -> KMVState:
    return KMVState(spec, np.empty(0, dtype=np.uint64))


def update_hashed(state: KMVState, h1: np.ndarray) -> None:
    if len(h1) == 0:
        return
    merged = np.union1d(state.hashes, h1.astype(np.uint64))  # sorted distinct
    state.hashes = merged[: state.spec.k]


def update(state: KMVState, values, counts=None) -> None:
    """counts accepted for protocol uniformity; set semantics ignore it."""
    h1, _ = hash128(values, _SEED_KMV)
    update_hashed(state, h1)


def merge(a: KMVState, b: KMVState) -> KMVState:
    if a.spec != b.spec:
        raise ValueError(f"kmv spec mismatch: {a.spec} vs {b.spec}")
    merged = np.union1d(a.hashes, b.hashes)
    return KMVState(a.spec, merged[: a.spec.k])


def _threshold(state: KMVState) -> np.uint64 | None:
    """Exclusive inclusion threshold as a raw uint64 hash: ``None`` while
    unsaturated (every seen hash is kept), else the kth-smallest hash —
    membership is STRICTLY below, the convention :func:`estimate`'s
    (k-1)/theta estimator assumes (a float round-trip here would
    sometimes include the threshold hash itself, biasing set ops +1/k)."""
    if len(state.hashes) < state.spec.k:
        return None
    return state.hashes[-1]


def _shared_threshold(a: KMVState, b: KMVState) -> np.uint64 | None:
    ta, tb = _threshold(a), _threshold(b)
    if ta is None:
        return tb
    if tb is None:
        return ta
    return min(ta, tb)


def _below(state: KMVState, th: np.uint64 | None) -> np.ndarray:
    return state.hashes if th is None else state.hashes[state.hashes < th]


def estimate(state: KMVState) -> float:
    k = state.spec.k
    if len(state.hashes) < k:
        return float(len(state.hashes))  # exact: the sample IS the set
    return (k - 1) / (float(state.hashes[k - 1]) / _U64)


def union_count(a: KMVState, b: KMVState) -> float:
    """|A ∪ B| estimate — exactly the estimate of the merged sketch."""
    return estimate(merge(a, b))


def intersection_count(a: KMVState, b: KMVState) -> float:
    th = _shared_threshold(a, b)
    inter = np.intersect1d(_below(a, th), _below(b, th))
    if th is None:
        return float(len(inter))  # both unsaturated: exact
    return len(inter) / (float(th) / _U64)


def difference_count(a: KMVState, b: KMVState) -> float:
    """|A \\ B| estimate (sample set-difference under the shared theta)."""
    th = _shared_threshold(a, b)
    diff = np.setdiff1d(_below(a, th), _below(b, th))
    if th is None:
        return float(len(diff))
    return len(diff) / (float(th) / _U64)


def jaccard(a: KMVState, b: KMVState) -> float:
    th = _shared_threshold(a, b)
    sa, sb = _below(a, th), _below(b, th)
    u = len(np.union1d(sa, sb))
    return len(np.intersect1d(sa, sb)) / u if u else 0.0


def equals(a: KMVState, b: KMVState) -> bool:
    return a.spec == b.spec and bool(np.array_equal(a.hashes, b.hashes))


def to_bytes(state: KMVState) -> bytes:
    return _MAGIC + struct.pack("<QQ", state.spec.k, len(state.hashes)) + \
        state.hashes.astype("<u8").tobytes()


def from_bytes(data: bytes) -> KMVState:
    if data[:4] != _MAGIC:
        raise ValueError("not a kmv state blob")
    k, n = struct.unpack_from("<QQ", data, 4)
    hashes = np.frombuffer(data, dtype="<u8", offset=20, count=n).astype(np.uint64)
    return KMVState(KMVSpec(k=int(k)), hashes)
