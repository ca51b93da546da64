"""Count-Min Sketch kernel — uint64 (d, w) matrix, add-merge.

Semantics from /root/reference/count_min_sketch.go and
base_count_min_sketch.go:
  * sizing: w = ceil(e/eps), d = ceil(ln(1/delta))
    (count_min_sketch.go:48-52); guarantee: overestimate-only,
    err <= eps * allSum with prob 1 - (1/2)^d (README.md:186);
  * position in row r: (h1 + r*h2) mod w  (base_count_min_sketch.go:52-59);
  * Count = min over the d row positions (count_min_sketch.go:76-92);
  * Merge = elementwise + (count_min_sketch.go:138-151).  The reference
    does NOT add allSum on merge (a bug, SURVEY.md §1.3.5) and keeps it
    out of serialization; we carry all_sum inside the state and sum it
    on merge so the eps*N error bound stays meaningful downstream.
  * The reference's Equals compares shapes with && instead of ||
    (count_min_sketch.go:124, can index OOB); we require exact
    spec equality (SURVEY.md §1.3.3).
"""

from __future__ import annotations

from dataclasses import dataclass
import math
import struct

import numpy as np

from ..hashing import SEED_CMS, hash128, sketch_hash128

_MAGIC = b"GXCM"
_MAGIC_METRO = b"GXC2"  # same layout, hash="metro"


@dataclass(frozen=True)
class CMSSpec:
    rows: int  # d
    columns: int  # w
    hash: str = "murmur"  # "metro" = reference-compatible metrohash128(1373)

    @classmethod
    def from_error_rate(cls, error_rate: float, delta: float, hash: str = "murmur") -> "CMSSpec":
        """count_min_sketch.go:44-52 (NewCountMinSketchFromEstimates)."""
        if not (0.0 < error_rate < 1.0) or not (0.0 < delta < 1.0):
            raise ValueError("error_rate and delta must be in (0, 1)")
        columns = math.ceil(math.e / error_rate)
        rows = math.ceil(math.log(1.0 / delta))
        return cls(rows=max(1, rows), columns=max(1, columns), hash=hash)

    def error_bound_eps(self) -> float:
        return math.e / self.columns

    def failure_probability(self) -> float:
        return 0.5**self.rows


class CMSState:
    __slots__ = ("spec", "matrix", "all_sum")

    def __init__(self, spec: CMSSpec, matrix: np.ndarray, all_sum: int = 0):
        self.spec = spec
        self.matrix = matrix  # uint64[d, w]
        self.all_sum = int(all_sum)

    def copy(self) -> "CMSState":
        return CMSState(self.spec, self.matrix.copy(), self.all_sum)


def new(spec: CMSSpec) -> CMSState:
    return CMSState(spec, np.zeros((spec.rows, spec.columns), dtype=np.uint64))


def _positions(spec: CMSSpec, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(d, n) column positions: (h1 + r*h2) mod w (base_count_min_sketch.go:52-59)."""
    r = np.arange(spec.rows, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + r * h2[None, :]) % np.uint64(spec.columns)).astype(np.int64)


def update_hashed(state: CMSState, h1: np.ndarray, h2: np.ndarray, counts=None) -> None:
    if counts is None:
        counts = np.ones(len(h1), dtype=np.float64)
    else:
        counts = np.asarray(counts, dtype=np.float64)
    pos = _positions(state.spec, h1, h2)
    w = state.spec.columns
    # bincount per row: exact for totals < 2^53 per cell per batch (counts are
    # integral float64), far faster than np.add.at's scattered RMW
    for r in range(state.spec.rows):
        state.matrix[r] += np.bincount(pos[r], weights=counts, minlength=w).astype(np.uint64)
    state.all_sum += int(counts.sum())


def update(state: CMSState, values, counts=None) -> None:
    h1, h2 = sketch_hash128(values, SEED_CMS, state.spec.hash)
    update_hashed(state, h1, h2, counts)


def count_hashed(state: CMSState, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    pos = _positions(state.spec, h1, h2)
    vals = state.matrix[np.arange(state.spec.rows)[:, None], pos]
    return vals.min(axis=0)


def count(state: CMSState, values) -> np.ndarray:
    """Vectorized Count over a query column (count_min_sketch.go:76-92)."""
    h1, h2 = sketch_hash128(values, SEED_CMS, state.spec.hash)
    return count_hashed(state, h1, h2)


def inner_product(a: CMSState, b: CMSState) -> int:
    """Estimate of the inner product Σ_x f_a(x)·f_b(x) of the two
    sketched frequency vectors: min over rows of the row dot products
    (Cormode & Muthukrishnan 2005, §4.2 — same guarantees as Count:
    overestimate-only, error ≤ ε·N_a·N_b with prob 1-δ).  No reference
    counterpart; standard CMS query."""
    if a.spec != b.spec:
        raise ValueError(f"cms spec mismatch: {a.spec} vs {b.spec}")
    # exact integer dot products (float64 loses precision past 2^53, which
    # would break the overestimate-only guarantee for large sketches):
    # object dtype keeps Python bignums end to end.
    am = a.matrix.astype(object)
    bm = b.matrix.astype(object)
    dots = [int((am[r] * bm[r]).sum()) for r in range(a.spec.rows)]
    return min(dots)


def merge(a: CMSState, b: CMSState) -> CMSState:
    if a.spec != b.spec:
        raise ValueError(f"cms spec mismatch: {a.spec} vs {b.spec}")  # count_min_sketch.go:141-146
    with np.errstate(over="ignore"):
        return CMSState(a.spec, a.matrix + b.matrix, a.all_sum + b.all_sum)


def equals(a: CMSState, b: CMSState) -> bool:
    return a.spec == b.spec and bool(np.array_equal(a.matrix, b.matrix))


def to_bytes(state: CMSState) -> bytes:
    magic = _MAGIC_METRO if state.spec.hash == "metro" else _MAGIC
    return (
        magic
        + struct.pack("<QQQ", state.spec.rows, state.spec.columns, state.all_sum)
        + state.matrix.tobytes()
    )


def from_bytes(data: bytes) -> CMSState:
    if data[:4] not in (_MAGIC, _MAGIC_METRO):
        raise ValueError("not a cms state blob")
    rows, cols, all_sum = struct.unpack_from("<QQQ", data, 4)
    mat = np.frombuffer(data, dtype=np.uint64, offset=28).reshape(rows, cols).copy()
    hash_mode = "metro" if data[:4] == _MAGIC_METRO else "murmur"
    return CMSState(CMSSpec(rows=rows, columns=cols, hash=hash_mode), mat, all_sum)
