"""HyperLogLog kernel — uint8 register array, max-merge, two modes.

``mode="compat"`` reproduces the reference's non-standard update rule
(/root/reference/base_hyperloglog.go:84-90, hyperloglog.go:56-76):

  * register index = 1 + LeadingZeros64(h << b)   (the *rank* in textbook
    HLL), so only indexes ~1..20 of the m registers are ever touched;
  * register value  = uint8(h >> (32 - b))        (top 32-b+32 bits of the
    hash truncated mod 256 — the textbook *index* bits, scrambled);
  * estimate = alpha*m^2 / sum(2^-reg) with the standard large-range
    correction and rounding (hyperloglog.go:67-76).

  Its own test oracle: m=128, 1000 distinct inserts => Count == 100±2
  (hyperloglog_test.go:14-25); re-validated in tests/test_hll.py against
  our hash.  The reference would index out of range when
  1+LZC >= m (m < 64); we raise a ValueError instead (documented
  deviation — the reference panics, SURVEY.md §1.3.1).

``mode="standard"`` is textbook Flajolet HLL (index = top b bits,
rank = 1 + LZC of the remaining bits) with the small-range
(linear-counting) and large-range corrections, meeting the published
±1.04/sqrt(m) bound that the reference's ``Accuracy()``
(base_hyperloglog.go:66-68) claims.

Merge = elementwise max (hyperloglog.go:79-87) in both modes:
associative + commutative => bit-identical state for any partition
order.  The reference's ``Equals`` skips the last register
(hyperloglog.go:94, a bug); we compare full state (SURVEY.md §1.3.2).
"""

from __future__ import annotations

from dataclasses import dataclass
import math
import struct

import numpy as np

from ..hashing import SEED_HLL, hash128, sketch_hash128

_MAGIC = b"GXHL"
_MODES = ("standard", "compat")


def _alpha(m: int) -> float:
    """Bias-correction constant (base_hyperloglog.go:70-82)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@dataclass(frozen=True)
class HLLSpec:
    m: int  # number of registers, power of two
    mode: str = "standard"
    hash: str = "murmur"  # "metro" = reference-compatible metrohash128(1373)

    def __post_init__(self):
        if self.m < 2 or (self.m & (self.m - 1)) != 0:
            raise ValueError("number of registers must be a power of 2 >= 2")  # base_hyperloglog.go:50-52
        if self.mode not in _MODES:
            raise ValueError(f"mode must be one of {_MODES}")

    @property
    def b(self) -> int:
        return int(math.log2(self.m))

    def accuracy(self) -> float:
        """1.04/sqrt(m) (base_hyperloglog.go:66-68)."""
        return 1.04 / math.sqrt(self.m)


class HLLState:
    __slots__ = ("spec", "registers")

    def __init__(self, spec: HLLSpec, registers: np.ndarray):
        self.spec = spec
        self.registers = registers  # uint8[m]

    def copy(self) -> "HLLState":
        return HLLState(self.spec, self.registers.copy())


def new(spec: HLLSpec) -> HLLState:
    return HLLState(spec, np.zeros(spec.m, dtype=np.uint8))


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (64 for x == 0)."""
    v = x.copy()
    e = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        us = np.uint64(s)
        m = (v >> us) != 0
        v = np.where(m, v >> us, v)
        e += m * s
    return np.where(x == 0, 64, 63 - e)


def update_hashed(state: HLLState, h1: np.ndarray) -> None:
    spec = state.spec
    b = np.uint64(spec.b)
    with np.errstate(over="ignore"):
        if spec.mode == "compat":
            # base_hyperloglog.go:84-90 (roles of index and rank swapped)
            idx = 1 + _clz64(h1 << b)
            cnt = (h1 >> np.uint64(32 - spec.b)).astype(np.uint8)
            if int(idx.max(initial=0)) >= spec.m:
                raise ValueError(
                    f"compat HLL register index {int(idx.max())} out of range for m={spec.m}"
                    " (the reference panics here; use m >= 128 or mode='standard')"
                )
        else:
            idx = (h1 >> np.uint64(64 - spec.b)).astype(np.int64)
            rank = _clz64(h1 << b)
            cnt = np.minimum(1 + rank, 64 - spec.b + 1).astype(np.uint8)
    np.maximum.at(state.registers, idx, cnt)


def update(state: HLLState, values) -> None:
    h1, _ = sketch_hash128(values, SEED_HLL, state.spec.hash)
    update_hashed(state, h1)


_TWO32 = 2.0**32


def count(state: HLLState, with_correction: bool = True, with_rounding: bool = True) -> float:
    """Cardinality estimate (hyperloglog.go:67-76, base_hyperloglog.go:92-102)."""
    m = state.spec.m
    reg = state.registers.astype(np.float64)
    harmonic = np.exp2(-reg).sum()
    est = _alpha(m) * m * m / harmonic
    if state.spec.mode == "standard":
        zeros = int((state.registers == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)  # linear counting (small-range)
        elif with_correction and est > _TWO32 / 30.0:
            est = -_TWO32 * math.log(1.0 - est / _TWO32)
    else:
        # the reference applies only the large-range correction (base_hyperloglog.go:92-102)
        if with_correction and est > _TWO32 / 30.0:
            est = -_TWO32 * math.log(1.0 - est / _TWO32)
    if with_rounding:
        est = round(est)
    return est


def reset(state: HLLState) -> None:
    """Zero the registers (hyperloglog.go:48-52)."""
    state.registers.fill(0)


def merge(a: HLLState, b: HLLState) -> HLLState:
    if a.spec != b.spec:
        raise ValueError(f"hll spec mismatch: {a.spec} vs {b.spec}")
    return HLLState(a.spec, np.maximum(a.registers, b.registers))


def union_count(a: HLLState, b: HLLState) -> float:
    """|A ∪ B| estimate = count of the max-merge (exact HLL union)."""
    return count(merge(a, b))


def intersection_count(a: HLLState, b: HLLState) -> float:
    """|A ∩ B| estimate via inclusion-exclusion: |A|+|B|-|A∪B|.

    No reference counterpart (gostatix has no set ops beyond Merge);
    standard HLL practice — error grows with |A∪B|/|A∩B|, so treat
    small intersections as noise (can go slightly negative; clamped)."""
    est = count(a) + count(b) - union_count(a, b)
    return max(0.0, est)


def jaccard(a: HLLState, b: HLLState) -> float:
    """Jaccard similarity estimate |A∩B|/|A∪B| from HLL sketches."""
    u = union_count(a, b)
    return intersection_count(a, b) / u if u > 0 else 0.0


def equals(a: HLLState, b: HLLState) -> bool:
    return a.spec == b.spec and bool(np.array_equal(a.registers, b.registers))


def to_bytes(state: HLLState) -> bytes:
    # mode byte: bit0 = compat-mode, bit1 = metro hash
    mode = (0 if state.spec.mode == "standard" else 1) | (2 if state.spec.hash == "metro" else 0)
    return _MAGIC + struct.pack("<QB", state.spec.m, mode) + state.registers.tobytes()


def from_bytes(data: bytes) -> HLLState:
    if data[:4] != _MAGIC:
        raise ValueError("not an hll state blob")
    m, mode = struct.unpack_from("<QB", data, 4)
    reg = np.frombuffer(data, dtype=np.uint8, offset=13).copy()
    hash_mode = "metro" if mode & 2 else "murmur"
    return HLLState(HLLSpec(m=m, mode=_MODES[mode & 1], hash=hash_mode), reg)
