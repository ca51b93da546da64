"""Moments sketch kernel (no reference counterpart; north-rule extra).

The moments sketch (Gan, Ding, Bailis et al., "Moment-Based Quantile
Sketches for Efficient High Cardinality Aggregation Queries", VLDB 2018)
summarizes a numeric stream as its first k raw power sums plus count /
min / max.  Merging is pure addition, so unlike t-digest / KLL the
merged state is **byte-identical for any partition order** — this is
the only quantile-adjacent kernel in the engine that joins the
gostatix five in ``registry.BYTE_STABLE``.

Exactness strategy: values are scaled to integers on entry
(``floor(x * scale + 0.5)``, the same money-safe rounding used by the
oracle SQL twins), and every power sum is accumulated as an arbitrary
precision Python int.  The per-batch hot path stays vectorized: for
each power p, batches are summed with int64 numpy reductions over
chunks sized so the partial sum provably cannot overflow
(``chunk_len = INT64_MAX // max|s|^p``), then folded into the exact
Python-int accumulator.  No floats touch the state, so merge is exactly
associative and the derived mean / variance are reproducible
cross-engine (see CLAUDE.md: float64 division of identical ints is
bit-identical across engines).

Estimator caveat (documented, not hidden): raw moments support exact
mean / variance / skewness / kurtosis; quantile *estimates* from
moments need a maximum-entropy solver and are not implemented — use
tdigest / kll / exact quantiles for quantile queries.
"""

from __future__ import annotations

from dataclasses import dataclass
import struct

import numpy as np

_MAGIC = b"GXMO"
_I64MAX = np.iinfo(np.int64).max


@dataclass(frozen=True)
class MomentsSpec:
    k: int = 4          # number of raw power sums S_p = sum(s^p), p=1..k
    scale: int = 100    # fixed-point scale applied on update (100 = cents)

    def __post_init__(self):
        if not (1 <= self.k <= 8):
            raise ValueError("k must be in 1..8")
        if self.scale < 1:
            raise ValueError("scale must be >= 1")


class MomentsState:
    __slots__ = ("spec", "n", "sums", "vmin", "vmax")

    def __init__(self, spec: MomentsSpec, n: int, sums: list[int],
                 vmin: int | None, vmax: int | None):
        self.spec = spec
        self.n = n            # total weight (exact int)
        self.sums = sums      # k exact Python ints, sums[p-1] = sum(w * s^p)
        self.vmin = vmin      # scaled-int min (None when empty)
        self.vmax = vmax

    def copy(self) -> "MomentsState":
        return MomentsState(self.spec, self.n, list(self.sums), self.vmin, self.vmax)


def new(spec: MomentsSpec) -> MomentsState:
    return MomentsState(spec, 0, [0] * spec.k, None, None)


def _exact_dot(w: np.ndarray | None, sp: np.ndarray, max_abs: int) -> int:
    """Exact sum(w * sp) where |sp| <= max_abs, as a Python int.

    Vectorized int64 reduction over chunks sized so each chunk's partial
    sum stays inside int64, folded into an arbitrary-precision total.
    """
    if sp.size == 0:
        return 0
    per_elem = max(int(max_abs), 1)
    if w is not None:
        wmax = int(np.abs(w).max(initial=0))
        per_elem *= max(wmax, 1)
    chunk = max(int(_I64MAX // max(per_elem, 1)), 1)
    total = 0
    for lo in range(0, sp.size, chunk):
        seg = sp[lo:lo + chunk]
        if w is not None:
            seg = seg * w[lo:lo + chunk]
        total += int(np.sum(seg, dtype=np.int64))
    return total


def update(state: MomentsState, values, counts=None) -> None:
    v = np.asarray(values, dtype=np.float64)
    mask = ~np.isnan(v)
    w = None
    if counts is not None:
        c = np.asarray(counts, dtype=np.int64)
        if c.size < v.size:
            c = np.pad(c, (0, v.size - c.size), constant_values=1)
        w = np.maximum(c[: v.size][mask], 0)
    v = v[mask]
    if v.size == 0:
        return
    s = np.floor(v * state.spec.scale + 0.5).astype(np.int64)
    if w is not None:
        keep = w > 0
        s, w = s[keep], w[keep]
        if s.size == 0:
            return
    state.n += int(np.sum(w, dtype=np.int64)) if w is not None else int(s.size)
    lo, hi = int(s.min()), int(s.max())
    state.vmin = lo if state.vmin is None else min(state.vmin, lo)
    state.vmax = hi if state.vmax is None else max(state.vmax, hi)
    max_abs = max(abs(lo), abs(hi))
    # p=1..k: exact power sums.  The element-wise product w * s^p can
    # overflow int64 — the exact integer bound max|s|^p * max(w) decides
    # per power whether the vectorized int64 path is safe or the state
    # must drop to Python-int (object dtype) arithmetic.  The weight
    # factor MUST be part of the test: chunking in _exact_dot bounds the
    # partial SUM, not the per-element product.
    if max_abs == 0:
        return
    wmax = int(np.max(w)) if w is not None else 1
    sp = s.copy()
    s_obj = None  # Python-int copy: int64 * object-of-np.int64 still overflows
    w_obj = None
    for p in range(1, state.spec.k + 1):
        fits_i64 = (max_abs ** p) * wmax <= int(_I64MAX)
        if p > 1:
            if fits_i64 and sp.dtype != object:
                sp = sp * s
            else:
                if sp.dtype != object:
                    sp = np.array([int(x) for x in sp], dtype=object)
                if s_obj is None:
                    s_obj = np.array([int(x) for x in s], dtype=object)
                sp = sp * s_obj
        elif not fits_i64:
            sp = np.array([int(x) for x in sp], dtype=object)
        if sp.dtype == object or not fits_i64:
            if sp.dtype != object:
                sp = np.array([int(x) for x in sp], dtype=object)
            if w is not None:
                if w_obj is None:
                    w_obj = np.array([int(x) for x in w], dtype=object)
                seg = sp * w_obj
            else:
                seg = sp
            state.sums[p - 1] += int(seg.sum())
        else:
            state.sums[p - 1] += _exact_dot(w, sp, max_abs ** p)


def merge(a: MomentsState, b: MomentsState) -> MomentsState:
    if a.spec != b.spec:
        raise ValueError(f"moments spec mismatch: {a.spec} vs {b.spec}")
    out = a.copy()
    out.n += b.n
    out.sums = [x + y for x, y in zip(out.sums, b.sums)]
    if b.vmin is not None:
        out.vmin = b.vmin if out.vmin is None else min(out.vmin, b.vmin)
        out.vmax = b.vmax if out.vmax is None else max(out.vmax, b.vmax)
    return out


def equals(a: MomentsState, b: MomentsState) -> bool:
    return (a.spec == b.spec and a.n == b.n and a.sums == b.sums
            and a.vmin == b.vmin and a.vmax == b.vmax)


# -- estimators (scaled/cents domain unless noted) --------------------------

def mean_scaled(state: MomentsState) -> float:
    """Exact mean in the scaled-int domain: S1/n as one float64 division."""
    if state.n == 0:
        return float("nan")
    return float(state.sums[0]) / float(state.n)


def variance_scaled(state: MomentsState) -> float:
    """Population variance in the scaled domain.

    Fixed evaluation order ``(S2 - S1*S1/n)/n`` on float64 so any engine
    computing the same formula over the same exact integer sums produces
    the identical bits (oracle-twin contract).
    """
    if state.n == 0 or state.spec.k < 2:
        return float("nan")
    n = float(state.n)
    s1 = float(state.sums[0])
    s2 = float(state.sums[1])
    return (s2 - s1 * s1 / n) / n


def mean(state: MomentsState) -> float:
    return mean_scaled(state) / state.spec.scale


def variance(state: MomentsState) -> float:
    return variance_scaled(state) / (state.spec.scale * state.spec.scale)


def std(state: MomentsState) -> float:
    return float(np.sqrt(variance(state)))


def _central(state: MomentsState, p: int) -> float:
    """Central moment E[(x-mu)^p] in the scaled domain (float64)."""
    from math import comb

    n, mu = float(state.n), mean_scaled(state)
    total = 0.0
    for j in range(p + 1):
        raw = float(state.sums[j - 1]) / n if j >= 1 else 1.0
        total += comb(p, j) * raw * (-mu) ** (p - j)
    return total


def skewness(state: MomentsState) -> float:
    if state.spec.k < 3 or state.n == 0:
        return float("nan")
    m2, m3 = _central(state, 2), _central(state, 3)
    return m3 / m2 ** 1.5 if m2 > 0 else float("nan")


def kurtosis(state: MomentsState) -> float:
    """Excess kurtosis."""
    if state.spec.k < 4 or state.n == 0:
        return float("nan")
    m2, m4 = _central(state, 2), _central(state, 4)
    return m4 / (m2 * m2) - 3.0 if m2 > 0 else float("nan")


# -- serialization (exact ints, variable length, canonical) -----------------

def _pack_int(x: int) -> bytes:
    sign = 1 if x < 0 else 0
    mag = -x if sign else x
    body = mag.to_bytes((mag.bit_length() + 7) // 8, "big") if mag else b""
    return struct.pack(">BH", sign, len(body)) + body


def _unpack_int(data: bytes, off: int) -> tuple[int, int]:
    sign, ln = struct.unpack_from(">BH", data, off)
    off += 3
    mag = int.from_bytes(data[off:off + ln], "big") if ln else 0
    return (-mag if sign else mag), off + ln


def to_bytes(state: MomentsState) -> bytes:
    out = [_MAGIC, struct.pack(">BQ", state.spec.k, state.spec.scale)]
    out.append(_pack_int(state.n))
    for s in state.sums:
        out.append(_pack_int(s))
    if state.vmin is None:
        out.append(b"\x00")
    else:
        out.append(b"\x01")
        out.append(_pack_int(state.vmin))
        out.append(_pack_int(state.vmax))
    return b"".join(out)


def from_bytes(data: bytes) -> MomentsState:
    if data[:4] != _MAGIC:
        raise ValueError("not a moments state blob")
    k, scale = struct.unpack_from(">BQ", data, 4)
    off = 4 + 9
    n, off = _unpack_int(data, off)
    sums = []
    for _ in range(k):
        s, off = _unpack_int(data, off)
        sums.append(s)
    has_range = data[off]
    off += 1
    vmin = vmax = None
    if has_range:
        vmin, off = _unpack_int(data, off)
        vmax, off = _unpack_int(data, off)
    return MomentsState(MomentsSpec(k=k, scale=scale), n, sums, vmin, vmax)
