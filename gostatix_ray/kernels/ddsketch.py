"""DDSketch quantile kernel (no reference counterpart; north-rule extra).

Implements DDSketch — Masson, Rim & Lee, "DDSketch: A Fast and Fully-
Mergeable Quantile Sketch with Relative-Error Guarantees" (VLDB 2019):
logarithmic buckets with γ = (1+α)/(1-α); a positive value x lands in
bucket i = ⌈log_γ x⌉ covering (γ^(i-1), γ^i], and the bucket's
representative 2γ^i/(γ+1) is within relative error α of every value in
it.  Negative values mirror into a second store; |x| < min_value goes
to a dedicated zero bucket.

Memory bound: each store keeps at most ``max_bins`` buckets via the
paper's collapse rule anchored at the HIGH end (all mass below the
floor folds INTO the floor bucket), which keeps large-magnitude
quantiles exact-to-α and — unlike t-digest/KLL — makes the sketch
BYTE-STABLE under any merge order: the collapse floor is a pure
function of the store's max index, so fold-early and fold-late yield
identical counts (asserted in tests/test_ddsketch.py across random
partitionings).  α-accuracy is guaranteed for quantiles that resolve
above the collapsed floor.

Protocol: new / update / merge / quantile / rank / equals / to_bytes /
from_bytes — the registry.KERNELS uniform surface.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_MAGIC = b"GXDD"


@dataclass(frozen=True)
class DDSpec:
    alpha: float = 0.01
    max_bins: int = 2048
    min_value: float = 1e-9

    def __post_init__(self):
        if not (0.0 < self.alpha < 1.0):
            raise ValueError("alpha must be in (0, 1)")
        if self.max_bins < 2:
            raise ValueError("max_bins must be >= 2")
        if self.min_value <= 0.0:
            raise ValueError("min_value must be > 0")

    @property
    def gamma(self) -> float:
        return (1.0 + self.alpha) / (1.0 - self.alpha)


class DDState:
    __slots__ = ("spec", "pos_lo", "pos", "neg_lo", "neg", "zero_count",
                 "n", "collapsed")

    def __init__(self, spec: DDSpec, pos_lo: int, pos: np.ndarray,
                 neg_lo: int, neg: np.ndarray, zero_count: int, n: int,
                 collapsed: bool):
        self.spec = spec
        self.pos_lo, self.pos = pos_lo, pos      # counts for buckets of +x
        self.neg_lo, self.neg = neg_lo, neg      # counts for buckets of -x
        self.zero_count = zero_count
        self.n = n
        self.collapsed = collapsed

    def copy(self) -> "DDState":
        return DDState(self.spec, self.pos_lo, self.pos.copy(),
                       self.neg_lo, self.neg.copy(), self.zero_count,
                       self.n, self.collapsed)


def new(spec: DDSpec) -> DDState:
    z = np.empty(0, np.int64)
    return DDState(spec, 0, z, 0, z.copy(), 0, 0, False)


def _collapse(lo: int, counts: np.ndarray, max_bins: int):
    """Fold every bucket below the hi-anchored floor into the floor
    bucket.  The floor (hi - max_bins + 1) depends only on the max
    index, so collapse commutes with bucket-count addition — the source
    of this kernel's byte-stable merges."""
    if counts.size <= max_bins:
        return lo, counts, False
    cut = counts.size - max_bins
    counts = counts.copy()
    counts[cut] += counts[:cut].sum()
    return lo + cut, counts[cut:], True


def _add_counts(lo: int, counts: np.ndarray, idx: np.ndarray,
                w: np.ndarray):
    """Accumulate weights w at bucket indices idx into the store."""
    if idx.size == 0:
        return lo, counts
    new_lo = min(lo, int(idx.min())) if counts.size else int(idx.min())
    new_hi = max(lo + counts.size - 1, int(idx.max())) if counts.size \
        else int(idx.max())
    out = np.zeros(new_hi - new_lo + 1, np.int64)
    if counts.size:
        out[lo - new_lo:lo - new_lo + counts.size] = counts
    np.add.at(out, idx - new_lo, w)
    return new_lo, out


def update(state: DDState, values, counts=None) -> None:
    v = np.asarray(values, dtype=np.float64)
    if counts is None:
        w = np.ones(v.size, np.int64)
    else:
        w = np.asarray(counts, dtype=np.int64)
        if w.size < v.size:
            w = np.pad(w, (0, v.size - w.size), constant_values=1)
        w = np.maximum(w[:v.size], 0)
    keep = ~np.isnan(v) & (w > 0)
    v, w = v[keep], w[keep]
    if v.size == 0:
        return
    spec = state.spec
    log_gamma = np.log(spec.gamma)
    zero = np.abs(v) < spec.min_value
    state.zero_count += int(w[zero].sum())
    for positive in (True, False):
        m = (~zero) & ((v > 0) if positive else (v < 0))
        if not m.any():
            continue
        idx = np.ceil(np.log(np.abs(v[m])) / log_gamma).astype(np.int64)
        if positive:
            state.pos_lo, state.pos = _add_counts(
                state.pos_lo, state.pos, idx, w[m])
            state.pos_lo, state.pos, c = _collapse(
                state.pos_lo, state.pos, spec.max_bins)
        else:
            state.neg_lo, state.neg = _add_counts(
                state.neg_lo, state.neg, idx, w[m])
            state.neg_lo, state.neg, c = _collapse(
                state.neg_lo, state.neg, spec.max_bins)
        state.collapsed |= c
    state.n += int(w.sum())


def merge(a: DDState, b: DDState) -> DDState:
    if a.spec != b.spec:
        raise ValueError(f"ddsketch spec mismatch: {a.spec} vs {b.spec}")
    out = a.copy()
    for attr_lo, attr in (("pos_lo", "pos"), ("neg_lo", "neg")):
        b_counts = getattr(b, attr)
        if b_counts.size:
            idx = np.arange(getattr(b, attr_lo),
                            getattr(b, attr_lo) + b_counts.size,
                            dtype=np.int64)
            nz = b_counts > 0
            lo, counts = _add_counts(getattr(out, attr_lo),
                                     getattr(out, attr),
                                     idx[nz], b_counts[nz])
            lo, counts, c = _collapse(lo, counts, out.spec.max_bins)
            setattr(out, attr_lo, lo)
            setattr(out, attr, counts)
            out.collapsed |= c
    out.zero_count += b.zero_count
    out.n += b.n
    out.collapsed |= b.collapsed
    return out


def _ascending(state: DDState):
    """(bucket representative values ascending, counts) across both
    stores and the zero bucket."""
    spec = state.spec
    g = spec.gamma
    parts_v, parts_c = [], []
    if state.neg.size:
        idx = np.arange(state.neg_lo, state.neg_lo + state.neg.size,
                        dtype=np.float64)[::-1]
        parts_v.append(-2.0 * np.power(g, idx) / (g + 1.0))
        parts_c.append(state.neg[::-1])
    if state.zero_count:
        parts_v.append(np.array([0.0]))
        parts_c.append(np.array([state.zero_count], np.int64))
    if state.pos.size:
        idx = np.arange(state.pos_lo, state.pos_lo + state.pos.size,
                        dtype=np.float64)
        parts_v.append(2.0 * np.power(g, idx) / (g + 1.0))
        parts_c.append(state.pos)
    if not parts_v:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    return np.concatenate(parts_v), np.concatenate(parts_c)


def quantile(state: DDState, q) -> np.ndarray:
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
    v, c = _ascending(state)
    if v.size == 0 or state.n == 0:
        return np.full(qs.shape, np.nan)
    cum = np.cumsum(c)
    k = np.clip(np.ceil(qs * state.n), 1, state.n)
    idx = np.searchsorted(cum, k, side="left")
    return v[np.clip(idx, 0, v.size - 1)]


def rank(state: DDState, x) -> np.ndarray:
    """Approximate normalized rank: fraction of values in buckets whose
    representative is <= x."""
    xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
    v, c = _ascending(state)
    if v.size == 0 or state.n == 0:
        return np.full(xs.shape, np.nan)
    cum = np.concatenate([[0], np.cumsum(c)]).astype(np.float64)
    return cum[np.searchsorted(v, xs, side="right")] / float(state.n)


def n_bins(state: DDState) -> int:
    return int(state.pos.size + state.neg.size + (state.zero_count > 0))


def equals(a: DDState, b: DDState) -> bool:
    return (a.spec == b.spec and a.n == b.n
            and a.zero_count == b.zero_count
            and a.pos_lo == b.pos_lo and a.neg_lo == b.neg_lo
            and np.array_equal(a.pos, b.pos)
            and np.array_equal(a.neg, b.neg))


def to_bytes(state: DDState) -> bytes:
    s = state.spec
    head = struct.pack("<4sddqqqqqqqB", _MAGIC, s.alpha, s.min_value,
                       s.max_bins, state.n, state.zero_count,
                       state.pos_lo, state.pos.size,
                       state.neg_lo, state.neg.size,
                       1 if state.collapsed else 0)
    return head + state.pos.tobytes() + state.neg.tobytes()


def from_bytes(data: bytes) -> DDState:
    magic, alpha, min_value, max_bins, n, zero, pos_lo, pos_n, neg_lo, \
        neg_n, collapsed = struct.unpack_from("<4sddqqqqqqqB", data, 0)
    if magic != _MAGIC:
        raise ValueError("not a ddsketch state blob")
    off = struct.calcsize("<4sddqqqqqqqB")
    pos = np.frombuffer(data, np.int64, offset=off, count=pos_n).copy()
    off += 8 * pos_n
    neg = np.frombuffer(data, np.int64, offset=off, count=neg_n).copy()
    return DDState(DDSpec(alpha, int(max_bins), min_value), pos_lo, pos,
                   neg_lo, neg, zero, n, bool(collapsed))
