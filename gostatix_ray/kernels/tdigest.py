"""t-digest kernel — mergeable quantile sketch (no reference counterpart).

Required by the north rule alongside the five gostatix structures.
Implements the *merging* t-digest of Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests" (arXiv:1902.04023): centroids sorted
by mean, compressed with the k1 scale function
k(q) = (delta / 2*pi) * asin(2q - 1), which bounds each centroid's
k-size to 1 and concentrates resolution at the tails.

State = (means float64[], weights float64[]), sorted by mean.
merge(a, b) = concat + compress: associative in the *bound* sense
(any merge order keeps the q*(1-q) relative accuracy guarantee) but not
byte-identical across orders — unlike the five gostatix sketches; the
pipeline layer records this (tests assert quantile-error bounds, not
byte equality).
"""

from __future__ import annotations

from dataclasses import dataclass
import math
import struct

import numpy as np

_MAGIC = b"GXTD"


@dataclass(frozen=True)
class TDigestSpec:
    compression: float = 100.0  # delta

    def __post_init__(self):
        if self.compression < 10:
            raise ValueError("compression must be >= 10")


class TDigestState:
    __slots__ = ("spec", "means", "weights", "buf_means", "buf_weights")

    def __init__(self, spec: TDigestSpec, means: np.ndarray, weights: np.ndarray):
        self.spec = spec
        self.means = means
        self.weights = weights
        self.buf_means: list[np.ndarray] = []
        self.buf_weights: list[np.ndarray] = []

    def copy(self) -> "TDigestState":
        _flush(self)
        return TDigestState(self.spec, self.means.copy(), self.weights.copy())


def new(spec: TDigestSpec) -> TDigestState:
    return TDigestState(spec, np.empty(0, np.float64), np.empty(0, np.float64))


def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2.0 * math.pi)) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))


def _compress(spec: TDigestSpec, means: np.ndarray, weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized merge pass: cluster sorted items by the integer part of
    the k1 scale function at their cumulative-weight midpoint (the
    standard MergingDigest approximation: every cluster's k-size <= 1, so
    the q*(1-q)/delta accuracy bound holds; <= 2*delta clusters)."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    cum = np.cumsum(weights)
    q_mid = (cum - weights / 2.0) / total
    k = _k_scale(q_mid, spec.compression)
    cluster = np.floor(k - k[0]).astype(np.int64)
    # force strictly increasing cluster ids at jumps > 1 to stay dense
    cluster = np.maximum.accumulate(cluster)
    boundaries = np.flatnonzero(np.diff(cluster, prepend=cluster[0] - 1))
    w_out = np.add.reduceat(weights, boundaries)
    m_out = np.add.reduceat(means * weights, boundaries) / w_out
    return m_out, w_out


def _flush(state: TDigestState) -> None:
    if not state.buf_means:
        return
    means = np.concatenate([state.means] + state.buf_means)
    weights = np.concatenate([state.weights] + state.buf_weights)
    state.buf_means, state.buf_weights = [], []
    state.means, state.weights = _compress(state.spec, means, weights)


def update(state: TDigestState, values, counts=None) -> None:
    v = np.asarray(values, dtype=np.float64)
    mask = ~np.isnan(v)
    if counts is None:
        v = v[mask]
        w = np.ones_like(v)
    else:
        # align counts with values BEFORE the NaN mask so weights stay
        # attached to their own elements
        w = np.asarray(counts, dtype=np.float64)
        if w.size < v.size:
            w = np.pad(w, (0, v.size - w.size), constant_values=1.0)
        v, w = v[mask], w[: mask.size][mask]
        # zero/negative weights contribute nothing — kept, they produce
        # 0/0 NaN centroid means in _compress (sibling kernels drop them)
        pos = w > 0
        v, w = v[pos], w[pos]
    if v.size == 0:
        return
    state.buf_means.append(v)
    state.buf_weights.append(w)
    if sum(b.size for b in state.buf_means) >= 16 * int(state.spec.compression):
        _flush(state)


def merge(a: TDigestState, b: TDigestState) -> TDigestState:
    if a.spec != b.spec:
        raise ValueError(f"tdigest spec mismatch: {a.spec} vs {b.spec}")
    _flush(a)
    _flush(b)
    m, w = _compress(a.spec, np.concatenate([a.means, b.means]), np.concatenate([a.weights, b.weights]))
    return TDigestState(a.spec, m, w)


def total_weight(state: TDigestState) -> float:
    _flush(state)
    return float(state.weights.sum())


def quantile(state: TDigestState, q) -> np.ndarray:
    """Interpolated quantile(s); q scalar or array in [0, 1]."""
    _flush(state)
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
    m, w = state.means, state.weights
    if m.size == 0:
        return np.full(qs.shape, np.nan)
    if m.size == 1:
        return np.full(qs.shape, m[0])
    total = w.sum()
    # centroid "centers" in cumulative-weight space
    cum = np.cumsum(w) - w / 2.0
    targets = qs * total
    # scalar q still yields a 1-element array — established caller
    # contract (quantile(st, 0.5)[0] throughout catalog/tests)
    return np.interp(targets, cum, m, left=m[0], right=m[-1])


def cdf(state: TDigestState, x) -> np.ndarray:
    _flush(state)
    xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
    m, w = state.means, state.weights
    if m.size == 0:
        return np.full(xs.shape, np.nan)
    total = w.sum()
    cum = np.cumsum(w) - w / 2.0
    return np.interp(xs, m, cum / total, left=0.0, right=1.0)


def equals(a: TDigestState, b: TDigestState) -> bool:
    _flush(a)
    _flush(b)
    return a.spec == b.spec and np.array_equal(a.means, b.means) and np.array_equal(a.weights, b.weights)


def to_bytes(state: TDigestState) -> bytes:
    _flush(state)
    return (
        _MAGIC
        + struct.pack("<dQ", state.spec.compression, state.means.size)
        + state.means.tobytes()
        + state.weights.tobytes()
    )


def from_bytes(data: bytes) -> TDigestState:
    if data[:4] != _MAGIC:
        raise ValueError("not a tdigest state blob")
    compression, n = struct.unpack_from("<dQ", data, 4)
    off = 4 + 16
    means = np.frombuffer(data, dtype=np.float64, offset=off, count=n).copy()
    weights = np.frombuffer(data, dtype=np.float64, offset=off + 8 * n, count=n).copy()
    return TDigestState(TDigestSpec(compression=compression), means, weights)
