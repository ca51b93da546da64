"""KLL quantile sketch kernel (no reference counterpart; north-rule extra).

Implements the KLL sketch of Karnin, Lang & Liberty, "Optimal Quantile
Approximation in Streams" (FOCS 2016; cf. PAPERS.md "Relative Error
Streaming Quantiles" for the relative-error variant lineage): a stack of
compactors where level h holds items of weight 2^h; compaction sorts a
level and promotes every other item (random even/odd offset) to level
h+1.  Capacity of level h (top level H): cap(h) = max(ceil(k * c^(H-1-h)), 2)
with c = 2/3.

Rank error: eps ~ O(1/k) with high probability; tests assert empirical
rank error on deterministic streams.  merge(a, b) concatenates levels
and re-compacts: associative in distribution / error bound, not
byte-identical across merge orders (compaction offsets are drawn from a
per-state deterministic PRNG) — documented deviation from the
byte-stability of the five gostatix sketches.
"""

from __future__ import annotations

from dataclasses import dataclass
import struct

import numpy as np

_MAGIC = b"GXKL"
_C = 2.0 / 3.0


@dataclass(frozen=True)
class KLLSpec:
    k: int = 200

    def __post_init__(self):
        if self.k < 8:
            raise ValueError("k must be >= 8")


class KLLState:
    __slots__ = ("spec", "levels", "n", "rng")

    def __init__(self, spec: KLLSpec, levels: list[np.ndarray], n: int, rng: np.random.Generator):
        self.spec = spec
        self.levels = levels  # levels[h]: float64 items of weight 2^h (unsorted)
        self.n = n
        self.rng = rng

    def copy(self) -> "KLLState":
        rng = np.random.default_rng(0)
        rng.bit_generator.state = self.rng.bit_generator.state
        return KLLState(self.spec, [lvl.copy() for lvl in self.levels], self.n, rng)


def new(spec: KLLSpec, seed: int = 0) -> KLLState:
    return KLLState(spec, [np.empty(0, np.float64)], 0, np.random.default_rng(seed))


def _capacity(spec: KLLSpec, level: int, num_levels: int) -> int:
    depth = num_levels - 1 - level
    return max(int(np.ceil(spec.k * (_C**depth))), 2)


def _compact(state: KLLState) -> None:
    """Compact the lowest over-capacity level (standard KLL)."""
    while True:
        H = len(state.levels)
        total_cap = sum(_capacity(state.spec, h, H) for h in range(H))
        if sum(lvl.size for lvl in state.levels) <= total_cap:
            return
        for h in range(H):
            if state.levels[h].size > _capacity(state.spec, h, H):
                items = np.sort(state.levels[h], kind="stable")
                offset = int(state.rng.integers(0, 2))
                promoted = items[offset::2]
                state.levels[h] = np.empty(0, np.float64)
                if h + 1 == H:
                    state.levels.append(promoted)
                else:
                    state.levels[h + 1] = np.concatenate([state.levels[h + 1], promoted])
                break
        else:
            return


def update(state: KLLState, values, counts=None) -> None:
    v = np.asarray(values, dtype=np.float64)
    mask = ~np.isnan(v)
    if counts is not None:
        # weighted insert: align counts with values BEFORE the NaN mask so
        # weights stay attached to their own elements.  Weights are then
        # handled LOGICALLY via bit decomposition — a count c contributes
        # value x once at level h (weight 2^h) for each set bit h of c —
        # O(n log max_c) inserted items, never an O(sum c) np.repeat
        # materialization (a single pre-aggregated (value, 10^9) row is
        # normal at this engine's scale and must not allocate 8 GB).
        c = np.asarray(counts, dtype=np.int64)
        if c.size < v.size:
            c = np.pad(c, (0, v.size - c.size), constant_values=1)
        v, c = v[mask], np.maximum(c[: v.size][mask], 0)
        keep = c > 0
        v, c = v[keep], c[keep]
        if v.size == 0:
            return
        for h in range(int(c.max()).bit_length()):
            sel = (c >> h) & 1 == 1
            if not sel.any():
                continue
            while h >= len(state.levels):
                state.levels.append(np.empty(0, np.float64))
            state.levels[h] = np.concatenate([state.levels[h], v[sel]])
        state.n += int(c.sum())
        _compact(state)
        return
    v = v[mask]
    if v.size == 0:
        return
    state.levels[0] = np.concatenate([state.levels[0], v])
    state.n += v.size
    _compact(state)


def merge(a: KLLState, b: KLLState) -> KLLState:
    if a.spec != b.spec:
        raise ValueError(f"kll spec mismatch: {a.spec} vs {b.spec}")
    out = a.copy()
    for h, lvl in enumerate(b.levels):
        while h >= len(out.levels):
            out.levels.append(np.empty(0, np.float64))
        out.levels[h] = np.concatenate([out.levels[h], lvl])
    out.n += b.n
    _compact(out)
    return out


def _weighted_items(state: KLLState) -> tuple[np.ndarray, np.ndarray]:
    vals, wts = [], []
    for h, lvl in enumerate(state.levels):
        if lvl.size:
            vals.append(lvl)
            wts.append(np.full(lvl.size, float(2**h)))
    if not vals:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    v = np.concatenate(vals)
    w = np.concatenate(wts)
    order = np.argsort(v, kind="stable")
    return v[order], w[order]


def quantile(state: KLLState, q) -> np.ndarray:
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
    v, w = _weighted_items(state)
    if v.size == 0:
        return np.full(qs.shape, np.nan)
    cum = np.cumsum(w)
    total = cum[-1]
    idx = np.searchsorted(cum, qs * total, side="left")
    idx = np.clip(idx, 0, v.size - 1)
    return v[idx]


def rank(state: KLLState, x) -> np.ndarray:
    """Approximate normalized rank of x."""
    xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
    v, w = _weighted_items(state)
    if v.size == 0:
        return np.full(xs.shape, np.nan)
    cum = np.concatenate([[0.0], np.cumsum(w)])
    pos = np.searchsorted(v, xs, side="right")
    return cum[pos] / cum[-1]


def equals(a: KLLState, b: KLLState) -> bool:
    if a.spec != b.spec or len(a.levels) != len(b.levels) or a.n != b.n:
        return False
    return all(np.array_equal(x, y) for x, y in zip(a.levels, b.levels))


def to_bytes(state: KLLState) -> bytes:
    out = [_MAGIC, struct.pack("<QQQ", state.spec.k, state.n, len(state.levels))]
    for lvl in state.levels:
        out.append(struct.pack("<Q", lvl.size))
        out.append(np.sort(lvl, kind="stable").tobytes())  # canonical order within level
    return b"".join(out)


def from_bytes(data: bytes) -> KLLState:
    if data[:4] != _MAGIC:
        raise ValueError("not a kll state blob")
    k, n, nlev = struct.unpack_from("<QQQ", data, 4)
    off = 4 + 24
    levels = []
    for _ in range(nlev):
        (sz,) = struct.unpack_from("<Q", data, off)
        off += 8
        levels.append(np.frombuffer(data, dtype=np.float64, offset=off, count=sz).copy())
        off += 8 * sz
    return KLLState(KLLSpec(k=k), levels, n, np.random.default_rng(0))
