"""SpaceSaving / Misra-Gries heavy-hitters kernel (no reference
counterpart; north-rule extra complementing the CMS+heap Top-K).

Implements the deficit-counting (Misra-Gries) summary in its mergeable
form — Agarwal, Cormode, Huang, Phillips, Wei & Yi, "Mergeable
Summaries" (PODS 2012 §3): a summary is ≤ k exact-deficit counters;
merging two summaries (or a summary with an exact batch count table)
sums matching counters, then subtracts the (k+1)-th largest count t
from every counter and drops the non-positive ones.  Guarantees, with
D = the state's accumulated deficit (``err``; D ≤ N/(k+1)):

    true_count - D  <=  estimate  <=  true_count

so every item with true count > N/(k+1) is guaranteed present.  When
the distinct-key count never exceeds k the summary is EXACT and merge
is plain addition (order-independent); with decrements the merge is
bound-preserving but not byte-stable (like tdigest/kll — the deficit
depends on merge order; documented, asserted in tests).

Updates are batch-vectorized: a batch collapses to its exact
(key, count) table first (Arrow dictionary encode + bincount — the
same `_aggregate` as the Top-K kernel), then ONE summary-merge absorbs
it; never a per-item Python loop.

Protocol: new / update / merge / values / heavy_hitters / equals /
to_bytes / from_bytes (registry.KERNELS uniform surface).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .topk import _aggregate

_MAGIC = b"GXSS"


@dataclass(frozen=True)
class SSSpec:
    k: int = 64

    def __post_init__(self):
        if self.k < 1:
            raise ValueError("k must be >= 1")


class SSState:
    __slots__ = ("spec", "counters", "n", "err")

    def __init__(self, spec: SSSpec, counters: dict[str, int], n: int,
                 err: int):
        self.spec = spec
        self.counters = counters  # key -> deficit count (underestimate)
        self.n = n                # total stream weight absorbed
        self.err = err            # accumulated deficit bound D

    def copy(self) -> "SSState":
        return SSState(self.spec, dict(self.counters), self.n, self.err)


def new(spec: SSSpec) -> SSState:
    return SSState(spec, {}, 0, 0)


def _absorb(state: SSState, items: dict[str, int]) -> None:
    """Merge an exact (or summary) count table into the state with the
    Misra-Gries k-counter reduction."""
    cand = state.counters
    for el, c in items.items():
        if c > 0:
            cand[el] = cand.get(el, 0) + c
    if len(cand) > state.spec.k:
        # (k+1)-th largest count; ties make any cut equivalent in bound
        t = sorted(cand.values(), reverse=True)[state.spec.k]
        state.counters = {el: c - t for el, c in cand.items() if c > t}
        state.err += t


def update(state: SSState, values, counts=None) -> None:
    keys, summed = _aggregate(values, counts)
    if not keys:
        return
    items = {el: int(c) for el, c in zip(keys, summed) if c > 0}
    state.n += sum(items.values())
    _absorb(state, items)


def merge(a: SSState, b: SSState) -> SSState:
    if a.spec != b.spec:
        raise ValueError(f"spacesaving spec mismatch: {a.spec} vs {b.spec}")
    out = a.copy()
    out.n += b.n
    out.err += b.err
    _absorb(out, b.counters)
    return out


def values(state: SSState, k: int | None = None) -> list[tuple[str, int]]:
    """Counters by (estimate desc, key asc), top ``k`` (default: all)."""
    order = sorted(state.counters.items(), key=lambda kv: (-kv[1], kv[0]))
    return order[: (k if k is not None else len(order))]


def heavy_hitters(state: SSState, phi: float) -> list[tuple[str, int]]:
    """All counters whose LOWER bound estimate is >= phi * n.  Every
    item with true count > phi*n + err is guaranteed in the output."""
    thresh = phi * state.n
    return [(el, c) for el, c in values(state) if c >= thresh]


def estimate(state: SSState, key: str) -> tuple[int, int]:
    """(lower, upper) bounds on key's true count: [est, est + err]."""
    est = state.counters.get(key, 0)
    return est, est + state.err


def equals(a: SSState, b: SSState) -> bool:
    return (a.spec == b.spec and a.n == b.n and a.err == b.err
            and a.counters == b.counters)


def to_bytes(state: SSState) -> bytes:
    items = sorted(state.counters.items())  # canonical key order
    out = [_MAGIC, struct.pack("<qqqq", state.spec.k, state.n, state.err,
                               len(items))]
    for el, c in items:
        raw = el.encode()
        out.append(struct.pack("<Iq", len(raw), c))
        out.append(raw)
    return b"".join(out)


def from_bytes(data: bytes) -> SSState:
    if data[:4] != _MAGIC:
        raise ValueError("not a spacesaving state blob")
    k, n, err, m = struct.unpack_from("<qqqq", data, 4)
    off = 4 + 32
    counters: dict[str, int] = {}
    for _ in range(m):
        ln, c = struct.unpack_from("<Iq", data, off)
        off += 12
        counters[data[off:off + ln].decode()] = c
        off += ln
    return SSState(SSSpec(k=int(k)), counters, int(n), int(err))
