"""Top-K (heavy hitters) kernel — CMS + candidate set, distributed merge.

Reference semantics (/root/reference/top_k.go):
  * Insert(data, count): CMS update, then maintain a size-k min-heap of
    (element, cms-estimate-at-insert-time); gate: heap not full or
    frequency >= heap-min (top_k.go:95-113);
  * Values(): sort by (count desc, element asc), return k
    (top_k.go:116-134).

The reference has **no merge**.  Distributed semantics (SURVEY.md
§1.3.7): per-partition state = (CMS partial, local top-k candidate
set); merge = CMS add-merge + candidate **set union** (uncapped — set
union is associative/commutative, so merge order cannot change the
result); finalize = recount every candidate with the *merged* CMS and
take top-k by (count desc, element asc).  On a single partition this
reproduces the reference's test expectations (tests/test_topk.py ports
top_k_test.go:12-130), and it is partition-order-independent.
"""

from __future__ import annotations

from dataclasses import dataclass
import struct

import numpy as np

from . import cms as cms_mod

_MAGIC = b"GXTK"


@dataclass(frozen=True)
class TopKSpec:
    k: int
    error_rate: float = 0.001
    accuracy: float = 0.999  # delta, reference calls it "accuracy" (top_k.go:82-90)
    hash: str = "murmur"  # "metro" = reference-compatible metrohash128(1373)

    def cms_spec(self) -> cms_mod.CMSSpec:
        return cms_mod.CMSSpec.from_error_rate(self.error_rate, self.accuracy, hash=self.hash)


class TopKState:
    __slots__ = ("spec", "cms", "candidates")

    def __init__(self, spec: TopKSpec, cms_state: cms_mod.CMSState, candidates: dict[str, int]):
        self.spec = spec
        self.cms = cms_state
        self.candidates = candidates  # element -> last-seen local estimate

    def copy(self) -> "TopKState":
        return TopKState(self.spec, self.cms.copy(), dict(self.candidates))


def new(spec: TopKSpec) -> TopKState:
    return TopKState(spec, cms_mod.new(spec.cms_spec()), {})


def _aggregate(values, counts=None) -> tuple[list[str], np.ndarray]:
    """Collapse a batch to (distinct elements, summed counts) — vectorized
    through Arrow dictionary encoding when possible."""
    try:
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if not isinstance(values, pa.Array):
            values = pa.array(
                [v if isinstance(v, str) else (v.decode() if isinstance(v, (bytes, bytearray)) else str(v)) for v in values]
            )
        enc = values.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        keys = enc.dictionary.to_pylist()
        w = np.ones(len(codes)) if counts is None else np.asarray(counts, dtype=np.float64)
        summed = np.bincount(codes, weights=w, minlength=len(keys))
        return keys, summed
    except ImportError:  # pragma: no cover
        els: dict[str, int] = {}
        cs = [1] * len(values) if counts is None else counts
        for v, c in zip(values, cs):
            v = v if isinstance(v, str) else (v.decode() if isinstance(v, (bytes, bytearray)) else str(v))
            els[v] = els.get(v, 0) + int(c)
        keys = list(els.keys())
        return keys, np.array([els[k] for k in keys], dtype=np.float64)


def update(state: TopKState, values, counts=None) -> None:
    """Batched insert; equivalent to per-element Insert for order-insensitive
    workloads (top_k_test.go:60-90 asserts single-increment == batched)."""
    keys, summed = _aggregate(values, counts)
    if not keys:
        return
    cms_mod.update(state.cms, keys, summed)
    ests = cms_mod.count(state.cms, keys)
    cand = state.candidates
    k = state.spec.k
    if len(cand) >= k:
        gate = min(cand.values())
        for el, est in zip(keys, ests):
            if el in cand or est >= gate:
                cand[el] = int(est)
    else:
        for el, est in zip(keys, ests):
            cand[el] = int(est)
    if len(cand) > k:
        # keep top-k by (estimate desc, element asc) — deterministic stand-in
        # for the reference's arbitrary-tie min-heap pops
        keep = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        state.candidates = dict(keep)


def merge(a: TopKState, b: TopKState) -> TopKState:
    if a.spec != b.spec:
        raise ValueError(f"topk spec mismatch: {a.spec} vs {b.spec}")
    merged = cms_mod.merge(a.cms, b.cms)
    cand = dict(a.candidates)
    for el, est in b.candidates.items():
        cand[el] = max(cand.get(el, 0), est)
    return TopKState(a.spec, merged, cand)


def values(state: TopKState) -> list[tuple[str, int]]:
    """Top-k by (count desc, element asc); counts from the merged CMS."""
    if not state.candidates:
        return []
    els = sorted(state.candidates.keys())
    counts = cms_mod.count(state.cms, els)
    order = sorted(zip(els, counts.astype(int)), key=lambda t: (-t[1], t[0]))
    return [(el, int(c)) for el, c in order[: state.spec.k]]


def equals(a: TopKState, b: TopKState) -> bool:
    return a.spec == b.spec and cms_mod.equals(a.cms, b.cms) and set(a.candidates) == set(b.candidates)


def to_bytes(state: TopKState) -> bytes:
    cms_blob = cms_mod.to_bytes(state.cms)
    out = [
        _MAGIC,
        struct.pack("<QddQ", state.spec.k, state.spec.error_rate, state.spec.accuracy, len(cms_blob)),
        cms_blob,
        struct.pack("<Q", len(state.candidates)),
    ]
    for el in sorted(state.candidates):  # canonical order => byte-identical states
        raw = el.encode()
        out.append(struct.pack("<IQ", len(raw), state.candidates[el]))
        out.append(raw)
    return b"".join(out)


def from_bytes(data: bytes) -> TopKState:
    if data[:4] != _MAGIC:
        raise ValueError("not a topk state blob")
    k, err, acc, nbytes = struct.unpack_from("<QddQ", data, 4)
    off = 4 + 32
    cms_state = cms_mod.from_bytes(data[off : off + nbytes])
    off += nbytes
    (ncand,) = struct.unpack_from("<Q", data, off)
    off += 8
    cand: dict[str, int] = {}
    for _ in range(ncand):
        ln, est = struct.unpack_from("<IQ", data, off)
        off += 12
        cand[data[off : off + ln].decode()] = est
        off += ln
    return TopKState(TopKSpec(k=k, error_rate=err, accuracy=acc, hash=cms_state.spec.hash), cms_state, cand)
