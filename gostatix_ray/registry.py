"""Kernel registry: sketch kind -> kernel module (uniform protocol).

Every kernel module exposes: new(spec), update(state, values[, counts]),
merge(a, b), to_bytes(state), from_bytes(blob), equals(a, b).
"""

from __future__ import annotations

from .kernels import (bloom, cms, cuckoo, ddsketch, hll, kll, kmv,
                      moments, spacesaving, tdigest, topk)

KERNELS = {
    "bloom": bloom,
    "hll": hll,
    "cms": cms,
    "topk": topk,
    "cuckoo": cuckoo,
    "tdigest": tdigest,
    "kll": kll,
    "moments": moments,
    "kmv": kmv,
    "ddsketch": ddsketch,
    "spacesaving": spacesaving,
}

#: kinds whose merge is associative AND byte-stable (bit-identical final
#: state for any partition order).  tdigest / kll merges preserve error
#: bounds but not bytes; cuckoo has no merge at all (partitioned filter).
#: moments is byte-stable because its power sums are exact Python ints;
#: kmv because bottom-k of a hash union is order-free; ddsketch because
#: its hi-anchored collapse floor is a pure function of the summed counts.
BYTE_STABLE = {"bloom", "hll", "cms", "topk", "moments", "kmv", "ddsketch"}
MERGEABLE = {"bloom", "hll", "cms", "topk", "tdigest", "kll",
             "moments", "kmv", "ddsketch", "spacesaving"}


def kernel_for(kind: str):
    try:
        return KERNELS[kind]
    except KeyError:
        raise ValueError(f"unknown sketch kind {kind!r}; known: {sorted(KERNELS)}") from None
