"""Sketches as native Ray Data aggregations (``ray.data.aggregate.AggregateFn``).

The UDAF form of SURVEY.md §2.4: ``ds.aggregate(sketch_agg(...))`` or
``ds.groupby(key).aggregate(sketch_agg(...))`` — Ray's aggregation
machinery drives accumulate-per-block + tree combine, and the sketch's
associative ``merge`` is the combiner.  Equivalent results to the
build/merge pipeline (tests/test_aggs.py); the pipeline form remains
preferred for multi-sketch single-pass builds, lineage and checkpoints.

The accumulator is the kernel state itself; ``finalize`` returns the
serialized state (callers deserialize with the kernel's ``from_bytes``)
so grouped results survive Arrow block boundaries as binary cells.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from .registry import MERGEABLE, kernel_for


def sketch_agg(kind: str, spec: Any, on: str, *, alias_name: str | None = None, weight: str | None = None):
    """Build an AggregateFn computing one sketch over column ``on``.

    ``kind`` must be mergeable (bloom/hll/cms/topk/tdigest/kll —
    cuckoo is not; see stages.membership.PartitionedCuckoo);
    ddsketch/spacesaving included.
    """
    if kind not in MERGEABLE:
        raise ValueError(f"kind {kind!r} is not mergeable; cannot be an aggregation")
    from ray.data.aggregate import AggregateFn

    kernel = kernel_for(kind)
    name = alias_name or f"{kind}({on})"

    def _init(_key):
        return kernel.to_bytes(kernel.new(spec))

    def _accumulate_block(acc: bytes, block) -> bytes:
        state = kernel.from_bytes(acc)
        if isinstance(block, pa.Table):
            col = block[on]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            w = block[weight].to_numpy(zero_copy_only=False) if weight else None
        else:  # pandas
            col = pa.array(block[on])
            w = block[weight].to_numpy() if weight else None
        if kind in ("tdigest", "kll", "moments", "ddsketch"):
            kernel.update(state, col.to_numpy(zero_copy_only=False).astype(np.float64), w)
        elif w is not None and kind in ("cms", "topk", "spacesaving"):
            kernel.update(state, col, w)
        else:
            kernel.update(state, col)
        return kernel.to_bytes(state)

    def _merge(a: bytes, b: bytes) -> bytes:
        return kernel.to_bytes(kernel.merge(kernel.from_bytes(a), kernel.from_bytes(b)))

    def _finalize(acc: bytes) -> bytes:
        return acc

    return AggregateFn(
        init=_init,
        accumulate_block=_accumulate_block,
        merge=_merge,
        finalize=_finalize,
        name=name,
    )
