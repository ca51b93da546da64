"""Membership application: broadcast a built filter into a dataset filter.

The reference's ``Lookup`` (bloom_filter.go:188-215, cuckoo_filter.go:
118-125) at dataset scale: the final merged filter state is put in the
object store ONCE (``ray.put``) and each actor deserializes it ONCE in
``__init__`` — never re-shipped per batch — then batches are filtered
with the vectorized ``contains`` kernel (semi-join without a shuffle;
see ray_guide "Semi / anti join").
"""

from __future__ import annotations

import pyarrow as pa

from ..registry import kernel_for


class MembershipFilter:
    """Actor callable: keep (or drop) rows whose key is in the sketch filter."""

    def __init__(self, state_ref, kind: str, column: str, negate: bool = False):
        import ray

        blob = ray.get(state_ref) if not isinstance(state_ref, (bytes, bytearray)) else state_ref
        self._kernel = kernel_for(kind)
        self._state = self._kernel.from_bytes(blob)
        self._column = column
        self._negate = negate
        self._lookup = self._kernel.contains if kind == "bloom" else self._kernel.lookup_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self._column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = self._lookup(self._state, col)
        if self._negate:
            mask = ~mask
        return batch.filter(pa.array(mask))


def filter_by_membership(ds, state_bytes: bytes, kind: str, column: str, *, negate=False,
                         batch_size: int = 65536, concurrency=None):
    """ds -> rows whose ``column`` passes the bloom/cuckoo filter.

    May keep false positives at the filter's configured FPP; never drops
    true members (bloom) — the usual semi-join contract.
    """
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    state_ref = ray.put(state_bytes)  # broadcast once, read per actor
    return ds.map_batches(
        MembershipFilter,
        fn_constructor_args=(state_ref, kind, column, negate),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
