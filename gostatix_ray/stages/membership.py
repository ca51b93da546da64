"""Membership application: broadcast a built filter into a dataset filter.

The reference's ``Lookup`` (bloom_filter.go:188-215, cuckoo_filter.go:
118-125) at dataset scale: the final merged filter state is put in the
object store ONCE (``ray.put``) and each actor deserializes it ONCE in
``__init__`` — never re-shipped per batch — then batches are filtered
with the vectorized ``contains`` kernel (semi-join without a shuffle;
see ray_guide "Semi / anti join").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..registry import kernel_for


class MembershipFilter:
    """Task callable: keep (or drop) rows whose key is in the sketch filter.
    The broadcast state deserializes lazily ONCE PER WORKER (the unpickled
    callable is cached per worker process), not per batch."""

    def __init__(self, state_ref, kind: str, column: str, negate: bool = False):
        self._ref = state_ref
        self._kind = kind
        self._state = None
        self._column = column
        self._negate = negate

    def _ensure(self):
        if self._state is None:
            import ray

            blob = ray.get(self._ref) if not isinstance(self._ref, (bytes, bytearray)) else self._ref
            self._kernel = kernel_for(self._kind)
            self._state = self._kernel.from_bytes(blob)
            self._lookup = self._kernel.contains if self._kind == "bloom" else self._kernel.lookup_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        col = batch[self._column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = self._lookup(self._state, col)
        if self._negate:
            mask = ~mask
        return batch.filter(pa.array(mask))


class PartitionedCuckoo:
    """The distributed cuckoo filter: one kernel filter per key-partition.

    Cuckoo states don't merge (eviction chains are order-state), so the
    distributed form keeps the per-partition filters and a lookup is the
    OR over partitions (SURVEY.md §2.4).  Keys are routed by
    ``hash(key) % n_partitions`` at build AND lookup time, so each probe
    touches exactly ONE partition filter — lookup stays O(1) regardless
    of partition count.  ``remove`` routes the same way (sound: a key
    only ever lives in its own partition's filter).
    """

    def __init__(self, spec, n_partitions: int, seed: int = 0):
        from ..kernels import cuckoo

        self._cuckoo = cuckoo
        self.spec = spec
        self.n = n_partitions
        self.states = [cuckoo.new(spec, seed=seed + i) for i in range(n_partitions)]

    def _route(self, values) -> tuple:
        from ..hashing import hash128_keyed

        h1, _ = hash128_keyed(values, 9)
        return (h1 % np.uint64(self.n)).astype(np.int64)

    def insert(self, values) -> None:
        import pyarrow as pa

        arr = values if isinstance(values, pa.Array) else pa.array([str(v) for v in values])
        part = self._route(arr)
        for p in np.unique(part):
            self._cuckoo.insert_batch(self.states[p], arr.filter(pa.array(part == p)))

    def lookup(self, values) -> np.ndarray:
        import pyarrow as pa

        arr = values if isinstance(values, pa.Array) else pa.array([str(v) for v in values])
        part = self._route(arr)
        out = np.zeros(len(arr), dtype=bool)
        for p in np.unique(part):
            mask = part == p
            out[mask] = self._cuckoo.lookup_batch(self.states[p], arr.filter(pa.array(mask)))
        return out

    def remove(self, values) -> np.ndarray:
        import pyarrow as pa

        arr = values if isinstance(values, pa.Array) else pa.array([str(v) for v in values])
        part = self._route(arr)
        out = np.zeros(len(arr), dtype=bool)
        for p in np.unique(part):
            mask = part == p
            out[mask] = self._cuckoo.remove_batch(self.states[p], arr.filter(pa.array(mask)))
        return out

    def to_bytes(self) -> bytes:
        import struct

        blobs = [self._cuckoo.to_bytes(s) for s in self.states]
        head = struct.pack("<QQ", self.n, len(blobs[0]) if blobs else 0)
        return b"PCKF" + head + b"".join(struct.pack("<Q", len(b)) + b for b in blobs)

    @classmethod
    def from_bytes(cls, data: bytes) -> "PartitionedCuckoo":
        import struct

        from ..kernels import cuckoo

        assert data[:4] == b"PCKF"
        n, _ = struct.unpack_from("<QQ", data, 4)
        off = 20
        states = []
        for _ in range(n):
            (ln,) = struct.unpack_from("<Q", data, off)
            off += 8
            states.append(cuckoo.from_bytes(data[off : off + ln]))
            off += ln
        obj = cls.__new__(cls)
        obj._cuckoo = cuckoo
        obj.spec = states[0].spec if states else None
        obj.n = n
        obj.states = states
        return obj


def build_partitioned_cuckoo(ds, column: str, spec, *, n_partitions: int = 16, concurrency=None):
    """Build a PartitionedCuckoo over a key column of a Dataset.

    Keys are hash-routed to ``n_partitions`` and each partition's filter
    is built independently (groupby shuffle of (partition, key) rows);
    insertion order within a partition follows the shuffled block order —
    acceptable because cuckoo membership is insert-order-insensitive
    (only the eviction layout differs).  Returns the driver-side
    PartitionedCuckoo (states are small relative to keys).
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..hashing import hash128_keyed
    from ..kernels import cuckoo

    def _route(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.cast(col, pa.string())
        h1, _ = hash128_keyed(col, 9)
        return pa.table(
            {
                "key": col,
                "part": pa.array((h1 % np.uint64(n_partitions)).astype(np.int64)),
            }
        )

    def _build(df: pd.DataFrame) -> pd.DataFrame:
        p = int(df["part"].iloc[0])
        state = cuckoo.new(spec, seed=p)
        keys = sorted(set(df["key"]))  # dedupe + deterministic order
        cuckoo.insert_batch(state, keys)
        return pd.DataFrame({"part": [p], "state": [cuckoo.to_bytes(state)]})

    rows = (
        ds.map_batches(_route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_build, batch_format="pandas")
        .to_pandas()
    )
    pc_filter = PartitionedCuckoo.__new__(PartitionedCuckoo)
    pc_filter._cuckoo = cuckoo
    pc_filter.spec = spec
    pc_filter.n = n_partitions
    pc_filter.states = [None] * n_partitions
    for _, row in rows.iterrows():
        pc_filter.states[int(row["part"])] = cuckoo.from_bytes(row["state"])
    for i, s in enumerate(pc_filter.states):
        if s is None:
            pc_filter.states[i] = cuckoo.new(spec, seed=i)
    return pc_filter


class PartitionedCuckooFilterStage:
    """Task callable filtering rows through a broadcast PartitionedCuckoo
    (lazy once-per-worker deserialization, as MembershipFilter)."""

    def __init__(self, blob_ref, column: str, negate: bool = False):
        self._ref = blob_ref
        self._filter = None
        self._column = column
        self._negate = negate

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self._filter is None:
            import ray

            blob = ray.get(self._ref) if not isinstance(self._ref, (bytes, bytearray)) else self._ref
            self._filter = PartitionedCuckoo.from_bytes(blob)
        col = batch[self._column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = self._filter.lookup(pc.cast(col, pa.string()))
        if self._negate:
            mask = ~mask
        return batch.filter(pa.array(mask))


def filter_by_partitioned_cuckoo(ds, filt: "PartitionedCuckoo", column: str, *, negate=False,
                                 batch_size: int = 65536, concurrency=None):
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    ref = ray.put(filt.to_bytes())
    return ds.map_batches(
        PartitionedCuckooFilterStage(ref, column, negate),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def filter_by_membership(ds, state_bytes: bytes, kind: str, column: str, *, negate=False,
                         batch_size: int = 65536, concurrency=None):
    """ds -> rows whose ``column`` passes the bloom/cuckoo filter.

    May keep false positives at the filter's configured FPP; never drops
    true members (bloom) — the usual semi-join contract.
    """
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    state_ref = ray.put(state_bytes)  # broadcast once, read per worker
    return ds.map_batches(
        MembershipFilter(state_ref, kind, column, negate),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
