"""Live (shared-mutable) sketch state — the reference's Redis role (EP2).

The reference's second backend keeps sketch state in Redis so multiple
processes share ONE mutable structure with atomic updates
(SURVEY.md §3 EP2: bloom_filter.go:64-78, redis Lua scripts).  Batch
analytics doesn't need that — immutable partials + associative merge
replace it (§1.4) — but a few operations are *inherently* mutating:

* ``Remove`` on a cuckoo filter (cuckoo_filter.go:128-144);
* a continuously-updated membership filter consulted mid-stream.

For those, the Ray-native equivalent of "a Redis key" is a **named,
detached Ray actor**: one serialized writer (the reference's own
concurrency model — a mutex-guarded single writer, §1.3.9), addressable
from any task by name.  Updates batch through the actor; readers either
call it (strong consistency) or pull a snapshot to broadcast
(read-mostly).  This is the documented escape hatch of the build brief:
raw actors only where the Dataset API can't express the semantics.
"""

from __future__ import annotations

from ..registry import kernel_for


def _actor_class():
    import ray

    @ray.remote
    class _LiveSketch:
        """One mutable sketch behind a serialized actor mailbox."""

        def __init__(self, kind: str, state_blob: bytes, meta: dict | None = None):
            self._kind = kind
            self._kernel = kernel_for(kind)
            self._state = self._kernel.from_bytes(state_blob)
            self._meta = meta or {}

        def meta(self) -> dict:
            return self._meta

        def update(self, values, counts=None) -> int:
            if counts is not None:
                self._kernel.update(self._state, values, counts)
            else:
                self._kernel.update(self._state, values)
            return len(values)

        def remove(self, values):
            if self._kind != "cuckoo":
                raise NotImplementedError(f"remove is only supported for cuckoo, not {self._kind}")
            return self._kernel.remove_batch(self._state, values).tolist()

        def query(self, op: str, *args):
            fn = getattr(self._kernel, op)
            out = fn(self._state, *args)
            return out.tolist() if hasattr(out, "tolist") else out

        def snapshot(self) -> bytes:
            return self._kernel.to_bytes(self._state)

    return _LiveSketch


class LiveSketch:
    """Handle to a named live sketch actor (create or attach by name)."""

    def __init__(self, name: str, kind: str | None = None, spec=None, *, namespace: str = "gostatix"):
        import ray

        self.name = name
        try:
            self._actor = ray.get_actor(name, namespace=namespace)
        except ValueError:
            if kind is None or spec is None:
                raise ValueError(f"live sketch {name!r} does not exist; pass kind and spec to create it")
            kernel = kernel_for(kind)
            blob = kernel.to_bytes(kernel.new(spec))
            self._actor = (
                _actor_class()
                .options(name=name, namespace=namespace, lifetime="detached", max_restarts=0)
                .remote(kind, blob)
            )

    def update(self, values, counts=None):
        import ray

        return ray.get(self._actor.update.remote(values, counts))

    def remove(self, values):
        import ray

        return ray.get(self._actor.remove.remote(values))

    def query(self, op: str, *args):
        import ray

        return ray.get(self._actor.query.remote(op, *args))

    def snapshot(self) -> bytes:
        """Serialized current state — broadcastable into map_batches filters."""
        import ray

        return ray.get(self._actor.snapshot.remote())

    def drop(self):
        import ray

        ray.kill(self._actor)


class ShardedLiveSketch:
    """Hash-routed N-shard live sketch (round-3 verdict #8).

    A single detached actor serializes every write (the reference's own
    mutex-guarded single-writer model, §1.3.9), so a HOT shared filter
    bottlenecks on one mailbox.  This variant routes each element to
    ``shard = hash128(str(value)) % n_shards`` across N independent
    named actors (``{name}::shard{i}``) — aggregate write throughput
    scales with the shard count while every element still lands in
    exactly ONE deterministic shard, so:

    * membership/lookup queries route the same way and stay exact;
    * for the mergeable kinds (bloom OR, hll max, cms add) the merged
      snapshot is BYTE-IDENTICAL to what a single-writer sketch of the
      same spec would hold (insertion into these structures is
      element-wise idempotent w.r.t. grouping), asserted in
      tests/test_live_sketch.py;
    * cuckoo stays shard-resident (non-mergeable — kernels/cuckoo.py)
      exactly like PartitionedCuckoo: use ``shard_snapshots()``.

    Attach-by-name works like LiveSketch: constructing with an existing
    name reads the authoritative shard count from shard0's metadata
    (stamped at creation) and resolves EVERY shard — a dead shard is a
    hard error, never a silent truncation that would mis-route writes.
    """

    def __init__(self, name: str, kind: str | None = None, spec=None, *,
                 shards: int = 8, namespace: str = "gostatix"):
        import ray

        self.name = name
        self._namespace = namespace
        try:
            first = ray.get_actor(f"{name}::shard0", namespace=namespace)
        except ValueError:
            if kind is None or spec is None:
                raise ValueError(
                    f"sharded live sketch {name!r} does not exist; pass kind and spec to create it"
                )
            kernel = kernel_for(kind)
            blob = kernel.to_bytes(kernel.new(spec))
            cls = _actor_class()
            self._actors = [
                cls.options(name=f"{name}::shard{i}", namespace=namespace,
                            lifetime="detached", max_restarts=0).remote(
                                kind, blob, {"n_shards": shards})
                for i in range(shards)
            ]
            self._kind = kind
        else:
            # authoritative count from shard0 — NOT probe-until-missing,
            # which would truncate at a dead middle shard and route every
            # write wrong (hash % smaller_n) while old handles use % n
            n = int(ray.get(first.meta.remote()).get("n_shards", 0))
            if n <= 0:
                raise ValueError(
                    f"sharded live sketch {name!r}: shard0 carries no shard-count "
                    "metadata (created by an incompatible version?)"
                )
            self._actors = [first]
            for i in range(1, n):
                try:
                    self._actors.append(ray.get_actor(f"{name}::shard{i}", namespace=namespace))
                except ValueError:
                    raise RuntimeError(
                        f"sharded live sketch {name!r}: shard {i} of {n} is gone "
                        "(actor died or was dropped); the shard set is unrecoverable "
                        "— rebuild from a snapshot or drop() and recreate"
                    ) from None
            self._kind = kind  # optional on attach; only needed for snapshot()
        self.n_shards = len(self._actors)

    def _route(self, values):
        import pyarrow as pa

        from ..hashing import hash128

        import numpy as np

        vals = list(values)
        h1, _ = hash128(pa.array([str(v) for v in vals], pa.string()), 97)
        return vals, (h1 % np.uint64(self.n_shards)).astype(int)

    def update(self, values, counts=None) -> int:
        import ray

        vals, shard = self._route(values)
        futs = []
        for i in range(self.n_shards):
            sub = [v for v, s in zip(vals, shard) if s == i]
            if not sub:
                continue
            if counts is not None:
                csub = [c for c, s in zip(counts, shard) if s == i]
                futs.append(self._actors[i].update.remote(sub, csub))
            else:
                futs.append(self._actors[i].update.remote(sub))
        return sum(ray.get(futs)) if futs else 0

    def remove(self, values):
        import ray

        vals, shard = self._route(values)
        out = [None] * len(vals)
        futs, slots = [], []
        for i in range(self.n_shards):
            idx = [j for j, s in enumerate(shard) if s == i]
            if not idx:
                continue
            futs.append(self._actors[i].remove.remote([vals[j] for j in idx]))
            slots.append(idx)
        for res, idx in zip(ray.get(futs), slots):
            for j, r in zip(idx, res):
                out[j] = r
        return out

    def lookup(self, values, op: str = "lookup_batch"):
        """Routed membership query, results in input order."""
        import ray

        vals, shard = self._route(values)
        out = [None] * len(vals)
        futs, slots = [], []
        for i in range(self.n_shards):
            idx = [j for j, s in enumerate(shard) if s == i]
            if not idx:
                continue
            futs.append(self._actors[i].query.remote(op, [vals[j] for j in idx]))
            slots.append(idx)
        for res, idx in zip(ray.get(futs), slots):
            for j, r in zip(idx, res):
                out[j] = r
        return out

    def shard_snapshots(self) -> list[bytes]:
        import ray

        return ray.get([a.snapshot.remote() for a in self._actors])

    def snapshot(self) -> bytes:
        """ONE merged state blob (mergeable kinds only) — byte-identical
        to the single-writer sketch for bloom/hll/cms."""
        if self._kind is None:
            raise ValueError("pass kind= when attaching if you need merged snapshots")
        if self._kind == "cuckoo":
            raise NotImplementedError(
                "cuckoo filters do not merge (kernels/cuckoo.py); use shard_snapshots()"
            )
        kernel = kernel_for(self._kind)
        blobs = self.shard_snapshots()
        state = kernel.from_bytes(blobs[0])
        for b in blobs[1:]:
            state = kernel.merge(state, kernel.from_bytes(b))
        return kernel.to_bytes(state)

    def drop(self):
        import ray

        for a in self._actors:
            ray.kill(a)
