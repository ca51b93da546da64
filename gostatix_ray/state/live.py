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

        def __init__(self, kind: str, state_blob: bytes):
            self._kind = kind
            self._kernel = kernel_for(kind)
            self._state = self._kernel.from_bytes(state_blob)

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
