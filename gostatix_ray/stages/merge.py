"""Merge stage: bounded-fan-in tree reduction of partial-sketch rows.

Ray Data realization of the reference's ``Merge`` operators
(hyperloglog.go:79-87, count_min_sketch.go:138-151 — SURVEY.md §2.4):
partial states flow as immutable rows through a ``groupby`` tree; each
level merges at most ``fan_in`` partials per (sketch, group_key) bucket,
so at 10^12-turn scale (~10^6 partials) the reduction is
⌈log_64 10^6⌉ = 4 shuffle levels of *tiny* data (#partials × state
size), never a single giant reduce task.

Retry idempotency: partials are deduped on their content-derived
``fragment`` id first — a retried upstream block contributes once.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from ..registry import kernel_for
from .build import compress_state, decompress_state


from contextlib import contextmanager


@contextmanager
def full_throttle():
    """Disable Ray Data's per-operator CPU reservation while a sketch
    pipeline executes (restored on exit).

    CAVEAT: the session context is snapshotted at ROOT dataset creation,
    so this manager only affects datasets CREATED inside the with-block;
    for an input dataset created elsewhere use
    :func:`full_throttle_dataset`, which mutates that dataset's own
    context (SketchPipeline.run does both).

    Sketch pipelines are FUNNELS: a compute-heavy build map feeding
    combines/merges whose total work is seconds.  The streaming
    executor's ReservationOpResourceAllocator (ratio 0.5) holds back
    half the cluster for those tiny downstream operators, halving build
    parallelism — measured 47s -> 21s on the 32M-turn flagship at 8
    CPUs.  Safe here because every stage is stateless-task dispatch
    (tasks finish and free slots; no actor pool can hold the cluster).
    """
    try:
        from ray.data import DataContext
    except ImportError:  # pragma: no cover
        yield
        return
    ctx = DataContext.get_current()
    prev = getattr(ctx, "op_resource_reservation_enabled", None)
    if prev is None:  # pragma: no cover - older/newer ray without the knob
        yield
        return
    ctx.op_resource_reservation_enabled = False
    try:
        yield
    finally:
        ctx.op_resource_reservation_enabled = prev


def full_throttle_dataset(ds):
    """Per-dataset reservation kill-switch (see :func:`full_throttle`).

    Ray snapshots the DataContext at ROOT dataset creation and derived
    datasets inherit the parent's copy, so a context manager around
    later pipeline construction is a NO-OP for externally-created
    inputs (measured: 42s vs 15s on the 32M-turn flagship).  Mutating
    the dataset's OWN context propagates to everything derived from it.
    """
    try:
        ds.context.op_resource_reservation_enabled = False
    except Exception:  # pragma: no cover - older ray without the knob
        pass
    return ds


def _state_views(col):
    """Zero-copy memoryview accessor over a binary/large_binary column:
    returns ``blob(i)`` slicing straight into the Arrow data buffer —
    the compressed states are never boxed into Python bytes objects
    (zlib accepts any buffer) until the kernel decodes them."""
    import numpy as np
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_binary(arr.type):
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                             count=len(arr) + 1, offset=arr.offset * 8)
    else:
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                             count=len(arr) + 1, offset=arr.offset * 4)
    data = memoryview(arr.buffers()[2])
    return lambda i: data[offs[i] : offs[i + 1]]


def _combine_table(tbl) -> "pa.Table":
    """Merge all partial rows of each (sketch, group_key) in one Arrow
    block — the round-2-verdict Arrow-native combine: only the tiny
    metadata strings are materialized to Python; state blobs are
    zero-copy buffer slices (the pandas object-column copies are gone
    from the one stage guaranteed to run at every scale)."""
    import pyarrow as pa

    sketches = tbl["sketch"].to_pylist()
    gkeys = tbl["group_key"].to_pylist()
    kinds = tbl["kind"].to_pylist()
    frags = tbl["fragment"].to_pylist()
    rows = tbl["rows"].to_pylist()
    blob = _state_views(tbl["state"])

    groups: dict[tuple, dict] = {}
    for i, key in enumerate(zip(sketches, gkeys)):
        # dedupe retried fragments (content-addressed => identical payloads)
        groups.setdefault(key, {}).setdefault(frags[i], i)
    out = {c: [] for c in ("sketch", "kind", "group_key", "state", "rows", "fragment", "checksum")}
    for (sk, gk), seen in groups.items():
        # deterministic merge order => byte-identical tree for byte-stable kinds
        ordered = [seen[f] for f in sorted(seen)]
        kind = kinds[ordered[0]]
        kernel = kernel_for(kind)
        bulk = getattr(kernel, "merge_blobs", None)
        if bulk is not None and len(ordered) > 1:
            # kernel-aware bulk merge (e.g. bloom: one unique-sort over
            # all position blobs instead of per-blob scatter+OR)
            state = bulk([decompress_state(blob(i)) for i in ordered])
        else:
            state = kernel.from_bytes(decompress_state(blob(ordered[0])))
            for i in ordered[1:]:
                state = kernel.merge(state, kernel.from_bytes(decompress_state(blob(i))))
        out_blob = compress_state(kernel.to_bytes(state))
        frag = hashlib.blake2b("|".join(sorted(seen)).encode(), digest_size=12).hexdigest()
        out["sketch"].append(sk)
        out["kind"].append(kind)
        out["group_key"].append(gk)
        out["state"].append(out_blob)
        out["rows"].append(sum(rows[i] for i in seen.values()))
        out["fragment"].append(f"{sk}:{gk}:{frag}")
        out["checksum"].append(hashlib.blake2b(out_blob, digest_size=8).hexdigest())
    return pa.table(
        {
            "sketch": pa.array(out["sketch"], pa.string()),
            "kind": pa.array(out["kind"], pa.string()),
            "group_key": pa.array(out["group_key"], pa.string()),
            "state": pa.array(out["state"], pa.large_binary()),
            "rows": pa.array(out["rows"], pa.int64()),
            "fragment": pa.array(out["fragment"], pa.string()),
            "checksum": pa.array(out["checksum"], pa.string()),
        }
    )


def _merge_group(df: pd.DataFrame) -> pd.DataFrame:
    """pandas-compat wrapper over :func:`_combine_table` (single group or
    multiple — the Arrow combine handles both); kept for callers/tests
    that hold partial rows in a DataFrame."""
    import pyarrow as pa

    return _combine_table(pa.Table.from_pandas(df, preserve_index=False)).to_pandas()


_local_combine = _merge_group  # historical alias: both merged per-block


def merge_partials(partials, *, fan_in: int = 64, tree_threshold: int = 4096):
    """Tree-merge a Dataset of partial rows to one row per (sketch, group_key).

    Small partial sets (the common case: #input-blocks x #groups below
    ``tree_threshold``) merge in ONE ``groupby(sketch, group_key)``
    shuffle of tiny rows.  Larger sets first reduce ``fan_in``-sized
    hash buckets per group, then do the final per-group merge — at
    10^12-turn scale (~10^6 partials) that is ⌈log_fan_in n⌉ tiny
    shuffle levels, never one giant reduce task.  Returns a Dataset with
    the partial-row schema.
    """
    """(docstring above still applies)

    Implementation: a COMBINER tree, not a shuffle tree.  Each level
    coalesces partial rows into ~``fan_in``-row blocks (``repartition``
    without shuffle — cheap block concatenation) and merges within each
    block via ``map_batches`` (zero network movement).  Only the final
    per-(sketch, group_key) reduction — a handful of rows — is a real
    ``groupby`` shuffle.  At 10^6 partials this is ~3 local levels +
    one tiny all-to-all, vs log-many sort shuffles for a naive tree.
    """
    # partial rows are tiny (states, not data) — materialize so the count
    # and the merge don't each re-execute the upstream build pipeline
    ds = partials.materialize()
    n = ds.count()
    levels = 0
    while n > tree_threshold and levels < 8:
        blocks = max(1, n // fan_in)
        ds = (
            ds.repartition(blocks)
            .map_batches(_combine_table, batch_format="pyarrow")
            .materialize()
        )
        n = ds.count()
        levels += 1
    # last local combine pass bounds the final shuffle to <= #groups rows
    # per block
    ds = ds.repartition(max(1, min(8, n // 32 + 1))).map_batches(_combine_table, batch_format="pyarrow")
    return ds.groupby(["sketch", "group_key"]).map_groups(_combine_table, batch_format="pyarrow")


def merge_partials_streaming(partials, *, combine_batch: int = 512, levels: int = 2,
                             final: str = "groupby"):
    """Single streaming execution: build -> bundled combines -> one sort.

    Unlike :func:`merge_partials` this never materializes or counts the
    partials, so the build stage, the combines and the final merge all
    overlap under the streaming executor (no serial phase boundary).

    The combiner levels are SHUFFLE-FREE: ``map_batches`` with a row
    ``batch_size`` bundles many small partial blocks into one task
    (narrow op — blocks are bundled where they are produced), and
    ``_local_combine`` merges every (sketch, group_key) present in the
    bundle.  Each level divides the partial count by ~``combine_batch``
    (no-op at small scale), so after ``levels`` passes the single
    ``groupby`` sort sees at most ~n/combine_batch^levels rows per
    group — e.g. 10^9 block-partials -> ~4k final merges per group —
    while shuffling only the tiny combined rows.  ``combine_batch``
    also caps per-task memory at ~combine_batch x compressed-state-size
    (~50 MB at the default).

    ``final="single"``: collapse the residue into ONE task
    (``repartition(1)`` + combine) instead of the per-group sort —
    Ray's all-to-all Sort costs ~0.7 s of fixed machinery even on a
    dozen rows.  Only valid when the total final group count is small
    (no ``group_by``, or few groups): the single task must hold every
    group's state.  ``"groupby"`` remains the scale-general default.
    """
    ds = partials
    for _ in range(levels):
        # the memory hint's real job is to make this op's remote args
        # DIFFER from the builder's so Ray does not fuse the combine
        # INTO the build map — that fusion would block the far more
        # valuable read->build fusion one level up (see build_partials
        # docstring).  Unlike a fractional num_cpus it does not
        # oversubscribe the cluster (measured: 0.5-cpu combines thrash
        # the 8-cpu level, build cpu-time +35%).
        ds = ds.map_batches(_combine_table, batch_format="pyarrow",
                            batch_size=combine_batch, memory=256 * 1024 * 1024)
    if final == "single":
        return ds.repartition(1).map_batches(_combine_table, batch_format="pyarrow", batch_size=None)
    return ds.groupby(["sketch", "group_key"]).map_groups(_combine_table, batch_format="pyarrow")


def collect_final(merged) -> dict[tuple[str, str], bytes]:
    """Small final result: {(sketch, group_key): state bytes}.

    (No full_throttle() wrapper here: the DataContext is snapshotted at
    ROOT dataset creation, so toggling it around iteration of an
    already-built dataset is a no-op — callers that want reservation
    off must build their pipeline under full_throttle() / pass it
    through full_throttle_dataset, as SketchPipeline.run does.)
    """
    out = {}
    for batch in merged.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for row in batch.to_pylist():
            out[(row["sketch"], row["group_key"])] = decompress_state(row["state"])
    return out


def final_state(final: dict, req, group_key: str = ""):
    """Decoded kernel state for ``(req.name, group_key)`` from a
    :func:`collect_final` dict — or the request's EMPTY state when the
    key is absent.  An empty input stream emits no partials at all
    (every build batch is skipped), so the merged dict has no entry;
    the sketch of an empty stream is the freshly-constructed sketch
    (HLL count 0, empty top-k, all-zero CMS/Bloom), not a crash."""
    from ..registry import kernel_for

    k = kernel_for(req.kind)
    blob = final.get((req.name, group_key))
    return k.from_bytes(blob) if blob is not None else k.new(req.spec)


def final_blob(final: dict, req, group_key: str = "") -> bytes:
    """Raw serialized state for ``(req.name, group_key)``; empty input
    stream -> the request's fresh state, serialized (see
    :func:`final_state`)."""
    from ..registry import kernel_for

    blob = final.get((req.name, group_key))
    if blob is not None:
        return blob
    k = kernel_for(req.kind)
    return k.to_bytes(k.new(req.spec))
