"""Build stage: map_batches actor pool emitting partial-sketch rows.

This is the Ray Data realization of the reference's caller-driven
``Insert``/``Update`` loops (SURVEY.md §2.2): a stateful actor pool
(``ds.map_batches(SketchBuilder, batch_format="pyarrow",
zero_copy_batch=True, concurrency=...)``) where each actor parses the
sketch specs ONCE in ``__init__`` and then, per zero-copy Arrow block,
vectorized-hashes the key column(s) and scatters into fresh numpy
sketch states.

**Per-block flush**: every input block yields one partial row per
(request, group).  Partials are keyed by a content-derived ``fragment``
id, so a Ray task retry reproduces the *same* partial rows instead of
double-counting — this is what makes sum-type sketches (CMS) safe under
retries (SURVEY.md §4.2).  Downstream dedupes on ``fragment`` before
merging (stages/merge.py).

Partial-row schema (an Arrow table of sketches, itself a Dataset):
  sketch:str, kind:str, group_key:str, state:binary, rows:int64,
  fragment:str, checksum:str
"""

from __future__ import annotations

from dataclasses import dataclass, field
import hashlib
import zlib
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..registry import kernel_for

PARTIAL_SCHEMA = pa.schema(
    [
        ("sketch", pa.string()),
        ("kind", pa.string()),
        ("group_key", pa.string()),
        ("state", pa.large_binary()),
        ("rows", pa.int64()),
        ("fragment", pa.string()),
        ("checksum", pa.string()),
    ]
)


@dataclass(frozen=True)
class SketchRequest:
    """One sketch to build over the input.

    ``on``: column name, or a callable ``batch -> pa.Array`` projection
    (e.g. tokenize text, or compose a (role, tool) key).  ``weight``:
    optional count column aligned with ``on`` (CMS/top-k/t-digest/KLL).
    ``group_by``: optional column; one sketch state per distinct value.
    """

    name: str
    kind: str
    spec: Any
    on: str | Callable[[pa.Table], pa.Array]
    weight: str | None = None
    group_by: str | None = None


def composite_key(*cols: str, sep: str = "\x1f") -> Callable[[pa.Table], pa.Array]:
    """Project several columns into one key column (vectorized)."""

    def _proj(batch: pa.Table) -> pa.Array:
        arrays = [pc.cast(batch[c], pa.string()) for c in cols]
        joined = arrays[0]
        for arr in arrays[1:]:
            joined = pc.binary_join_element_wise(joined, arr, sep)
        return joined

    return _proj


def tokens_of(col: str, pattern: str = " ") -> Callable[[pa.Table], pa.Array]:
    """Project a text column into its flattened token stream."""

    def _proj(batch: pa.Table) -> pa.Array:
        return pc.list_flatten(pc.split_pattern(batch[col], pattern=pattern))

    return _proj


def _column_values(batch: pa.Table, req: SketchRequest) -> pa.Array:
    if callable(req.on):
        arr = req.on(batch)
    else:
        arr = batch[req.on]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


_ZMAGIC = b"ZLB1"
_RMAGIC = b"RAW1"


def compress_state(blob: bytes) -> bytes:
    """Partial states are often sparse (low-fill bitmaps, mostly-zero
    matrices); zlib level 1 shrinks them ~10x for a few ms/MB — shuffle
    bytes, not air.  Some encodings are already minimal (e.g. bloom's
    sorted set-bit positions): a 64 KB sample probe detects
    incompressible content and ships it raw — zlib on high-entropy data
    costs ~12-30 ms/MB to save little — a mid-fill merged bloom bitmap
    zlibs at ~25 ms/MB for a 0.45 ratio, pure overhead on states that
    exist only to cross one shuffle.  The probe is a
    deterministic function of the blob, so equal states keep equal
    wire bytes (merge byte-identity)."""
    if blob[:4] in (b"GXBS", b"GXBT"):
        # bloom position blobs: ~0.5 zlib ratio at 12-30 ms/MB, and the
        # sample probe misreads them (the sampled LOW positions have
        # small deltas and over-promise) — always raw
        return _RMAGIC + blob
    if len(blob) > 1 << 16:
        sample = zlib.compress(blob[: 1 << 16], 1)
        if len(sample) > (1 << 16) * 0.4:
            return _RMAGIC + blob
    return _ZMAGIC + zlib.compress(blob, 1)


def decompress_state(blob: bytes) -> bytes:
    if blob[:4] == _RMAGIC:
        return bytes(blob[4:])
    if blob[:4] == _ZMAGIC:
        return zlib.decompress(blob[4:])
    return bytes(blob)


def _fragment_id(values: pa.Array, nrows: int) -> str:
    """Content-derived block id component (cheap SAMPLED hash).

    Hashes the array's LOGICAL byte range (normalized offsets + head/tail
    data windows + lengths), never raw buffers: a zero-copy slice shares
    its parent's buffers, so buffer-hashing would give two different
    batches of one parent block the same id.  (Regression:
    tests/test_e2e_ray.py::test_fragment_ids_distinguish_slices.)

    UNIQUENESS between distinct blocks does NOT rest on this hash: the
    builder mixes a (task_id, per-task seq) discriminator into every
    fragment (see ``SketchBuilder.__call__``), which alone separates any
    two blocks — including byte-identical ones — while staying stable
    across retries of the same task.  The sampled content hash only adds
    retry-stability margin and a debuggable lineage label, so sampling
    (vs hashing every byte) is safe — a full-range hash measured 33% of
    the whole build stage and bought nothing (round-2 profiling).
    """
    h = hashlib.blake2b(digest_size=12)
    typ = values.type
    bufs = values.buffers()
    if pa.types.is_string(typ) or pa.types.is_binary(typ) or pa.types.is_large_string(typ) or pa.types.is_large_binary(typ):
        odt = np.int64 if (pa.types.is_large_string(typ) or pa.types.is_large_binary(typ)) else np.int32
        off = np.frombuffer(bufs[1], dtype=odt)[values.offset : values.offset + len(values) + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]] if bufs[2] is not None else np.empty(0, np.uint8)
        h.update((off[:64] - off[0]).astype(np.int64).tobytes())  # leading offsets anchor layout
        h.update(data[:4096].tobytes())
        h.update(data[-4096:].tobytes())
        h.update(str(len(data)).encode())
    elif bufs and len(bufs) > 1 and bufs[1] is not None:
        width = typ.bit_width // 8 if hasattr(typ, "bit_width") else 8
        data = np.frombuffer(bufs[1], dtype=np.uint8)[values.offset * width : (values.offset + len(values)) * width]
        h.update(data[:4096].tobytes())
        h.update(data[-4096:].tobytes())
        h.update(str(len(data)).encode())
    else:  # fallback: stringify head/tail
        head = values.slice(0, min(64, len(values))).to_pylist()
        tail = values.slice(max(0, len(values) - 64)).to_pylist()
        h.update(repr((head, tail)).encode())
    if values.null_count:  # validity participates only when nulls exist
        h.update(np.asarray(values.is_valid()).tobytes())
    h.update(str(nrows).encode())
    h.update(str(len(values)).encode())
    return h.hexdigest()


def _task_discriminator() -> str:
    """A non-content block discriminator, stable across retries.

    Ray retries re-execute the same task spec with the same TaskID, so
    (task_id, per-task batch seq) is identical for a retried attempt of a
    block but distinct for two legitimately identical-content blocks —
    exactly the property the fragment dedupe needs (ADVICE round 1).
    Outside a Ray task (driver-side tests) falls back to a constant.
    """
    try:
        import ray

        tid = ray.get_runtime_context().get_task_id()
        return tid or "driver"
    except Exception:
        return "driver"


class SketchBuilder:
    """Actor-pool callable: Arrow block in, partial-sketch rows out."""

    def __init__(self, requests: list[SketchRequest]):
        # once per actor: validate specs, bind kernels (SURVEY.md §2.1)
        self._reqs = [(r, kernel_for(r.kind)) for r in requests]
        # block-discriminator state: (task_id, seq-within-task) — see
        # _task_discriminator.  Reset whenever the executing task changes.
        self._last_task = None
        self._seq = 0
        # warm numpy/hash allocators so the first real block isn't 2-3x slower
        from ..hashing import hash128

        hash128(pa.array(["warmup"] * 1024), 0)

    @staticmethod
    def _update_keyed(kernel, req: SketchRequest, state, vals: pa.Array, w):
        """Update a keyed sketch, collapsing duplicate keys first.

        Skewed key columns (tokens, tools, roles) repeat heavily inside a
        block; hashing each occurrence is wasted work.  Dictionary-encode
        the column: set-semantics sketches (bloom/hll/cuckoo) update once
        per *distinct* key; count-semantics sketches (cms/topk) update
        with per-key summed counts.  Falls back to the direct path when
        keys are mostly unique (e.g. conv_id).
        """
        n = len(vals)
        if n == 0:
            return
        if w is None:
            # one C++ hash-aggregation pass gives distinct values AND
            # per-key counts (vs dictionary_encode + bincount: ~15%
            # faster on the token column, the hottest projection)
            vc = pc.value_counts(vals)
            distinct = vc.field("values")
            if len(distinct) * 2 > n:  # mostly-unique keys: dedupe gains nothing
                kernel.update(state, vals)
                return
            if req.kind in ("bloom", "hll", "cuckoo", "kmv"):
                kernel.update(state, distinct)
                return
            kernel.update(state, distinct, vc.field("counts").to_numpy(zero_copy_only=False))
            return
        enc = vals.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        distinct = enc.dictionary
        if len(distinct) * 2 > n:  # mostly-unique keys: encoding gains nothing
            if req.kind in ("cms", "topk"):
                kernel.update(state, vals, w)
            else:
                kernel.update(state, vals)
            return
        if req.kind in ("bloom", "hll", "cuckoo", "kmv"):
            kernel.update(state, distinct)
            return
        codes = enc.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(codes, weights=np.asarray(w, dtype=np.float64), minlength=len(distinct))
        kernel.update(state, distinct, counts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        task = _task_discriminator()
        if task != self._last_task:
            self._last_task, self._seq = task, 0
        disc = f"{task[:16]}.{self._seq}"
        self._seq += 1
        out = {k: [] for k in ("sketch", "kind", "group_key", "state", "rows", "fragment", "checksum")}
        for req, kernel in self._reqs:
            values = _column_values(batch, req)
            weights = None
            if req.weight is not None:
                weights = batch[req.weight].to_numpy(zero_copy_only=False)
            frag = _fragment_id(values, batch.num_rows)
            if req.group_by is None:
                groups = {"": (values, weights)}
            else:
                gcol = batch[req.group_by]
                if isinstance(gcol, pa.ChunkedArray):
                    gcol = gcol.combine_chunks()
                gcol = pc.cast(pc.fill_null(gcol, ""), pa.string())
                if len(gcol) != len(values):
                    raise ValueError(
                        f"request {req.name!r}: group_by column is not aligned with "
                        "the projected values (flattening projections cannot be grouped)"
                    )
                groups = {}
                enc = gcol.dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False)
                labels = enc.dictionary.to_pylist()
                for code, label in enumerate(labels):
                    mask = codes == code
                    vals = values.filter(pa.array(mask))
                    w = weights[mask] if weights is not None else None
                    groups[label] = (vals, w)
            for gkey, (vals, w) in groups.items():
                state = kernel.new(req.spec)
                if req.kind in ("tdigest", "kll", "moments", "ddsketch"):
                    nums = vals.to_numpy(zero_copy_only=False).astype(np.float64)
                    kernel.update(state, nums, w)
                else:
                    self._update_keyed(kernel, req, state, vals, w)
                blob = compress_state(kernel.to_bytes(state))
                out["sketch"].append(req.name)
                out["kind"].append(req.kind)
                out["group_key"].append(gkey)
                out["state"].append(blob)
                out["rows"].append(len(vals))
                out["fragment"].append(f"{req.name}:{gkey}:{frag}:{disc}")
                out["checksum"].append(hashlib.blake2b(blob, digest_size=8).hexdigest())
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


def build_partials(
    ds,
    requests: list[SketchRequest],
    *,
    batch_size: int = 65536,
    concurrency=None,
    salt_by: str | None = None,
    salt_buckets: int = 0,
):
    """read -> [salted repartition] -> actor-pool build => Dataset of partials.

    ``salt_by`` + ``salt_buckets``: for zipf-skewed keys (e.g. conv_id)
    add ``salt = hash(key) % S`` and shuffle-repartition on it before the
    stateful build so no single builder actor sees a whole hot key
    (north_star requirement).  Estimates are partition-invariant by merge
    associativity, so salting never changes results.

    **Read fusion**: with ``batch_size=None`` AND ``concurrency=None``
    (and a read whose block count was pinned to its file count, e.g.
    ``read_parquet(path, override_num_blocks=n_files)``), Ray fuses the
    parquet read INTO the build task — the decoded table never round-
    trips through the object store, which measured ~4x on the flagship
    (4M turns @ 8 cpus: 6.0s -> 1.5s; a decoded transcript block is
    ~50x its partial rows).  Either kwarg being set breaks fusion, as
    does the read op's SplitBlocks, so the fused mode needs enough
    input files to feed every slot.  The builder then flushes one
    partial set per read block instead of per 65k-row slice — fewer,
    larger partials; retry idempotency unchanged ((task, seq)
    discriminator).
    """
    if salt_by and salt_buckets > 1:
        from ..hashing import hash128_keyed

        def _salt(batch: pa.Table) -> pa.Table:
            col = batch[salt_by]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            h1, _ = hash128_keyed(col, 7)
            return batch.append_column("salt", pa.array((h1 % np.uint64(salt_buckets)).astype(np.int32)))

        ds = ds.map_batches(_salt, batch_format="pyarrow").repartition(salt_buckets, shuffle=True)
    # Dispatch as STATELESS TASKS (a pickled SketchBuilder instance), not an
    # actor pool: the builder holds no cross-batch state by design (per-block
    # flush for retry idempotency), and Ray reuses warm worker processes for
    # tasks while a fresh actor pool pays ~0.25s/actor creation on every
    # pipeline — which anti-scales small-to-medium inputs.  ``concurrency``
    # still caps parallelism when given (else Ray uses available CPUs).
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        SketchBuilder(requests),
        batch_format="pyarrow",
        batch_size=batch_size,  # None = whole read blocks (enables fusion)
        zero_copy_batch=True,
        **kwargs,
    )
