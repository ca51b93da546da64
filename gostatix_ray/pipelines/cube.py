"""Time-partitioned mergeable sketch cube: per-cell states on disk,
range queries answered by MERGING STATES — never rescanning rows.

This is the engine-side composition gostatix's mergeable sketches exist
for (HLL max-merge `hyperloglog.go:79-87`, CMS add-merge
`count_min_sketch.go:138-151`, Bloom OR, top-k union+recount): build one
sketch state per time bucket (hour/day) once, persist the tiny states as
Parquet, then answer "distinct users in [t0, t1)" / "top tools in March"
for ANY range by merging the covered cells.  At 10^12-turn scale a year
of hourly cells is ~8,760 rows x a few KB of compressed state — a range
query is O(cells) driver-side kernel merges against a kilobyte-scale
file, while the raw-data cost was paid exactly once at build time.

Cells are INCREMENTALLY extendable: `extend_sketch_cube` appends a new
delta's per-cell states alongside the existing files; because every read
path merges ALL rows matching a cell (merge associativity), deltas are
correct immediately, and `compact_sketch_cube` folds duplicates back to
one row per (sketch, cell) when the file count grows.  Merge order is
deterministic (sorted fragment ids), so a compacted cube is byte-stable
regardless of how many deltas preceded it.

Scale shape: the build is the standard fused read -> SketchBuilder ->
bundled-combine -> one tiny groupby over (sketch, cell) rows; the range
query touches zero input rows.  Only the cube file itself (KB..MB) is
ever read on the driver.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import replace

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..registry import kernel_for
from ..stages.build import SketchRequest, build_partials, compress_state, decompress_state
from ..stages.merge import merge_partials_streaming

_UNIT_FMT = {"hour": "%Y-%m-%dT%H", "day": "%Y-%m-%d", "month": "%Y-%m"}

_CELL_COL = "__cell"


def cell_label(unit: str):
    """Vectorized batch -> ISO cell-label projection for ``unit``.

    ISO labels sort lexicographically in time order, so range filters
    are plain string comparisons on the cube's ``group_key``.
    """
    fmt = _UNIT_FMT[unit]

    def _proj(ts_col):
        return pc.strftime(pc.floor_temporal(ts_col, unit=unit), format=fmt)

    return _proj


def build_sketch_cube(
    ds,
    requests: list[SketchRequest],
    *,
    time_col: str = "ts",
    unit: str = "day",
    out_dir: str,
    concurrency=None,
) -> str:
    """Build per-(sketch, time-cell) merged states and persist to Parquet.

    Each request's ``group_by`` must be free (the cube owns the grouping
    axis); pass a composite projection in ``on`` if a second dimension
    is needed (one cell per (time, dim) pair).  Returns ``out_dir``.
    """
    for r in requests:
        if r.group_by is not None:
            raise ValueError(f"request {r.name!r}: group_by is reserved for the cube's time cell")
    label = cell_label(unit)

    def _cell(batch: pa.Table) -> pa.Table:
        return batch.append_column(_CELL_COL, label(batch[time_col]))

    reqs = [replace(r, group_by=_CELL_COL) for r in requests]
    partials = build_partials(ds.map_batches(_cell, batch_format="pyarrow"), reqs,
                              concurrency=concurrency)
    merged = merge_partials_streaming(partials)
    os.makedirs(out_dir, exist_ok=True)
    merged.write_parquet(out_dir)
    return out_dir


def extend_sketch_cube(ds_delta, requests, *, time_col="ts", unit="day", out_dir,
                       concurrency=None) -> str:
    """Append a delta's cells to an existing cube (same requests/unit).

    New files land beside the old ones; overlapping cells simply have
    more than one state row, which every read path merges (states are
    associative/commutative).  Call :func:`compact_sketch_cube` to fold
    back to one row per cell when file count grows.
    """
    return build_sketch_cube(ds_delta, requests, time_col=time_col, unit=unit,
                             out_dir=out_dir, concurrency=concurrency)


def read_cube(cube_dir: str) -> pa.Table:
    """The whole cube as one (tiny) Arrow table."""
    return pq.read_table(cube_dir)


def compact_sketch_cube(cube_dir: str) -> str:
    """Rewrite the cube to exactly one row per (sketch, cell).

    Driver-side on purpose: a cube is O(cells) kilobyte rows.  Merge
    order is sorted fragment ids, so compaction is byte-deterministic.
    """
    tbl = read_cube(cube_dir)
    out = _merge_rows_per_cell(tbl)
    tmp = cube_dir.rstrip("/") + ".compact.tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(out, os.path.join(tmp, "cube.parquet"))
    # atomic-ish swap: new dir replaces old
    import shutil

    bak = cube_dir.rstrip("/") + ".old"
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(cube_dir, bak)
    os.rename(tmp, cube_dir)
    shutil.rmtree(bak, ignore_errors=True)
    return cube_dir


def _merge_rows_per_cell(tbl: pa.Table) -> pa.Table:
    from ..stages.merge import _combine_table

    return _combine_table(tbl)


def cube_range_state(cube_dir: str, sketch: str, lo: str | None = None,
                     hi: str | None = None):
    """Merge every cell of ``sketch`` with ``lo <= cell < hi`` into ONE
    kernel state (lo/hi are ISO labels at the cube's unit; None = open).

    Returns ``(kernel_module, state, rows_covered)``.  Deterministic:
    cells merge in label order, duplicate delta rows in fragment order.
    """
    tbl = read_cube(cube_dir)
    mask = pc.equal(tbl["sketch"], sketch)
    if lo is not None:
        mask = pc.and_(mask, pc.greater_equal(tbl["group_key"], lo))
    if hi is not None:
        mask = pc.and_(mask, pc.less(tbl["group_key"], hi))
    sel = tbl.filter(mask)
    if sel.num_rows == 0:
        raise KeyError(f"no cube cells for sketch={sketch!r} in [{lo!r}, {hi!r})")
    kind = sel["kind"][0].as_py()
    kernel = kernel_for(kind)
    order = np.lexsort((np.asarray(sel["fragment"]), np.asarray(sel["group_key"])))
    blobs = [decompress_state(sel["state"][int(i)].as_py()) for i in order]
    bulk = getattr(kernel, "merge_blobs", None)
    if bulk is not None and len(blobs) > 1:
        state = bulk(blobs)
    else:
        state = kernel.from_bytes(blobs[0])
        for b in blobs[1:]:
            state = kernel.merge(state, kernel.from_bytes(b))
    rows = int(pc.sum(sel["rows"]).as_py())
    return kernel, state, rows


def cube_range_distinct(cube_dir: str, sketch: str, lo=None, hi=None) -> float:
    """HLL range cardinality from merged cells (no input rescan)."""
    from ..kernels import hll

    _, state, _ = cube_range_state(cube_dir, sketch, lo, hi)
    return float(hll.count(state))


def cube_range_counts(cube_dir: str, sketch: str, items, lo=None, hi=None) -> np.ndarray:
    """CMS range counts for ``items`` from merged cells."""
    from ..kernels import cms

    _, state, _ = cube_range_state(cube_dir, sketch, lo, hi)
    return cms.count(state, items)


def cube_range_topk(cube_dir: str, sketch: str, lo=None, hi=None) -> list[tuple[str, int]]:
    """Top-k heavy hitters over the range from merged cells."""
    from ..kernels import topk

    _, state, _ = cube_range_state(cube_dir, sketch, lo, hi)
    return topk.values(state)


def cube_fingerprint(sf_dir: str, *, unit: str, requests: list[SketchRequest],
                     version: str = "v1") -> str:
    """Stable scratch-dir tag: input + unit + request parameters.

    Mirrors the curation-checkpoint discipline — changed parameters must
    land in a DIFFERENT directory, never silently reuse old states.
    """
    parts = [os.path.abspath(sf_dir), unit, version]
    for r in requests:
        parts.append(f"{r.name}:{r.kind}:{r.spec!r}:{r.weight}:{'<fn>' if callable(r.on) else r.on}")
    return hashlib.blake2b("|".join(parts).encode(), digest_size=10).hexdigest()
