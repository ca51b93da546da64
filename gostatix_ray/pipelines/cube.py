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
    dim_col: str | None = None,
    out_dir: str,
    concurrency=None,
) -> str:
    """Build per-(sketch, cell) merged states and persist to Parquet.

    Cells are time buckets of ``unit``; with ``dim_col`` given, cells
    are (time x dim) pairs — ``group_key`` becomes
    ``"<iso-time>\\x1f<dim-value>"`` (the time prefix dominates
    lexicographically, so time-range filters keep working unchanged,
    and every read path takes an optional ``dim=`` equality filter;
    merging ACROSS dims stays exact for mergeable sketches — an HLL
    range over all dims is the true distinct union).  One year of
    hourly cells x a 6-value dim is ~52k KB-scale rows — still a file,
    not a dataset.  Dim values must not contain ``\\x1f``.

    Each request's ``group_by`` must be free (the cube owns the
    grouping axis).  Returns ``out_dir``.
    """
    for r in requests:
        if r.group_by is not None:
            raise ValueError(f"request {r.name!r}: group_by is reserved for the cube's time cell")
    label = cell_label(unit)

    def _cell(batch: pa.Table) -> pa.Table:
        cell = label(batch[time_col])
        if dim_col is not None:
            cell = pc.binary_join_element_wise(
                cell, pc.cast(batch[dim_col], pa.string()), "\x1f")
        return batch.append_column(_CELL_COL, cell)

    reqs = [replace(r, group_by=_CELL_COL) for r in requests]
    # funnel shape (heavy build -> tiny combines): per-op CPU reservation off,
    # set at ROOT creation like every sketch pipeline (stages/merge.full_throttle)
    from ..stages.merge import full_throttle_dataset

    partials = build_partials(full_throttle_dataset(ds.map_batches(_cell, batch_format="pyarrow")),
                              reqs, concurrency=concurrency)
    merged = merge_partials_streaming(partials)
    os.makedirs(out_dir, exist_ok=True)
    merged.write_parquet(out_dir)
    return out_dir


def extend_sketch_cube(ds_delta, requests, *, time_col="ts", unit="day",
                       dim_col: str | None = None, out_dir,
                       concurrency=None) -> str:
    """Append a delta's cells to an existing cube (same requests/unit).

    New files land beside the old ones; overlapping cells simply have
    more than one state row, which every read path merges (states are
    associative/commutative).  Call :func:`compact_sketch_cube` to fold
    back to one row per cell when file count grows.

    The delta is validated against the existing cube first: sketch
    names/kinds, SPECS (decoded from one state row each — a different
    HLL m would fail only on ranges spanning old+new cells), and the
    cell-label unit must all match, otherwise the extend is rejected
    before any write.
    """
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        _validate_extend(read_cube(out_dir), requests, unit, dim_col is not None)
    return build_sketch_cube(ds_delta, requests, time_col=time_col, unit=unit,
                             dim_col=dim_col, out_dir=out_dir,
                             concurrency=concurrency)


def _validate_extend(tbl: pa.Table, requests, unit: str, has_dim: bool = False) -> None:
    import re

    time_pat = {"hour": r"\d{4}-\d{2}-\d{2}T\d{2}", "day": r"\d{4}-\d{2}-\d{2}",
                "month": r"\d{4}-\d{2}"}[unit]
    pat = f"^{time_pat}\x1f.+$" if has_dim else f"^{time_pat}$"
    sample_cell = tbl["group_key"][0].as_py()
    if not re.match(pat, sample_cell):
        raise ValueError(
            f"extend unit {unit!r}/dim={has_dim} does not match the existing cube's "
            f"cell labels (e.g. {sample_cell!r}); mixed shapes would interleave "
            f"under range filters")
    have = {}
    for i in range(tbl.num_rows):
        name = tbl["sketch"][i].as_py()
        if name not in have:
            have[name] = (tbl["kind"][i].as_py(), i)
    for r in requests:
        if r.name not in have:
            continue  # new sketch joining the cube is fine
        kind, i = have[r.name]
        if kind != r.kind:
            raise ValueError(f"extend sketch {r.name!r}: kind {r.kind!r} != existing {kind!r}")
        state = kernel_for(kind).from_bytes(decompress_state(tbl["state"][i].as_py()))
        if getattr(state, "spec", None) != r.spec:
            raise ValueError(
                f"extend sketch {r.name!r}: spec {r.spec!r} != existing {state.spec!r} "
                "(merging mismatched specs fails only on ranges spanning old+new cells)")


def read_cube(cube_dir: str) -> pa.Table:
    """The whole cube as one (tiny) Arrow table.

    Self-healing: if a :func:`compact_sketch_cube` swap was interrupted
    between its two renames (cube dir missing, ``<dir>.old`` present),
    the backup is restored before reading — no crash window loses the
    cube."""
    if not os.path.isdir(cube_dir):
        bak = cube_dir.rstrip("/") + ".old"
        if os.path.isdir(bak):
            os.rename(bak, cube_dir)
    return pq.read_table(cube_dir)


def compact_sketch_cube(cube_dir: str) -> str:
    """Rewrite the cube to exactly one row per (sketch, cell).

    Driver-side on purpose: a cube is O(cells) kilobyte rows.  Merge
    order is sorted fragment ids, so compaction is byte-deterministic.

    Crash-safety: the compacted table is fully written to a tmp dir,
    then swapped in via rename(old -> .old), rename(tmp -> dir); a crash
    between the renames is healed by :func:`read_cube` restoring
    ``.old``.  SINGLE-WRITER discipline: like any compaction, deltas
    written concurrently between the read and the swap would be dropped
    — do not run extend and compact at the same time.
    """
    tbl = read_cube(cube_dir)
    out = _merge_rows_per_cell(tbl)
    tmp = cube_dir.rstrip("/") + ".compact.tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(out, os.path.join(tmp, "cube.parquet"))
    bak = cube_dir.rstrip("/") + ".old"
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(cube_dir, bak)
    os.rename(tmp, cube_dir)
    shutil.rmtree(bak, ignore_errors=True)
    return cube_dir


def _merge_rows_per_cell(tbl: pa.Table) -> pa.Table:
    from ..stages.merge import _combine_table

    return _combine_table(tbl)


class CubeReader:
    """Load the cube table ONCE and answer many range queries from memory.

    The per-call functions below re-open the parquet AND re-decompress
    every covered state per query; the reader amortizes both (the cube
    file read across queries, and — with ``cache_states`` — the zlib
    decode of each cell's state, the dominant cost for wide CMS/top-k
    states).  64M-turn hour cube, ~35-cell ranges: 127 ms/query one-shot
    -> 3.9 ms (HLL distinct) / ~10 ms (top-k) cached (BASELINE.md).
    Cache memory is O(cells x decompressed state size); every merge
    kernel returns a NEW state, so cached entries are never mutated.
    """

    def __init__(self, cube_dir: str, cache_states: bool = True):
        self.table = read_cube(cube_dir)
        self._cache: dict[int, object] | None = {} if cache_states else None

    def state(self, sketch: str, lo: str | None = None, hi: str | None = None,
              dim: str | None = None):
        if self._cache is None:
            return _range_state(self.table, sketch, lo, hi, dim)
        tbl = self.table
        sel = _range_indices(tbl, sketch, lo, hi, dim)
        kernel = kernel_for(tbl["kind"][int(sel[0])].as_py())
        state = None
        rows = 0
        for i in sel:
            i = int(i)
            cell = self._cache.get(i)
            if cell is None:
                cell = kernel.from_bytes(decompress_state(tbl["state"][i].as_py()))
                self._cache[i] = cell
            state = cell if state is None else kernel.merge(state, cell)
            rows += tbl["rows"][i].as_py()
        if len(sel) == 1:
            state = state.copy() if hasattr(state, "copy") else state
        return kernel, state, rows

    @staticmethod
    def _expect(kernel, *kinds):
        kname = kernel.__name__.rsplit(".", 1)[-1]
        if kname not in kinds:
            raise TypeError(f"cell kind {kname!r} does not support this accessor "
                            f"(needs one of {kinds})")
        return kname

    def distinct(self, sketch: str, lo=None, hi=None, dim=None) -> float:
        kernel, state, _ = self.state(sketch, lo, hi, dim)
        kname = self._expect(kernel, "hll", "kmv")
        return float(kernel.count(state) if kname == "hll" else kernel.estimate(state))

    def counts(self, sketch: str, items, lo=None, hi=None, dim=None) -> np.ndarray:
        kernel, state, _ = self.state(sketch, lo, hi, dim)
        self._expect(kernel, "cms")
        return kernel.count(state, items)

    def topk(self, sketch: str, lo=None, hi=None, dim=None) -> list[tuple[str, int]]:
        kernel, state, _ = self.state(sketch, lo, hi, dim)
        self._expect(kernel, "topk")
        return kernel.values(state)


def cube_range_state(cube_dir: str, sketch: str, lo: str | None = None,
                     hi: str | None = None, dim: str | None = None):
    """Merge every cell of ``sketch`` with ``lo <= cell < hi`` into ONE
    kernel state (lo/hi are ISO labels at the cube's unit; None = open).

    Returns ``(kernel_module, state, rows_covered)``.  Deterministic:
    cells merge in label order, duplicate delta rows in fragment order.
    Re-reads the cube file per call; use :class:`CubeReader` for many
    queries against one cube.
    """
    return _range_state(read_cube(cube_dir), sketch, lo, hi, dim)


def _range_indices(tbl: pa.Table, sketch: str, lo: str | None, hi: str | None,
                   dim: str | None = None) -> np.ndarray:
    """Row indices of ``sketch``'s cells in [lo, hi), in deterministic
    (cell label, fragment) merge order.

    ``dim``: in a two-dimensional cube, keep only cells of that dim
    value (labels are ``"<time>\\x1f<dim>"``; the time prefix dominates
    lexicographically so lo/hi stay plain time labels).  ``dim=None``
    merges across every dim — exact for mergeable sketches.
    """
    if tbl.num_rows == 0 or "sketch" not in tbl.column_names:
        # a cube built over zero input rows has no cells at all (and,
        # written through the schema-less empty sink, no columns)
        raise KeyError(
            f"no cube cells for sketch={sketch!r}: the cube is empty")
    mask = pc.equal(tbl["sketch"], sketch)
    if lo is not None:
        mask = pc.and_(mask, pc.greater_equal(tbl["group_key"], lo))
    if hi is not None:
        mask = pc.and_(mask, pc.less(tbl["group_key"], hi))
    if dim is not None:
        mask = pc.and_(mask, pc.ends_with(tbl["group_key"], pattern="\x1f" + dim))
    idx = np.flatnonzero(np.asarray(mask))
    if len(idx) == 0:
        raise KeyError(
            f"no cube cells for sketch={sketch!r} in [{lo!r}, {hi!r})"
            + (f" dim={dim!r}" if dim is not None else ""))
    gk = np.asarray(tbl["group_key"])[idx]
    fr = np.asarray(tbl["fragment"])[idx]
    return idx[np.lexsort((fr, gk))]


def _range_state(tbl: pa.Table, sketch: str, lo: str | None = None,
                 hi: str | None = None, dim: str | None = None):
    sel_idx = _range_indices(tbl, sketch, lo, hi, dim)
    kernel = kernel_for(tbl["kind"][int(sel_idx[0])].as_py())
    blobs = [decompress_state(tbl["state"][int(i)].as_py()) for i in sel_idx]
    bulk = getattr(kernel, "merge_blobs", None)
    if bulk is not None and len(blobs) > 1:
        state = bulk(blobs)
    else:
        state = kernel.from_bytes(blobs[0])
        for b in blobs[1:]:
            state = kernel.merge(state, kernel.from_bytes(b))
    rows = int(np.asarray(tbl["rows"])[sel_idx].sum())
    return kernel, state, rows


def cube_range_distinct(cube_dir: str, sketch: str, lo=None, hi=None,
                        dim=None) -> float:
    """HLL range cardinality from merged cells (no input rescan)."""
    from ..kernels import hll

    _, state, _ = cube_range_state(cube_dir, sketch, lo, hi, dim)
    return float(hll.count(state))


def cube_range_counts(cube_dir: str, sketch: str, items, lo=None, hi=None,
                      dim=None) -> np.ndarray:
    """CMS range counts for ``items`` from merged cells."""
    from ..kernels import cms

    _, state, _ = cube_range_state(cube_dir, sketch, lo, hi, dim)
    return cms.count(state, items)


def cube_range_topk(cube_dir: str, sketch: str, lo=None, hi=None,
                    dim=None) -> list[tuple[str, int]]:
    """Top-k heavy hitters over the range from merged cells."""
    from ..kernels import topk

    _, state, _ = cube_range_state(cube_dir, sketch, lo, hi, dim)
    return topk.values(state)


def _proj_token(on) -> str:
    """Identity token for a request's ``on`` projection.

    Callables hash their marshaled code object (bytecode + consts +
    names), so EDITING a lambda changes the fingerprint — a stale
    persisted cube is never silently reused after a projection change.
    (Bound/builtin callables without reachable code fall back to their
    qualified name.)"""
    if not callable(on):
        return str(on)
    code = getattr(on, "__code__", None)
    if code is not None:
        import marshal

        return hashlib.blake2b(marshal.dumps(code), digest_size=8).hexdigest()
    return getattr(on, "__qualname__", repr(on))


def cube_fingerprint(sf_dir: str, *, unit: str, requests: list[SketchRequest],
                     dim_col: str | None = None, version: str = "v1") -> str:
    """Stable scratch-dir tag: input IDENTITY + unit + request parameters.

    Mirrors the curation-checkpoint discipline — changed parameters must
    land in a DIFFERENT directory, never silently reuse old states.
    Input identity covers each parquet file's (name, size, mtime_ns), so
    regenerating the data in place also invalidates the cube.
    """
    parts = [os.path.abspath(sf_dir), unit, str(dim_col), version]
    if os.path.isdir(sf_dir):
        for f in sorted(os.listdir(sf_dir)):
            if f.endswith(".parquet"):
                st = os.stat(os.path.join(sf_dir, f))
                parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    for r in requests:
        parts.append(f"{r.name}:{r.kind}:{r.spec!r}:{r.weight}:{_proj_token(r.on)}")
    return hashlib.blake2b("|".join(parts).encode(), digest_size=10).hexdigest()
