"""The flagship pipeline: transcripts -> sketches -> estimates.

Lifecycle (SURVEY.md §3, "Our lifecycle"):

    read_parquet -> [projection / tokenizer map_batches]
      -> [salted repartition for skewed conv_id]
      -> build (actor-pool map_batches, partial rows + lineage)
      -> [checkpoint: partial parquet + manifest]
      -> tree merge (bounded fan-in groupby)
      -> finalize (estimates)

State is never shared-mutable: immutable partial states flow through
the shuffle and merge associatively.  A ``checkpoint_dir`` makes the
run resumable: if a complete partial checkpoint exists, the build stage
is skipped and the merge tree continues from the checkpointed partials
(byte-identical final state by associativity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from ..registry import kernel_for
from ..stages.build import SketchRequest, build_partials
from ..stages.merge import (
    collect_final,
    full_throttle,
    full_throttle_dataset,
    merge_partials,
    merge_partials_streaming,
)
from ..state import lineage as lin


@dataclass
class SketchResult:
    name: str
    kind: str
    group_key: str
    state: Any  # deserialized kernel state
    rows: int


def finalize_row(result: SketchResult) -> dict:
    """One estimates-table row per final sketch (the reference's query
    ops — Count/Values/PositiveRate — evaluated on the merged state)."""
    from ..kernels import bloom, cms, cuckoo, hll, kll, tdigest, topk

    row = {
        "sketch": result.name,
        "group_key": result.group_key,
        "kind": result.kind,
        "rows": result.rows,
        "estimate": None,
        "detail": "",
    }
    st = result.state
    if result.kind == "hll":
        row["estimate"] = float(hll.count(st))
        row["detail"] = f"accuracy={st.spec.accuracy():.5f}"
    elif result.kind == "cms":
        row["estimate"] = float(st.all_sum)
        row["detail"] = f"eps={st.spec.error_bound_eps():.2e} delta={st.spec.failure_probability():.2e}"
    elif result.kind == "topk":
        vals = topk.values(st)
        row["estimate"] = float(vals[0][1]) if vals else 0.0
        row["detail"] = ";".join(f"{e}:{c}" for e, c in vals)
    elif result.kind == "bloom":
        row["estimate"] = float(bloom.positive_rate(st))
        row["detail"] = f"size={st.spec.size} k={st.spec.num_hashes}"
    elif result.kind == "tdigest":
        qs = tdigest.quantile(st, [0.5, 0.9, 0.99])
        row["estimate"] = float(qs[0])
        row["detail"] = f"p90={qs[1]:.6g} p99={qs[2]:.6g}"
    elif result.kind == "kll":
        qs = kll.quantile(st, [0.5, 0.9, 0.99])
        row["estimate"] = float(qs[0])
        row["detail"] = f"p90={qs[1]:.6g} p99={qs[2]:.6g}"
    elif result.kind == "cuckoo":
        row["estimate"] = float(st.length)
        row["detail"] = f"positive_rate={st.spec.positive_rate():.2e}"
    elif result.kind == "moments":
        from ..kernels import moments

        row["estimate"] = moments.mean(st)
        row["detail"] = f"var={moments.variance(st):.6g} n={st.n}"
    return row


def write_results(results: dict, out_dir: str) -> str:
    """Persist estimates + final states as partitioned parquet.

    Layout (resumable-output contract): one directory per sketch name,
    each holding an ``estimates.parquet`` (estimate row + serialized
    state per group) written atomically via tmp-and-rename, so a rerun
    can skip sketches whose directory already exists.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..registry import kernel_for

    by_sketch: dict[str, list] = {}
    for (name, _gk), res in sorted(results.items()):
        by_sketch.setdefault(name, []).append(res)
    for name, group in by_sketch.items():
        sdir = os.path.join(out_dir, f"sketch={name}")
        if os.path.exists(os.path.join(sdir, "estimates.parquet")):
            continue  # resume: already written
        rows = [finalize_row(r) for r in group]
        kernel = kernel_for(group[0].kind)
        states = [kernel.to_bytes(r.state) for r in group]
        table = pa.table(
            {
                "sketch": [r["sketch"] for r in rows],
                "group_key": [r["group_key"] for r in rows],
                "kind": [r["kind"] for r in rows],
                "rows": pa.array([r["rows"] for r in rows], pa.int64()),
                "estimate": pa.array([r["estimate"] for r in rows], pa.float64()),
                "detail": [r["detail"] for r in rows],
                "state": pa.array(states, pa.large_binary()),
            }
        )
        tmp = sdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(table, os.path.join(tmp, "estimates.parquet"))
        if os.path.exists(sdir):
            import shutil

            shutil.rmtree(sdir)
        os.rename(tmp, sdir)
    return out_dir


def read_results(out_dir: str) -> dict[tuple[str, str], SketchResult]:
    """Load a write_results() directory back into deserialized states —
    the other half of the persistence contract (the reference's Redis
    FromKey role, *_redis.go attach-by-key, re-expressed as parquet)."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    from ..registry import kernel_for

    out: dict[tuple[str, str], SketchResult] = {}
    for f in sorted(_glob.glob(os.path.join(out_dir, "sketch=*", "estimates.parquet"))):
        for row in pq.read_table(f).to_pylist():
            kernel = kernel_for(row["kind"])
            out[(row["sketch"], row["group_key"])] = SketchResult(
                name=row["sketch"], kind=row["kind"], group_key=row["group_key"],
                state=kernel.from_bytes(row["state"]), rows=row["rows"],
            )
    return out


def merge_results(a: dict, b: dict) -> dict[tuple[str, str], SketchResult]:
    """INCREMENTAL CORPUS UPDATE: combine two result sets state-by-state.

    Yesterday's persisted sketches + today's delta build = the sketches
    of the union corpus, without re-reading yesterday's data — merge
    associativity (registry.MERGEABLE; byte-stable for BYTE_STABLE
    kinds) is exactly what makes this sound.  Keys present on one side
    pass through (a new group appearing in the delta just appears)."""
    from ..registry import MERGEABLE, kernel_for

    out = dict(a)
    for key, res in b.items():
        if key not in out:
            out[key] = res
            continue
        prev = out[key]
        if prev.kind != res.kind:
            raise ValueError(f"kind mismatch for {key}: {prev.kind} vs {res.kind}")
        if prev.kind not in MERGEABLE:
            raise ValueError(f"kind {prev.kind!r} has no merge (partitioned-only)")
        kernel = kernel_for(prev.kind)
        out[key] = SketchResult(
            name=prev.name, kind=prev.kind, group_key=prev.group_key,
            state=kernel.merge(prev.state, res.state), rows=prev.rows + res.rows,
        )
    return out


class SketchPipeline:
    def __init__(
        self,
        requests: list[SketchRequest],
        *,
        batch_size: int = 65536,
        concurrency=None,
        fan_in: int = 64,
        checkpoint_dir: str | None = None,
        salt_by: str | None = None,
        salt_buckets: int = 0,
    ):
        self.requests = requests
        self.batch_size = batch_size
        self.concurrency = concurrency
        self.fan_in = fan_in
        self.checkpoint_dir = checkpoint_dir
        self.salt_by = salt_by
        self.salt_buckets = salt_buckets
        self._kinds = {r.name: r.kind for r in requests}

    def run(self, ds) -> dict[tuple[str, str], SketchResult]:
        ds = full_throttle_dataset(ds)  # input created outside: mutate ITS context
        with full_throttle():  # datasets created inside inherit the session context
            return self._run(ds)

    def _run(self, ds) -> dict[tuple[str, str], SketchResult]:
        partials = None
        if self.checkpoint_dir:
            partials = lin.resume_partials(self.checkpoint_dir)
        if partials is None:
            partials = build_partials(
                ds,
                self.requests,
                batch_size=self.batch_size,
                concurrency=self.concurrency,
                salt_by=self.salt_by,
                salt_buckets=self.salt_buckets,
            )
            if self.checkpoint_dir:
                lin.write_checkpoint(partials, self.checkpoint_dir)
                partials = lin.resume_partials(self.checkpoint_dir)
        # Default: STREAMING merge — one lazy execution, so build, bucket
        # shuffle and merges overlap with no materialize barrier (the ~4s
        # serial tail that dominated small-input runs).  The materialized
        # combiner tree remains for the checkpoint path, where partials are
        # already on parquet and the tree bounds per-level fan-in for very
        # large checkpoints.
        if self.checkpoint_dir:
            merged = merge_partials(partials, fan_in=self.fan_in)
        else:
            # group-free request sets have a handful of final states:
            # single-task final merge skips the fixed ~0.7s all-to-all
            # Sort; any group_by request keeps the scale-general groupby
            final = "single" if all(r.group_by is None for r in self.requests) else "groupby"
            merged = merge_partials_streaming(partials, final=final)
        final = {}
        rows_by_key = {}
        with full_throttle():
            for batch in merged.iter_batches(batch_size=4096, batch_format="pyarrow"):
                for row in batch.to_pylist():
                    key = (row["sketch"], row["group_key"])
                    final[key] = row["state"]
                    rows_by_key[key] = row["rows"]
        from ..stages.build import decompress_state

        out = {}
        for (name, gk), blob in final.items():
            kind = self._kinds[name]
            out[(name, gk)] = SketchResult(
                name=name,
                kind=kind,
                group_key=gk,
                state=kernel_for(kind).from_bytes(decompress_state(blob)),
                rows=rows_by_key[(name, gk)],
            )
        return out
