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
from ..stages.merge import collect_final, merge_partials, merge_partials_streaming
from ..state import lineage as lin


@dataclass
class SketchResult:
    name: str
    kind: str
    group_key: str
    state: Any  # deserialized kernel state
    rows: int


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
        merged = merge_partials(partials, fan_in=self.fan_in)
        final = {}
        rows_by_key = {}
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
