"""Checkpoint + lineage for partially-merged sketch trees (north rule).

The reference's persistence layer is ``Export``/``WriteTo`` +
``Import``/``ReadFrom``/``...FromKey`` (SURVEY.md §2.5).  Distributed
equivalent: the partial-sketch Dataset is written as a *partitioned
Parquet checkpoint* plus a lineage manifest, and a rerun resumes from
the checkpoint instead of rebuilding:

    <dir>/partials/...parquet      one partial-sketch row per input block
    <dir>/manifest.json            {fragment -> {rows, checksum}}, totals

Every partial row carries (fragment, rows, checksum) — the per-partition
lineage records required by the north rule.  Because fragments are
content-addressed and merges associative, a resumed run produces
byte-identical final sketches (tests/test_e2e_ray.py).
"""

from __future__ import annotations

import json
import os

_MANIFEST = "manifest.json"
_PARTIALS = "partials"


def partials_dir(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, _PARTIALS)


def write_checkpoint(partials_ds, checkpoint_dir: str) -> dict:
    """Materialize the partial-sketch table + lineage manifest atomically."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    pdir = partials_dir(checkpoint_dir)
    tmp = pdir + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    partials_ds.write_parquet(tmp)
    lineage = {}
    import ray.data as rd

    for batch in rd.read_parquet(tmp, columns=["fragment", "rows", "checksum"]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        for row in batch.to_pylist():
            lineage[row["fragment"]] = {"rows": row["rows"], "checksum": row["checksum"]}
    manifest = {
        "fragments": lineage,
        "num_partials": len(lineage),
        "total_rows": sum(v["rows"] for v in lineage.values()),
        "complete": True,
    }
    if os.path.exists(pdir):
        import shutil

        shutil.rmtree(pdir)
    os.rename(tmp, pdir)
    with open(os.path.join(checkpoint_dir, _MANIFEST + ".tmp"), "w") as f:
        json.dump(manifest, f)
    os.replace(os.path.join(checkpoint_dir, _MANIFEST + ".tmp"), os.path.join(checkpoint_dir, _MANIFEST))
    return manifest


def load_manifest(checkpoint_dir: str) -> dict | None:
    path = os.path.join(checkpoint_dir, _MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def resume_partials(checkpoint_dir: str):
    """Dataset of checkpointed partials, or None if no complete checkpoint."""
    manifest = load_manifest(checkpoint_dir)
    if not manifest or not manifest.get("complete"):
        return None
    import ray.data as rd

    return rd.read_parquet(partials_dir(checkpoint_dir))


def checkpoint_dataset(factory, stage_dir: str, spec: dict | None = None):
    """Stage-level Dataset checkpoint for multi-stage pipelines (the
    curation composite).  First run: executes ``factory()`` ONCE, writes
    the result as parquet atomically (tmp dir + rename + marker), and
    returns a Dataset reading it back.  Rerun: returns the persisted
    Dataset WITHOUT calling ``factory`` — a killed pipeline resumes from
    its last completed stage instead of restarting from zero.

    ``spec``: JSON-serializable fingerprint of the stage's PARAMETERS
    (thresholds, knobs).  It is stored in the marker and compared on
    resume — a rerun with different parameters INVALIDATES the stage
    and recomputes, instead of silently returning results computed
    under the old parameters.  Callers that pass no spec keep the
    path-only contract.

    Returns ``(ds, rows)``; ``ds`` is None when the stage produced zero
    rows (an empty Dataset has no schema to persist — the marker records
    ``rows: 0`` so the resume path short-circuits identically).
    """
    import shutil

    data = os.path.join(stage_dir, "data")
    marker = os.path.join(stage_dir, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if spec is not None and meta.get("spec") != spec:
            os.remove(marker)  # parameters changed: invalidate, fall through
        elif meta["rows"] == 0:
            return None, 0
        else:
            from ..sources.pq_read import clean_read_parquet

            return clean_read_parquet(data), meta["rows"]

    os.makedirs(stage_dir, exist_ok=True)
    tmp = data + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds = factory().materialize()
    rows = ds.count()
    if rows > 0:
        ds.write_parquet(tmp)
        shutil.rmtree(data, ignore_errors=True)
        os.rename(tmp, data)
    meta = {"rows": rows}
    if spec is not None:
        meta["spec"] = spec
    with open(marker + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(marker + ".tmp", marker)
    if rows == 0:
        return None, 0
    from ..sources.pq_read import clean_read_parquet

    return clean_read_parquet(data), rows
