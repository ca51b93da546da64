"""Cluster-submittable sketch job — the `ray job submit` entry point.

On a real cluster (the north-star deployment: fixed N / 4N nodes):

    ray job submit --working-dir . -- \
        python scripts/sketch_job.py --input s3://bucket/transcripts \
            --output /mnt/results --checkpoint /mnt/ckpt

Locally (this sandbox) the same script runs standalone:

    python scripts/sketch_job.py \
        --input /tmp/gostatix_ray/bench_transcripts_1000000_42.parquet \
        --output /tmp/job_out --num-cpus 4

The script owns its Ray session (library code never calls ray.init):
under `ray job submit` RAY_ADDRESS is set by the job runtime and we
attach to the cluster; otherwise we start a local session.

``--spec`` takes a JSON list of sketch requests; the default is the
flagship six over the transcript schema (conv_id / role / tool / text /
turn_idx).  ``--checkpoint`` makes the build resumable (per-partition
lineage; a killed job re-submitted with the same checkpoint dir skips
completed build fragments and re-merges byte-identically).  ``--output``
uses the atomic per-sketch parquet sink, so re-runs skip finished
sketches (resumable-output contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIP_SPEC = [
    {"name": "distinct_convs", "kind": "hll", "params": {"m": 16384}, "on": "conv_id"},
    {"name": "role_tool_card", "kind": "hll", "params": {"m": 4096},
     "on": ["role", "tool"]},
    {"name": "token_freq", "kind": "cms",
     "params": {"error_rate": 0.0005, "delta": 0.01}, "on": {"tokens": "text"}},
    {"name": "top_tools", "kind": "topk", "params": {"k": 10}, "on": "tool"},
    {"name": "turn_quantiles", "kind": "tdigest", "params": {"compression": 100.0},
     "on": "turn_idx"},
    {"name": "conv_member", "kind": "bloom",
     "params": {"n": 2_000_000, "fpp": 1e-4}, "on": "conv_id"},
]


def _to_request(d: dict):
    from gostatix_ray.kernels import bloom, cms, hll, kll, tdigest, topk
    from gostatix_ray.stages.build import SketchRequest, composite_key, tokens_of

    kind, p = d["kind"], dict(d.get("params", {}))
    if kind == "hll":
        spec = hll.HLLSpec(m=p.get("m", 1 << 14))
    elif kind == "cms":
        spec = cms.CMSSpec.from_error_rate(p.get("error_rate", 1e-4), p.get("delta", 0.01))
    elif kind == "topk":
        spec = topk.TopKSpec(k=p.get("k", 10))
    elif kind == "tdigest":
        spec = tdigest.TDigestSpec(p.get("compression", 100.0))
    elif kind == "kll":
        spec = kll.KLLSpec(k=p.get("k", 200))
    elif kind == "bloom":
        spec = bloom.BloomSpec.from_params(p.get("n", 1_000_000), p.get("fpp", 1e-4))
    elif kind == "kmv":
        from gostatix_ray.kernels import kmv

        spec = kmv.KMVSpec(k=p.get("k", 1024))
    else:
        raise SystemExit(f"unknown sketch kind {kind!r}")
    on = d["on"]
    if isinstance(on, dict):
        on = tokens_of(on["tokens"])
    elif isinstance(on, list):
        on = composite_key(*on)
    return SketchRequest(d["name"], kind, spec, on=on, group_by=d.get("group_by"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True,
                    help="parquet path/dir of transcripts (or any table the spec's "
                         "'on' columns exist in); a bare sf dir resolves "
                         "transcripts.parquet|events.parquet inside it")
    ap.add_argument("--output", help="results dir (atomic per-sketch parquet sink)")
    ap.add_argument("--checkpoint", help="lineage checkpoint dir (resumable build)")
    ap.add_argument("--spec", help="JSON file or inline JSON list of sketch requests "
                                   "(default: the flagship six)")
    ap.add_argument("--salt-by", help="skew-salt the build on this column")
    ap.add_argument("--salt-buckets", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="build batch size (default None = fused read->build)")
    ap.add_argument("--num-cpus", type=int,
                    help="LOCAL runs only: cpu cap for the local session")
    ap.add_argument("--cube-out", help="build/extend a time-partitioned sketch "
                    "cube at this dir instead of the flat pipeline (per-cell "
                    "merged states; see gostatix_ray/pipelines/cube.py)")
    ap.add_argument("--cube-unit", choices=("hour", "day", "month"), default="day")
    ap.add_argument("--time-col", default="ts", help="cube time column")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if os.environ.get("RAY_JOB_ID"):
            ray.init()  # inside `ray job submit`: attach to the cluster
        else:
            ray.init(address="local", num_cpus=args.num_cpus or None,
                     include_dashboard=False, logging_level="ERROR")

    import ray.data as rd

    from gostatix_ray.pipelines.sketch_pipeline import (
        SketchPipeline, finalize_row, write_results,
    )

    path = args.input
    # convenience: a testdata sf dir holds MANY tables — pick transcripts
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "transcripts.parquet")):
        path = os.path.join(path, "transcripts.parquet")

    spec = FLAGSHIP_SPEC
    if args.spec:
        spec = json.loads(open(args.spec).read() if os.path.exists(args.spec) else args.spec)
    requests = [_to_request(d) for d in spec]

    t0 = time.perf_counter()
    ds = rd.read_parquet(path)
    if args.cube_out:
        from gostatix_ray.pipelines.cube import (
            build_sketch_cube, extend_sketch_cube, read_cube,
        )

        fn = (extend_sketch_cube
              if os.path.isdir(args.cube_out) and os.listdir(args.cube_out)
              else build_sketch_cube)
        fn(ds, requests, time_col=args.time_col, unit=args.cube_unit,
           out_dir=args.cube_out)
        tbl = read_cube(args.cube_out)
        print(json.dumps({
            "wall_s": round(time.perf_counter() - t0, 3),
            "cube": args.cube_out, "unit": args.cube_unit,
            "cells": len(set(tbl["group_key"].to_pylist())),
            "state_rows": tbl.num_rows,
        }))
        ray.shutdown()
        return
    pipe = SketchPipeline(
        requests,
        batch_size=args.batch_size,
        checkpoint_dir=args.checkpoint,
        salt_by=args.salt_by,
        salt_buckets=args.salt_buckets,
    )
    results = pipe.run(ds)
    out = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "sketches": {f"{k[0]}|{k[1]}": finalize_row(r)["estimate"]
                     for k, r in sorted(results.items())},
    }
    if args.output:
        out["output"] = write_results(results, args.output)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
