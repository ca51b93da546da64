"""Skew evidence at bench scale (north rule: "partitioning / shuffle /
skew handled explicitly").

Builds two transcript tables of IDENTICAL size and schema:

* ``uniform`` — the standard generator (zipf-1.7 conv lengths capped at
  400 turns: realistic mild skew, no single dominant key);
* ``extreme`` — the same table with the first ~30% of rows relabeled to
  ONE conv_id ("conv-mega"), occupying whole contiguous files.  This is
  the worst clustering a real export produces: a single hot key holding
  a third of the corpus, co-located in storage.

Then measures, in one Ray session, on both inputs:

1. ``flagship`` — the 6-sketch fused build (the bench headline).
   Map-side partial build is skew-IMMUNE by construction: every block
   yields one bounded partial row per sketch regardless of key
   distribution, so wall time should be flat across inputs.
2. ``topk_conv`` — Top-K heavy hitters over conv_id.  The skew-ANALYSIS
   op: verifies the mega key is detected with an exact-ish count (the
   profile step auto_join uses to choose salting).
3. ``window_conv`` — per-conv running sum (window_over partitioned by
   conv_id).  A holistic per-key op: the hot key cannot be split, so it
   lands in ONE bucket of the coarse shuffle — but resolves inside one
   VECTORIZED lexsort+cumsum, so the straggler costs vector time, not
   Python time (stages/joins.py:342 makes the same claim for joins;
   this measures it).
4. ``salted vs unsalted grouped build`` — build_partials with
   salt_by="conv_id", salt_buckets=32 against the unsalted run: final
   merged estimates must be IDENTICAL (merge associativity) while the
   salted pre-shuffle spreads the hot key's blocks across builders.

Usage:  python scripts/skew_probe.py [num_turns]   (default 4_000_000)

Prints one human table + one JSON line; paste the table into
BASELINE.md ("Skew evidence" section).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
SEED = 42
BASE = "/tmp/gostatix_ray/skew_probe"
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def ensure_inputs() -> tuple[str, str, int]:
    """Uniform table from the standard generator; extreme = same shards
    with the first 30% of files relabeled to one conv_id."""
    from gostatix_ray.sources.transcripts import generate_transcripts

    nfiles = max(4, N // 250_000)
    uni = os.path.join(BASE, f"uniform_{N}_{SEED}.parquet")
    if len(glob.glob(uni + "/*.parquet")) != nfiles:
        generate_transcripts(uni, N, seed=SEED, num_files=nfiles)
    ext = os.path.join(BASE, f"extreme_{N}_{SEED}.parquet")
    hot_files = max(1, int(nfiles * 0.3))
    if len(glob.glob(ext + "/*.parquet")) != nfiles:
        os.makedirs(ext, exist_ok=True)
        for i, f in enumerate(sorted(glob.glob(uni + "/*.parquet"))):
            t = pq.read_table(f)
            if i < hot_files:
                mega = pa.array(np.full(t.num_rows, "conv-mega", dtype=object), pa.string())
                t = t.set_column(t.schema.get_field_index("conv_id"), "conv_id", mega)
            pq.write_table(t, os.path.join(ext, os.path.basename(f)), row_group_size=65536)
    return uni, ext, nfiles, hot_files


def flagship(path: str, nfiles: int):
    import ray.data as rd

    from gostatix_ray.kernels import bloom, cms, hll, tdigest, topk
    from gostatix_ray.pipelines.sketch_pipeline import SketchPipeline
    from gostatix_ray.stages.build import SketchRequest, composite_key, tokens_of

    ds = rd.read_parquet(path, override_num_blocks=nfiles)
    pipe = SketchPipeline(
        [
            SketchRequest("distinct_convs", "hll", hll.HLLSpec(m=1 << 14), on="conv_id"),
            SketchRequest("role_tool_card", "hll", hll.HLLSpec(m=1 << 12), on=composite_key("role", "tool")),
            SketchRequest("token_freq", "cms", cms.CMSSpec.from_error_rate(0.0005, 0.01), on=tokens_of("text")),
            SketchRequest("top_tools", "topk", topk.TopKSpec(k=10), on="tool"),
            SketchRequest("turn_quantiles", "tdigest", tdigest.TDigestSpec(100.0), on="turn_idx"),
            SketchRequest("conv_member", "bloom", bloom.BloomSpec.from_params(2_000_000, 1e-4), on="conv_id"),
        ],
        batch_size=None,
        concurrency=None,
    )
    return pipe.run(ds)


def topk_conv(path: str, nfiles: int):
    import ray.data as rd

    from gostatix_ray.kernels import topk
    from gostatix_ray.pipelines.sketch_pipeline import SketchPipeline
    from gostatix_ray.stages.build import SketchRequest

    ds = rd.read_parquet(path, columns=["conv_id"], override_num_blocks=nfiles)
    pipe = SketchPipeline(
        [SketchRequest("hot_convs", "topk", topk.TopKSpec(k=5), on="conv_id")],
        batch_size=None,
        concurrency=None,
    )
    res = pipe.run(ds)
    state = res[("hot_convs", "")].state
    return topk.values(state)


def window_conv(path: str, nfiles: int):
    import ray.data as rd

    from gostatix_ray.stages.window_fns import window_over

    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "ts"], override_num_blocks=nfiles)
    out = window_over(
        ds,
        part_col="conv_id",
        order_col="ts",
        tiebreak="turn_idx",
        sum_col="turn_idx",
        running_name="running_turns",
        gap_name=None,
        keep=[],
    )
    return out.count()


def window_conv_scan(path: str, nfiles: int):
    import ray.data as rd

    from gostatix_ray.stages.window_scan import window_scan

    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "ts"], override_num_blocks=nfiles)
    out = window_scan(
        ds,
        part_col="conv_id",
        order_col="ts",
        tiebreak="turn_idx",
        sum_col="turn_idx",
        running_name="running_turns",
        gap_name=None,
        keep=[],
    )
    return out.count()


def grouped_build(path: str, nfiles: int, salted: bool):
    """Per-role grouped HLL of conv_id; returns {group: estimate} and the
    merged state bytes for the byte-equality check."""
    import ray.data as rd

    from gostatix_ray.kernels import hll
    from gostatix_ray.pipelines.sketch_pipeline import SketchPipeline
    from gostatix_ray.stages.build import SketchRequest

    ds = rd.read_parquet(path, columns=["conv_id", "role"], override_num_blocks=nfiles)
    pipe = SketchPipeline(
        [SketchRequest("convs_by_role", "hll", hll.HLLSpec(m=1 << 13), on="conv_id", group_by="role")],
        batch_size=None if not salted else 65536,
        concurrency=None,
        salt_by="conv_id" if salted else None,
        salt_buckets=32 if salted else 0,
    )
    res = pipe.run(ds)
    out = {}
    for (name, gkey), r in sorted(res.items()):
        out[gkey] = (hll.count(r.state), bytes(r.state.registers.tobytes()))
    return out


def timed(fn, *a, repeats: int = 2):
    best, out = float("inf"), None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*a)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), out


def main():
    import ray

    uni, ext, nfiles, hot_files = ensure_inputs()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NCPU, include_dashboard=False)

    rows = {}
    # warm the worker pool (same rationale as bench.py)
    flagship(uni, nfiles)

    for label, path in (("uniform", uni), ("extreme", ext)):
        t_flag, _ = timed(flagship, path, nfiles)
        t_topk, hh = timed(topk_conv, path, nfiles)
        t_win, nrows = timed(window_conv, path, nfiles)
        assert nrows == N, (label, nrows)
        t_scan, nrows2 = timed(window_conv_scan, path, nfiles)
        assert nrows2 == N, (label, nrows2)
        rows[label] = {"flagship_s": t_flag, "topk_conv_s": t_topk, "window_conv_s": t_win,
                       "window_scan_s": t_scan,
                       "top1": {"elem": hh[0][0], "count": int(hh[0][1])}}

    # salted vs unsalted grouped build on the EXTREME input
    t_plain, plain = timed(grouped_build, ext, nfiles, False, repeats=1)
    t_salt, salt = timed(grouped_build, ext, nfiles, True, repeats=1)
    assert set(plain) == set(salt)
    byte_equal = all(plain[g][1] == salt[g][1] for g in plain)
    est_equal = all(plain[g][0] == salt[g][0] for g in plain)
    rows["grouped_build"] = {
        "unsalted_s": t_plain, "salted_s": t_salt,
        "states_byte_equal": byte_equal, "estimates_equal": est_equal,
        "groups": {g: round(plain[g][0], 1) for g in plain},
    }

    print(f"\nskew probe @ {N:,} turns, {nfiles} files, {NCPU} cpus")
    print(f"{'pipeline':<22}{'uniform (s)':>14}{'extreme (s)':>14}{'ratio':>8}")
    for k in ("flagship_s", "topk_conv_s", "window_conv_s", "window_scan_s"):
        u, e = rows["uniform"][k], rows["extreme"][k]
        print(f"{k:<22}{u:>14}{e:>14}{e / u:>8.2f}")
    hot_expect = N * hot_files // nfiles
    print(f"top-1 conv on extreme: {rows['extreme']['top1']} (expect conv-mega ~= {hot_expect:,})")
    g = rows["grouped_build"]
    print(f"grouped build: unsalted {g['unsalted_s']}s, salted {g['salted_s']}s, "
          f"byte-equal={g['states_byte_equal']} est-equal={g['estimates_equal']}")
    print(json.dumps({"n_turns": N, "num_cpus": NCPU, **rows}))
    ray.shutdown()


if __name__ == "__main__":
    main()
