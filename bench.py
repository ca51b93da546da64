"""Benchmark harness (driver contract).

Runs the headline pipelines and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "turns": T, "turns_per_sec": r}

Headline = the flagship one-pass multi-sketch build (HLL conv
cardinality + grouped (role,tool) HLL + token CMS + tool top-k +
t-digest + bloom) over the deterministic transcript table — the
north-star metric is sketch-build throughput in turns/sec.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32), GRAFT_TURNS (default 1_000_000 transcript turns).

``--scaling``: runs the same bench in two fresh processes at
num_cpus=8 and num_cpus=32 on identical input and reports both
throughputs + scaling efficiency (the sandbox stand-in for N vs 4N
nodes; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_turns = int(os.environ.get("GRAFT_TURNS", "1000000"))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Sketch pipelines are funnels (heavy build map -> tiny merges); the
    # executor's 0.5 per-operator CPU reservation for the downstream ops
    # halves build parallelism (measured 47s -> 21s on 32M turns @ 8
    # CPUs).  All stages are stateless tasks, so disabling is safe.
    if hasattr(ctx, "op_resource_reservation_enabled"):
        ctx.op_resource_reservation_enabled = False

    import ray.data as rd

    from gostatix_ray.kernels import bloom, cms, hll, tdigest, topk
    from gostatix_ray.pipelines.sketch_pipeline import SketchPipeline
    from gostatix_ray.sources.transcripts import generate_transcripts
    from gostatix_ray.stages.build import SketchRequest, composite_key, tokens_of

    # deterministic input, generated once and cached on disk.  Shard count
    # is fixed by the INPUT (never by num_cpus — scaling levels must read
    # identical bytes): >=64 files so the fused read+build has a file per
    # task slot at every parallelism level.
    import glob

    num_files = max(64, num_turns // 250_000)
    tx_path = f"/tmp/gostatix_ray/bench_transcripts_{num_turns}_42.parquet"
    if os.path.exists(tx_path) and len(glob.glob(tx_path + "/*.parquet")) != num_files:
        tx_path = f"/tmp/gostatix_ray/bench_transcripts_{num_turns}_42_{num_files}f.parquet"
    if not os.path.exists(tx_path):
        generate_transcripts(tx_path, num_turns, seed=42, num_files=num_files)

    # warm the page cache so we measure compute + shuffle, not first-touch
    # disk.  count() is NOT enough — it answers from parquet metadata
    # without reading a data page — so decode every block and discard it.
    def _touch(batch):
        import pyarrow as _pa

        return _pa.table({"n": [batch.num_rows]})

    def _warm_input(path: str, nfiles: int):
        rd.read_parquet(path, override_num_blocks=nfiles).map_batches(
            _touch, batch_format="pyarrow", batch_size=None
        ).materialize()

    _warm_input(tx_path, num_files)

    # warm the WORKER POOL: each Ray worker pays ~1-2s of library imports
    # (numpy/pandas/pyarrow + gostatix_ray) on its first sketch task; in a
    # fused streaming pipeline that lands inside the timed section and on
    # whichever stage first touches a cold worker.  One dummy wave over
    # 2x num_cpus blocks imports everything on (nearly) every worker so
    # the bench measures pipeline capability, not interpreter start-up.
    def _warm(batch):
        import pandas  # noqa: F401

        from gostatix_ray.registry import kernel_for  # noqa: F401
        from gostatix_ray.hashing import hash128
        import pyarrow as _pa

        hash128(_pa.array(["warm"] * 8), 0)
        return batch

    rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
        _warm, batch_format="pyarrow"
    ).materialize()

    queries: dict[str, float] = {}

    def timed(name: str, fn, repeats: int = 1, adaptive_max: int = 0):
        """min-of-repeats; with ``adaptive_max``, keep re-running (up to
        that many total) while the observed spread exceeds 1.5x — the
        signature of a hypervisor-steal episode, where a fixed repeat
        count still ships noise instead of capability."""
        best = worst = None
        runs = 0
        while True:
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            runs += 1
            best = dt if best is None else min(best, dt)
            worst = dt if worst is None else max(worst, dt)
            if runs >= repeats and (
                runs >= max(adaptive_max, repeats) or worst / best <= 1.5
            ):
                break
        queries[name] = round(best, 3)
        return out

    # actor pool sized by BOTH cpus and available work (blocks of 64k turns):
    # idle actors still pay startup, which anti-scales small inputs
    conc = max(2, min(num_cpus - 2, num_turns // 65536))

    # --- headline: one-pass multi-sketch build over the transcript table ----
    # FUSED read+build (stages/build.py docstring): block count pinned to
    # the file count, batch_size=None, no concurrency cap => the parquet
    # read fuses into the build task and the decoded table never
    # round-trips through the object store (~4x wall on this host).
    def _flagship_over(path: str, nfiles: int):
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

    def flagship():
        return _flagship_over(tx_path, num_files)

    # headline takes min-of-3: the shared host shows up-to-2x
    # hypervisor-steal swings on identical configs (BASELINE.md; an A/B
    # this round measured the SAME code at 6.4s and 12.2s minutes apart),
    # and the shipped number should measure pipeline capability, not that
    # noise; cheap secondaries stay single-shot to keep the bench short
    res = timed("flagship_sketch_build", flagship,
                repeats=int(os.environ.get("GRAFT_HEADLINE_REPEATS", "3")),
                adaptive_max=int(os.environ.get("GRAFT_HEADLINE_MAX_REPEATS", "6")))
    assert ("distinct_convs", "") in res

    # --- scale point: the SAME flagship at 64M turns ------------------------
    # Per-turn efficiency dominates here (the 1M headline is ~87%
    # fixed-cost: wall time is affine, ~9.4s + 0.168s/M turns at 32 cpus —
    # BASELINE.md linearity table).  Guarded on the input cache already
    # being on disk: a miss would regenerate 3 GiB single-threaded
    # (~10 min) inside the bench window, so this row self-skips rather
    # than stall the driver.
    turns_64m = 64_000_000
    path_64m = f"/tmp/gostatix_ray/bench_transcripts_{turns_64m}_42.parquet"
    files_64m = turns_64m // 250_000
    if (
        not os.environ.get("GRAFT_HEADLINE_ONLY")
        and num_turns != turns_64m
        and len(glob.glob(path_64m + "/*.parquet")) == files_64m
    ):
        _warm_input(path_64m, files_64m)  # real page-cache warm, same as headline
        timed("flagship_64m", lambda: _flagship_over(path_64m, files_64m),
              repeats=2, adaptive_max=4)

    # --- secondary pipelines over the testdata tables -----------------------
    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        from gostatix_ray.pipelines import catalog

        catalog._CONC = conc
        timed("hll_distinct_users", lambda: catalog.q_hll_distinct_users(sf_dir))
        timed("events_hourly_window", lambda: catalog.q_events_hourly_window(sf_dir).materialize())
        # the two LSH pipelines swing the most with host steal: min-of-3
        lsh_rep = int(os.environ.get("GRAFT_LSH_REPEATS", "2"))
        timed("minhash_dedup_pairs", lambda: catalog.q_minhash_dedup_pairs(sf_dir),
              repeats=lsh_rep, adaptive_max=4)
        timed("near_dup_pairs_verified", lambda: catalog.q_near_dup_pairs_verified(sf_dir),
              repeats=lsh_rep, adaptive_max=4)
        timed("ann_brute_cosine", lambda: catalog.q_ann_brute_cosine(sf_dir))
        timed("value_quantiles_tdigest", lambda: catalog.q_value_quantiles_tdigest(sf_dir))
        timed("order_priority_revenue", lambda: catalog.q_order_priority_revenue(sf_dir).materialize())
        timed("user_running_value", lambda: catalog.q_user_running_value(sf_dir).materialize())
        timed("user_running_value_scan", lambda: catalog.q_user_running_value_scan(sf_dir).materialize())
        timed("user_trailing_value", lambda: catalog.q_user_trailing_value(sf_dir).materialize())
        timed("substring_dup_pairs", lambda: catalog.q_substring_dup_pairs(sf_dir).materialize())
        timed("events_quality_audit", lambda: catalog.q_events_quality_audit(sf_dir).materialize())

        def _consume(x):
            return x.materialize() if hasattr(x, "materialize") else x

        # round-5 analytics/search family: one slim-pair shuffle each
        timed("events_rolling_7d_users", lambda: _consume(catalog.q_events_rolling_7d_users(sf_dir)))
        timed("events_funnel", lambda: _consume(catalog.q_events_funnel(sf_dir)))
        timed("keyword_search_topk", lambda: _consume(catalog.q_keyword_search_topk(sf_dir)))
        # round-5-late additions: LM scoring (two text scans + one
        # gram-count shuffle), hybrid RRF (two pruned top-N lists),
        # DDSketch + SpaceSaving through the full build->merge path
        timed("doc_lm_frequency_stats", lambda: _consume(catalog.q_doc_lm_frequency_stats(sf_dir)))
        timed("hybrid_search_rrf", lambda: _consume(catalog.q_hybrid_search_rrf(sf_dir)))
        timed("value_quantiles_ddsketch", lambda: _consume(catalog.q_value_quantiles_ddsketch(sf_dir)))
        timed("spacesaving_event_types", lambda: _consume(catalog.q_spacesaving_event_types(sf_dir)))

        # --- sf1 (10x) relational scale point (round-4 verdict #5): the
        # planner's broadcast-vs-shuffle decisions at 6M lineitem rows.
        # Input is the deterministic key-offset replication of sf0.1
        # (join fan-outs preserved), cached under /tmp like the
        # transcript shards; first build costs ~5s.
        from gostatix_ray.sources.tpch_scale import ensure_sf1

        timed("auto_mktsegment_revenue", lambda: _consume(catalog.q_auto_mktsegment_revenue(sf_dir)))
        timed("building_orders_top_revenue", lambda: _consume(catalog.q_building_orders_top_revenue(sf_dir)))
        sf01_src = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.1")
        if os.path.isdir(sf01_src):
            sf1 = ensure_sf1(sf01_src)
            timed("order_priority_revenue_sf1", lambda: catalog.q_order_priority_revenue(sf1).materialize(),
                  repeats=2, adaptive_max=4)
            timed("auto_mktsegment_revenue_sf1", lambda: _consume(catalog.q_auto_mktsegment_revenue(sf1)),
                  repeats=2, adaptive_max=4)
            timed("building_orders_top_revenue_sf1", lambda: _consume(catalog.q_building_orders_top_revenue(sf1)),
                  repeats=2, adaptive_max=4)

        # --- year-scale cube: 8,760 hourly cells (round-4 verdict #7).
        # Build once per process over a synthetic year, then report the
        # WARM per-query latency of a ~720-cell month range — the number
        # the 100 TB pitch rests on (range analytics without rescans).
        def _year_cube_query_avg():
            import numpy as _np
            import pandas as _pd
            import pyarrow.compute as _pc

            from gostatix_ray.kernels import hll as _hll
            from gostatix_ray.pipelines.cube import CubeReader, build_sketch_cube
            from gostatix_ray.stages.build import SketchRequest as _SR

            out_dir = "/tmp/gostatix_ray/bench_year_cube"
            if not (os.path.isdir(out_dir) and os.listdir(out_dir)):
                rng = _np.random.default_rng(17)
                n = 8760 * 6
                ts = (_np.datetime64("2024-01-01", "us")
                      + (_np.arange(n) * 600_000_000).astype("timedelta64[us]"))
                df = _pd.DataFrame({"user_id": rng.integers(0, 5000, n), "ts": ts})
                build_sketch_cube(
                    rd.from_pandas(df).repartition(8),
                    [_SR("users_hll", "hll", _hll.HLLSpec(m=1 << 12),
                         on=lambda b: _pc.cast(b["user_id"], pa.string()))],
                    time_col="ts", unit="hour", out_dir=out_dir)
            r = CubeReader(out_dir)
            r.distinct("users_hll", "2024-06-01T00", "2024-07-01T00")  # warm cache
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                r.distinct("users_hll", "2024-06-01T00", "2024-07-01T00")
            return (time.perf_counter() - t0) / reps

        import pyarrow as pa

        queries["cube_8760_month_range_query"] = round(_year_cube_query_avg(), 4)

    headline = queries["flagship_sketch_build"]
    out = {
        "metric": "sketch-build throughput (turns/sec) via flagship multi-sketch pipeline",
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "turns": num_turns,
        "turns_per_sec": round(num_turns / headline, 1),
    }
    if "flagship_64m" in queries:
        out["turns_per_sec_64m"] = round(64_000_000 / queries["flagship_64m"], 1)
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        # scaling needs a compute-bound input: default to 4M turns
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_HEADLINE_ONLY="1",
                   GRAFT_HEADLINE_REPEATS="1",  # repeats handled at this level
                   GRAFT_TURNS=os.environ.get("GRAFT_TURNS_SCALING", "64000000"))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # N vs 4N parallelism in fresh processes on identical input.  Default
    # 4 vs 16: this sandbox's aggregate throughput plateaus past ~16
    # workers (single shared memory bus — measured in BASELINE.md), which
    # a real multi-NODE 4x cluster does not suffer; both levels must sit
    # below the single-box saturation knee for the comparison to model
    # node-count scaling.
    n_lo, n_hi = (int(x) for x in os.environ.get("RAY_GRAFT_SCALING_CPUS", "2,8").split(","))
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "6"))
    # min over repeats: the sandbox host is shared/noisy (run-to-run swings
    # of 1.5x observed); the minimum measures pipeline capability.
    # INTERLEAVED lo/hi rounds: steal episodes last minutes, so running
    # all lo repeats then all hi repeats lets one episode bias a whole
    # level and skew the ratio (observed: a sequential 128M sweep read
    # eff=0.73 because the lo phase landed calm and the hi phase hot);
    # alternating levels exposes both to the same weather.
    lo_runs, hi_runs = [], []
    for i in range(repeats):
        lo_runs.append(run(n_lo))
        hi_runs.append(run(n_hi))
        print(f"round {i}: lo={lo_runs[-1]['value']}s hi={hi_runs[-1]['value']}s",
              file=sys.stderr, flush=True)
    lo = min(lo_runs, key=lambda d: d["value"])
    hi = min(hi_runs, key=lambda d: d["value"])
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (n_hi / n_lo)
    return {
        "metric": f"scaling efficiency, num_cpus {n_lo} -> {n_hi} (stand-in for N -> 4N nodes)",
        f"sec_{n_lo}": t_lo,
        f"sec_{n_hi}": t_hi,
        f"turns_per_sec_{n_lo}": lo["turns_per_sec"],
        f"turns_per_sec_{n_hi}": hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "turns": lo["turns"],
    }


def run_all() -> dict:
    """Time EVERY catalog query once at $GRAFT_SF_DIR (diagnostic sweep;
    single-shot, so read it with the host-noise caveat in BASELINE.md)."""
    import time

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if hasattr(ctx, "op_resource_reservation_enabled"):
        ctx.op_resource_reservation_enabled = False
    import ray.data as rd

    rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()
    from gostatix_ray.pipelines import catalog

    times: dict = {}
    for name, fn in catalog.QUERIES.items():
        t0 = time.perf_counter()
        try:
            out = fn(sf_dir)
            if hasattr(out, "materialize"):
                out.materialize()
            times[name] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # keep sweeping; surface the failure
            times[name] = f"ERR {type(e).__name__}"
        print(f"{name}: {times[name]}", file=sys.stderr, flush=True)
    ray.shutdown()
    return {"metric": "per-query wall seconds (single-shot sweep)",
            "sf": sf_dir, "num_cpus": num_cpus, "queries": times}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--all" in sys.argv:
        print(json.dumps(run_all()))
    else:
        print(json.dumps(run_bench()))
