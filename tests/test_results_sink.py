"""Estimates sink: partitioned parquet output, atomic + resumable."""

import os

import pyarrow.parquet as pq

from gostatix_ray.kernels import hll, topk
from gostatix_ray.pipelines.sketch_pipeline import SketchResult, finalize_row, write_results


def _results():
    h = hll.new(hll.HLLSpec(m=1 << 10))
    hll.update(h, [f"c{i}" for i in range(500)])
    t = topk.new(topk.TopKSpec(k=3))
    topk.update(t, ["a"] * 5 + ["b"] * 3 + ["c"])
    return {
        ("convs", ""): SketchResult("convs", "hll", "", h, 500),
        ("tools", "user"): SketchResult("tools", "topk", "user", t, 9),
    }


def test_finalize_rows():
    res = _results()
    row = finalize_row(res[("convs", "")])
    assert abs(row["estimate"] - 500) / 500 < 0.15
    row = finalize_row(res[("tools", "user")])
    assert row["estimate"] == 5.0
    assert row["detail"].startswith("a:5")


def test_write_and_resume(tmp_path):
    out = str(tmp_path / "estimates")
    write_results(_results(), out)
    t = pq.read_table(os.path.join(out, "sketch=convs", "estimates.parquet"))
    assert t.num_rows == 1
    # round-trip the persisted state
    st = hll.from_bytes(t["state"][0].as_py())
    assert abs(hll.count(st) - 500) / 500 < 0.15
    # resume: existing sketch dirs are skipped (mtime unchanged)
    before = os.path.getmtime(os.path.join(out, "sketch=convs", "estimates.parquet"))
    write_results(_results(), out)
    assert os.path.getmtime(os.path.join(out, "sketch=convs", "estimates.parquet")) == before


def test_incremental_update_byte_identical(ray_session, tmp_path):
    """Persisted states + delta build == one build over the union corpus,
    byte-identical for every BYTE_STABLE kind (incremental corpus
    updates without re-reading yesterday's data)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gostatix_ray.kernels import bloom, cms, hll, moments, topk
    from gostatix_ray.pipelines.sketch_pipeline import (
        SketchPipeline, merge_results, read_results, write_results,
    )
    from gostatix_ray.registry import kernel_for
    from gostatix_ray.stages.build import SketchRequest

    rng = np.random.default_rng(17)
    full = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 800, 6000)],
            "tok": rng.choice([f"t{i}" for i in range(50)], 6000),
            "val": np.round(rng.exponential(40, 6000), 2),
        }
    )
    reqs = [
        SketchRequest("users", "hll", hll.HLLSpec(m=1 << 10), on="user"),
        SketchRequest("toks", "cms", cms.CMSSpec.from_error_rate(0.001, 0.01), on="tok"),
        SketchRequest("top_toks", "topk", topk.TopKSpec(k=5), on="tok"),
        SketchRequest("member", "bloom", bloom.BloomSpec.from_params(10_000, 1e-4), on="user"),
        SketchRequest("vals", "moments", moments.MomentsSpec(k=2, scale=100), on="val"),
    ]

    def run(df, parts):
        pipe = SketchPipeline(reqs, batch_size=1024, concurrency=2)
        return pipe.run(rd.from_pandas(df).repartition(parts))

    day1, day2 = full.iloc[:3500], full.iloc[3500:]
    d1 = run(day1, 4)
    out_dir = str(tmp_path / "day1")
    write_results(d1, out_dir)
    restored = read_results(out_dir)
    merged = merge_results(restored, run(day2, 3))
    whole = run(full, 5)
    assert set(merged) == set(whole)
    for key, res in whole.items():
        kernel = kernel_for(res.kind)
        if res.kind == "topk":
            # topk's contract is values()-invariance: the candidate set is
            # partition-dependent by design (per-block gate), the CMS is
            # byte-stable (test_merge_laws semantics)
            assert topk.values(merged[key].state) == topk.values(res.state)
            assert cms.to_bytes(merged[key].state.cms) == cms.to_bytes(res.state.cms)
        else:
            assert kernel.to_bytes(merged[key].state) == kernel.to_bytes(res.state), key
        assert merged[key].rows == res.rows
