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
