"""Sketches as ray.data AggregateFn — global and grouped."""

import numpy as np
import pytest

from gostatix_ray.aggs import sketch_agg
from gostatix_ray.kernels import cms, hll, tdigest


def test_global_hll_aggregate(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"k": f"u{i % 700}"} for i in range(5000)])
    out = ds.aggregate(sketch_agg("hll", hll.HLLSpec(m=1 << 12), "k", alias_name="sketch"))
    state = hll.from_bytes(out["sketch"])
    assert abs(hll.count(state) - 700) / 700 < 0.1


def test_grouped_cms_aggregate(ray_session):
    import ray.data as rd

    rows = []
    for g in ("a", "b"):
        for i in range(1000):
            rows.append({"grp": g, "k": f"{g}-{i % 50}"})
    ds = rd.from_items(rows)
    out = ds.groupby("grp").aggregate(
        sketch_agg("cms", cms.CMSSpec(rows=4, columns=2048), "k", alias_name="sketch")
    ).to_pandas()
    for _, row in out.iterrows():
        state = cms.from_bytes(row["sketch"])
        assert state.all_sum == 1000
        assert list(cms.count(state, [f"{row['grp']}-0"]))[0] == 20


def test_agg_equals_pipeline(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.build import SketchRequest, build_partials
    from gostatix_ray.stages.merge import collect_final, merge_partials

    rows = [{"k": f"v{i % 300}"} for i in range(3000)]
    ds = rd.from_items(rows)
    agg_out = ds.aggregate(sketch_agg("hll", hll.HLLSpec(m=256), "k", alias_name="s"))
    agg_state = hll.from_bytes(agg_out["s"])
    partials = build_partials(ds, [SketchRequest("x", "hll", hll.HLLSpec(m=256), on="k")], concurrency=2)
    pipe_state = hll.from_bytes(collect_final(merge_partials(partials))[("x", "")])
    assert hll.equals(agg_state, pipe_state)  # same registers either route


def test_unmergeable_kind_rejected():
    with pytest.raises(ValueError):
        sketch_agg("cuckoo", None, "k")


def test_ddsketch_and_spacesaving_aggs(ray_session):
    """The two round-5 kernels ride the native AggregateFn path and
    match a local kernel build byte-for-byte."""
    import numpy as np
    import pandas as pd
    import ray

    from gostatix_ray.kernels import ddsketch, spacesaving

    rng = np.random.default_rng(23)
    vals = rng.lognormal(1.0, 1.0, 8000)
    keys = [f"k{v}" for v in rng.zipf(1.5, 8000).clip(1, 40)]
    ds = ray.data.from_pandas(
        pd.DataFrame({"v": vals, "k": keys})).repartition(5)

    spec = ddsketch.DDSpec(alpha=0.02, max_bins=256)
    out = ds.aggregate(sketch_agg("ddsketch", spec, "v", alias_name="s"))
    got = ddsketch.from_bytes(out["s"])
    want = ddsketch.new(spec)
    ddsketch.update(want, vals)
    assert ddsketch.to_bytes(got) == ddsketch.to_bytes(want)

    ss_spec = spacesaving.SSSpec(k=64)
    out2 = ds.aggregate(sketch_agg("spacesaving", ss_spec, "k",
                                   alias_name="s"))
    got2 = spacesaving.from_bytes(out2["s"])
    from collections import Counter

    assert dict(spacesaving.values(got2)) == dict(Counter(keys))
    assert got2.err == 0  # 40 distinct < k=64: exact regime
