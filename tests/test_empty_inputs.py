"""Zero-row-corpus robustness: the empty-partition/empty-day cases a
100 TB pipeline meets routinely must return schema-stable empty (or
documented-degenerate) results, never KeyError/TypeError crashes.

Full sweep: scripts/empty_probe.py (all catalog queries; 0 crashes).
This file pins one representative per fixed crash cluster so the
guarantee survives refactors without paying the full sweep in CI.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        schema = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), os.path.join(d, f"{t}.parquet"))
    return d


def _run(name, sf):
    from gostatix_ray.pipelines import catalog

    res = catalog.QUERIES[name](sf)
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def test_sketch_of_empty_stream_is_fresh_state(empty_sf):
    # cluster: collect_final KeyError (name, '') — final_state fallback
    df = _run("hll_distinct_users", empty_sf)
    assert float(df["distinct_users_est"].iloc[0]) == 0.0
    df = _run("topk_event_types_sketch", empty_sf)
    assert len(df) == 0
    df = _run("bloom_click_users_semijoin", empty_sf)
    assert len(df) == 0


def test_final_state_helper_direct():
    from gostatix_ray.kernels import hll
    from gostatix_ray.stages.build import SketchRequest
    from gostatix_ray.stages.merge import final_blob, final_state

    req = SketchRequest("x", "hll", hll.HLLSpec(m=1 << 8), on="c")
    st = final_state({}, req)
    assert hll.count(st) == 0.0
    assert final_blob({}, req) == hll.to_bytes(hll.new(req.spec))
    # present key still decodes normally
    st2 = hll.new(req.spec)
    hll.update(st2, pa.array(["a", "b"]).cast(pa.string()))
    got = final_state({("x", ""): hll.to_bytes(st2)}, req)
    assert hll.equals(got, st2)


def test_exact_quantiles_of_nothing_is_nan(empty_sf):
    # cluster: float(None) in the min/max aggregate
    df = _run("value_quantiles_exact", empty_sf)
    assert len(df) > 0 and df["value_exact"].isna().all()
    df = _run("value_rank_exact", empty_sf)
    assert df["rank_frac"].isna().all()


def test_lm_and_collocations_empty(empty_sf):
    # cluster: gram count table loses its columns
    assert len(_run("doc_lm_frequency_stats", empty_sf)) == 0
    t = _run("top_collocations", empty_sf)
    assert len(t) == 0
    assert list(t.columns) == ["w1", "w2", "c12", "c1", "c2", "lift"]


def test_dedup_family_empty(empty_sf):
    assert len(_run("doc_dedup_exact", empty_sf)) == 0
    assert len(_run("doc_dedup_normalized", empty_sf)) == 0
    assert len(_run("incremental_dedup", empty_sf)) == 0
    assert len(_run("semantic_dedup_exact", empty_sf)) == 0
    assert len(_run("semantic_dedup_pruned", empty_sf)) == 0
    d = _run("corpus_snapshot_diff", empty_sf)
    assert len(d) == 0 and "doc_id" in d.columns


def test_cube_over_zero_rows(empty_sf):
    df = _run("cube_dau_range", empty_sf)
    assert float(df["distinct_users_est"].iloc[0]) == 0.0
    assert df["top_event_type"].iloc[0] is None


def test_schema_less_join_raises_documented_error(empty_sf):
    # Ray cannot infer a map_batches schema over zero rows; the join
    # must say so, not die on NoneType.base_schema
    from gostatix_ray.pipelines import catalog

    with pytest.raises(ValueError, match="no schema"):
        catalog.QUERIES["order_priority_revenue"](empty_sf)


def test_kmeans_of_nothing_raises_documented_error(empty_sf):
    from gostatix_ray.stages.ann import kmeans_fit

    ds = ray.data.read_parquet(os.path.join(empty_sf, "embeddings.parquet"))
    with pytest.raises(ValueError, match="zero rows"):
        kmeans_fit(ds, emb_col="embedding", k=4)
