"""End-to-end Ray Data pipeline tests on the synthetic transcript table."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gostatix_ray.kernels import bloom, cms, hll, tdigest, topk
from gostatix_ray.pipelines.sketch_pipeline import SketchPipeline
from gostatix_ray.sources.transcripts import exact_ground_truth
from gostatix_ray.stages.build import SketchRequest, build_partials, composite_key, tokens_of
from gostatix_ray.stages.membership import filter_by_membership
from gostatix_ray.stages.merge import collect_final, merge_partials


@pytest.fixture(scope="module")
def ground_truth(transcripts_path):
    return exact_ground_truth(pq.read_table(transcripts_path))


@pytest.fixture(scope="module")
def results(ray_session, transcripts_path, tmp_path_factory):
    import ray.data as rd

    ds = rd.read_parquet(transcripts_path)
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    pipe = SketchPipeline(
        [
            SketchRequest("distinct_convs", "hll", hll.HLLSpec(m=1 << 14), on="conv_id"),
            SketchRequest("role_tool_card", "hll", hll.HLLSpec(m=1 << 12), on=composite_key("role", "tool")),
            SketchRequest("token_freq", "cms", cms.CMSSpec.from_error_rate(0.0005, 0.01), on=tokens_of("text")),
            SketchRequest("top_tools", "topk", topk.TopKSpec(k=10), on="tool"),
            SketchRequest("turnlen_quantiles", "tdigest", tdigest.TDigestSpec(100.0), on="turn_idx"),
            SketchRequest("conv_member", "bloom", bloom.BloomSpec.from_params(10_000, 1e-4), on="conv_id"),
        ],
        batch_size=4096,
        concurrency=3,
        checkpoint_dir=ckpt,
        salt_by="conv_id",
        salt_buckets=4,
    )
    res = pipe.run(ds)
    return res, ckpt, pipe


def test_hll_distinct_convs_within_bound(results, ground_truth):
    res, _, _ = results
    est = hll.count(res[("distinct_convs", "")].state)
    true = ground_truth["distinct_convs"]
    assert abs(est - true) / true <= 3 * 1.04 / math.sqrt(1 << 14)


def test_role_tool_cardinality(results, ground_truth):
    res, _, _ = results
    est = hll.count(res[("role_tool_card", "")].state)
    true = ground_truth["distinct_role_tool"]
    assert abs(est - true) <= max(3, 0.05 * true)


def test_cms_token_counts_match_exact(results, transcripts_path):
    import duckdb

    res, _, _ = results
    state = res[("token_freq", "")].state
    exact = duckdb.sql(
        f"""
        SELECT tok, count(*) c FROM (
          SELECT unnest(string_split(text, ' ')) tok
          FROM read_parquet('{transcripts_path}')
        ) GROUP BY tok ORDER BY c DESC LIMIT 20
        """
    ).fetchall()
    toks = [t for t, _ in exact]
    true = np.array([c for _, c in exact])
    est = cms.count(state, toks).astype(np.int64)
    # CMS overestimates only, and within eps*N of truth
    assert (est >= true).all()
    assert (est - true <= cms.count(state, ["___absent___"])[0] + state.spec.error_bound_eps() * state.all_sum + 1).all()


def test_topk_tools_exact_ranking(results, ground_truth):
    res, _, _ = results
    vals = topk.values(res[("top_tools", "")].state)
    # drop the "" non-tool bucket, compare against exact ranking prefix
    vals = [(e, c) for e, c in vals if e][:5]
    expected = ground_truth["tool_counts"][:5]
    assert [e for e, _ in vals] == [e for e, _ in expected]
    # counts are CMS estimates: overestimate-only, close at this scale
    for (e, c), (_, true_c) in zip(vals, expected):
        assert true_c <= c <= true_c * 1.2 + 5


def test_tdigest_quantiles(results, transcripts_path):
    res, _, _ = results
    state = res[("turnlen_quantiles", "")].state
    col = pq.read_table(transcripts_path, columns=["turn_idx"])["turn_idx"].to_numpy()
    for q in (0.25, 0.5, 0.9):
        est = float(tdigest.quantile(state, q)[0])
        srt = np.sort(col)
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.03


def test_bloom_membership_filter(results, ray_session, transcripts_path):
    import ray.data as rd

    res, _, _ = results
    blob = bloom.to_bytes(res[("conv_member", "")].state)
    ds = rd.read_parquet(transcripts_path, columns=["conv_id"])
    kept = filter_by_membership(ds, blob, "bloom", "conv_id", concurrency=2).count()
    assert kept == ds.count()  # every present conv_id passes (no false negatives)
    # guaranteed-absent keys are (almost) all rejected
    absent = rd.from_items([{"conv_id": f"absent-{i}"} for i in range(2000)])
    fp = filter_by_membership(absent, blob, "bloom", "conv_id", concurrency=2).count()
    assert fp <= 2


def test_checkpoint_resume_byte_identical(results, ray_session, transcripts_path):
    """Kill-and-resume: a second run from the checkpoint reproduces final
    sketches byte-for-byte (associativity + content-addressed lineage)."""
    res, ckpt, pipe = results
    from gostatix_ray.state import lineage as lin

    manifest = lin.load_manifest(ckpt)
    assert manifest and manifest["complete"]
    assert manifest["num_partials"] > 0
    import ray.data as rd

    res2 = pipe.run(rd.read_parquet(transcripts_path))  # resumes from checkpoint
    for key in res:
        if res[key].kind in ("bloom", "hll", "cms", "topk"):
            k = __import__("gostatix_ray.registry", fromlist=["kernel_for"]).kernel_for(res[key].kind)
            assert k.to_bytes(res[key].state) == k.to_bytes(res2[key].state), key


def test_grouped_sketches(ray_session, transcripts_path, ground_truth):
    import ray.data as rd

    ds = rd.read_parquet(transcripts_path, columns=["conv_id", "role"])
    partials = build_partials(
        ds,
        [SketchRequest("convs_by_role", "hll", hll.HLLSpec(m=1 << 12), on="conv_id", group_by="role")],
        batch_size=4096,
        concurrency=2,
    )
    final = collect_final(merge_partials(partials))
    keys = {gk for (_, gk) in final}
    assert keys == {"user", "assistant", "tool", "system"}
    est = hll.count(hll.from_bytes(final[("convs_by_role", "user")]))
    true = ground_truth["distinct_convs"]  # every conv starts with a user turn
    assert abs(est - true) / true < 0.1


def test_salted_equals_unsalted_byte_identical(ray_session, transcripts_path):
    """North rule at pipeline level: salted repartition (skew control)
    cannot change final sketch state — merge associativity makes the
    result partition-layout-invariant, byte for byte."""
    import ray.data as rd

    from gostatix_ray.registry import kernel_for

    reqs = [
        SketchRequest("convs", "hll", hll.HLLSpec(m=1 << 12), on="conv_id"),
        SketchRequest("toks", "cms", cms.CMSSpec(rows=3, columns=2048), on=tokens_of("text")),
    ]
    plain = SketchPipeline(reqs, batch_size=4096, concurrency=2).run(rd.read_parquet(transcripts_path))
    salted = SketchPipeline(
        reqs, batch_size=4096, concurrency=2, salt_by="conv_id", salt_buckets=6
    ).run(rd.read_parquet(transcripts_path))
    for key in plain:
        k = kernel_for(plain[key].kind)
        assert k.to_bytes(plain[key].state) == k.to_bytes(salted[key].state), key


def test_per_turn_text_equality_invariant(ray_session, transcripts_path):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering vs a direct reference scan."""
    import ray.data as rd

    ds = rd.read_parquet(transcripts_path, columns=["conv_id", "turn_idx", "text"])
    ours = ds.sort(["conv_id", "turn_idx"]).to_pandas()
    ref = (
        pq.read_table(transcripts_path, columns=["conv_id", "turn_idx", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert (ours["text"].values == ref["text"].values).all()


def test_fragment_ids_distinguish_slices():
    """Two different zero-copy slices of one parent array must get
    different fragment ids (they share buffers; hashing raw buffers
    collided and the merge-side dedupe then dropped real partials)."""
    from gostatix_ray.stages.build import _fragment_id

    parent = pa.array([f"v{i}" for i in range(1000)])
    a = parent.slice(0, 500)
    b = parent.slice(500, 500)
    assert _fragment_id(a, 500) != _fragment_id(b, 500)
    # identical content (retry) => identical id
    assert _fragment_id(a, 500) == _fragment_id(parent.slice(0, 500), 500)
    # numeric arrays too
    nums = pa.array(np.arange(1000))
    assert _fragment_id(nums.slice(0, 500), 500) != _fragment_id(nums.slice(500, 500), 500)


def test_middle_differing_blocks_get_distinct_fragments():
    """Blocks that differ ONLY in the middle (outside any sampled
    head/tail window) must get different builder-level fragments — in
    round 1 a content-hash collision here made the merge dedupe silently
    drop one block's partial (ADVICE, high).  Uniqueness now rests on
    the (task, seq) discriminator, which separates ANY two blocks."""
    from gostatix_ray.stages.build import SketchBuilder

    base = [f"padpadpad{i:08d}" for i in range(20000)]
    mid = list(base)
    mid[10000] = "DIFFERENT-MIDDLE"
    req = [SketchRequest("c", "cms", cms.CMSSpec(rows=2, columns=128), on="k")]
    builder = SketchBuilder(req)
    f1 = builder(pa.table({"k": pa.array(base)}))["fragment"].to_pylist()[0]
    f2 = builder(pa.table({"k": pa.array(mid)}))["fragment"].to_pylist()[0]
    assert f1 != f2


def test_identical_content_blocks_get_distinct_fragments():
    """Two legitimately identical-content input blocks (sorted /
    low-cardinality column at a fixed batch size) must contribute TWO
    partials, not be deduped into one: the builder mixes a (task, seq)
    discriminator into the fragment id (round-1 ADVICE, high)."""
    from gostatix_ray.stages.build import SketchBuilder

    req = [SketchRequest("c", "cms", cms.CMSSpec(rows=2, columns=128), on="k")]
    builder = SketchBuilder(req)
    batch = pa.table({"k": pa.array(["a"] * 100)})
    out1 = builder(batch)
    out2 = builder(batch)  # identical content, next block
    f1 = out1["fragment"].to_pylist()[0]
    f2 = out2["fragment"].to_pylist()[0]
    assert f1 != f2
    # and the merge keeps both (count doubles instead of being dropped)
    import pandas as pd

    from gostatix_ray.stages.merge import _merge_group

    df = pd.concat([out1.to_pandas(), out2.to_pandas()], ignore_index=True)
    merged = cms.from_bytes(
        __import__("gostatix_ray.stages.build", fromlist=["decompress_state"]).decompress_state(
            _merge_group(df)["state"].iloc[0]
        )
    )
    assert int(cms.count(merged, ["a"])[0]) == 200


def test_merge_dedupes_retried_fragments(ray_session):
    """A duplicated partial row (task retry artifact / checkpoint overlap)
    must contribute exactly once (content-addressed fragment dedupe)."""
    import ray.data as rd

    from gostatix_ray.stages.build import compress_state

    spec = cms.CMSSpec(rows=2, columns=256)
    s = cms.new(spec)
    cms.update(s, ["x", "x", "y"])
    row = {
        "sketch": "t", "kind": "cms", "group_key": "",
        "state": compress_state(cms.to_bytes(s)), "rows": 3,
        "fragment": "t::abc123", "checksum": "cc",
    }
    partials = rd.from_items([row, dict(row)])  # duplicated fragment
    final = collect_final(merge_partials(partials))
    merged = cms.from_bytes(final[("t", "")])
    assert list(cms.count(merged, ["x", "y"])) == [2, 1]  # not doubled
    assert merged.all_sum == 3


def test_streaming_merge_equals_materialized(ray_session, transcripts_path):
    """merge_partials_streaming (single lazy execution) produces the same
    final states as the materialized combiner tree."""
    import ray.data as rd

    from gostatix_ray.stages.merge import merge_partials_streaming

    ds = rd.read_parquet(transcripts_path, columns=["conv_id"])
    req = [SketchRequest("c", "hll", hll.HLLSpec(m=1 << 10), on="conv_id")]
    a = collect_final(merge_partials(build_partials(ds, req, batch_size=4096, concurrency=2)))
    b = collect_final(merge_partials_streaming(build_partials(ds, req, batch_size=4096, concurrency=2)))
    assert a[("c", "")] == b[("c", "")]
