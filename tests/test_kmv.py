"""KMV bottom-k sketch: exactness below k, estimator bound, set algebra,
byte-stable merge laws, serialization, builder e2e (kernels/kmv.py)."""

import numpy as np
import pytest

from gostatix_ray.kernels import kmv


def _sketch(keys, k=1024):
    s = kmv.new(kmv.KMVSpec(k=k))
    kmv.update(s, [str(x) for x in keys])
    return s


def test_exact_below_k():
    keys = [f"u{i}" for i in range(500)] * 3  # duplicates collapse
    s = _sketch(keys, k=1024)
    assert kmv.estimate(s) == 500.0
    assert kmv._threshold(s) is None


def test_estimate_bound_saturated():
    n, k = 200_000, 1024
    s = _sketch(range(n), k=k)
    rse = kmv.KMVSpec(k=k).relative_standard_error()
    assert abs(kmv.estimate(s) - n) <= 4 * rse * n  # ~12.5%


def test_merge_byte_stable_any_partitioning():
    keys = [f"key-{i % 3000:06d}" for i in range(10_000)]
    ref = kmv.to_bytes(_sketch(keys, k=256))
    rng = np.random.default_rng(13)
    for nparts in (1, 2, 7, 16):
        perm = rng.permutation(len(keys))
        parts = np.array_split(perm, nparts)
        states = [_sketch([keys[i] for i in p], k=256) for p in parts]
        order = rng.permutation(nparts)
        merged = states[order[0]]
        for j in order[1:]:
            merged = kmv.merge(merged, states[j])
        assert kmv.to_bytes(merged) == ref, nparts


def test_merge_idempotent_and_spec_guard():
    s = _sketch(range(100), k=64)
    assert kmv.equals(kmv.merge(s, s), s)
    with pytest.raises(ValueError):
        kmv.merge(s, _sketch(range(10), k=128))


def test_set_algebra_exact_when_unsaturated():
    a = _sketch(range(0, 600), k=1024)
    b = _sketch(range(400, 1000), k=1024)
    assert kmv.union_count(a, b) == 1000.0
    assert kmv.intersection_count(a, b) == 200.0
    assert kmv.difference_count(a, b) == 400.0
    assert kmv.jaccard(a, b) == 200.0 / 1000.0


def test_set_algebra_bound_saturated():
    """50k-element sets with 10k overlap, k=2048: the sample-overlap
    estimator errs ~1/sqrt(k) of the UNION (not of the intersection) —
    the property HLL inclusion-exclusion lacks."""
    k = 2048
    a = _sketch(range(0, 50_000), k=k)
    b = _sketch(range(40_000, 90_000), k=k)
    union, inter = 90_000, 10_000
    tol = 4 * union / np.sqrt(k - 2)
    assert abs(kmv.union_count(a, b) - union) <= tol
    assert abs(kmv.intersection_count(a, b) - inter) <= tol
    assert abs(kmv.difference_count(a, b) - 40_000) <= tol


def test_self_intersection_consistent_when_saturated():
    """A∩A must equal the cardinality estimator exactly — the strict-below
    threshold convention (float round-trips would bias +1/k)."""
    s = _sketch(range(100_000), k=1024)
    assert kmv.intersection_count(s, s) == kmv.estimate(s)
    assert kmv.union_count(s, s) == kmv.estimate(s)
    assert kmv.difference_count(s, s) == 0.0
    assert kmv.jaccard(s, s) == 1.0


def test_serialization_round_trip():
    for keys in ([], range(10), range(5000)):
        s = _sketch(keys, k=256)
        r = kmv.from_bytes(kmv.to_bytes(s))
        assert kmv.equals(s, r)
        assert kmv.estimate(r) == kmv.estimate(s)


def test_spec_validation():
    with pytest.raises(ValueError):
        kmv.KMVSpec(k=4)


def test_builder_e2e_grouped(ray_session):
    """Engine path: grouped KMV over events at sf0.001 — unsaturated, so
    every per-type estimate equals the exact distinct count."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from gostatix_ray.sources.pq_read import clean_read_parquet
    from gostatix_ray.stages.build import SketchRequest, build_partials
    from gostatix_ray.stages.merge import collect_final, merge_partials_streaming

    sf = "/root/testdata/sf0.001"
    ds = clean_read_parquet(sf + "/events.parquet", columns=["user_id", "event_type"])
    partials = build_partials(
        ds,
        [SketchRequest("u", "kmv", kmv.KMVSpec(k=1024),
                       on=lambda b: pc.cast(b["user_id"], pa.string()),
                       group_by="event_type")],
        concurrency=4,
    )
    final = collect_final(merge_partials_streaming(partials))
    got = {gk: kmv.estimate(kmv.from_bytes(blob)) for (_, gk), blob in final.items()}
    df = pd.read_parquet(sf + "/events.parquet", columns=["user_id", "event_type"])
    exact = df.groupby("event_type")["user_id"].nunique()
    assert got == {et: float(n) for et, n in exact.items()}


def test_catalog_kmv_query(ray_session):
    """Rows-only catalog entry is exact at sf0.001 (all sets below k)."""
    import pandas as pd

    from gostatix_ray.pipelines.catalog import q_kmv_users_set_algebra

    sf = "/root/testdata/sf0.001"
    got = q_kmv_users_set_algebra(sf).set_index("set_expr")["users_est"]
    df = pd.read_parquet(sf + "/events.parquet", columns=["user_id", "event_type"])
    click = set(df.loc[df.event_type == "click", "user_id"])
    signup = set(df.loc[df.event_type == "signup", "user_id"])
    assert got["click"] == len(click)
    assert got["signup"] == len(signup)
    assert got["union"] == len(click | signup)
    assert got["intersection"] == len(click & signup)
    assert got["click_only"] == len(click - signup)
