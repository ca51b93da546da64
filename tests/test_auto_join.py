"""Sketch-guided join planner (stages/joins.py: join_profile /
broadcast_hash_join / auto_join): every physical plan must produce the
identical output SET, and the planner must pick the documented strategy
for each input shape."""

import numpy as np
import pandas as pd
import pyarrow as pa

from gostatix_ray.stages.joins import (
    auto_join,
    broadcast_hash_join,
    hash_join,
    join_profile,
)


def _frame_set(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    rows = df[cols].astype(object).where(df[cols].notna(), None).values.tolist()
    # None-safe ordering: nulls sort after values within each column
    return sorted(
        map(tuple, rows),
        key=lambda t: tuple((v is None, v if v is not None else 0) for v in t),
    )


def _mk(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 40, size=500).tolist()
    left = rd.from_items(
        [{"k": int(k), "v": float(i)} for i, k in enumerate(lk)]
    ).repartition(4)
    rk = [int(x) for x in rng.integers(0, 50, size=120)]
    right = rd.from_items(
        [{"rk": k, "name": f"n{k}"} for k in rk]
    ).repartition(3)
    return left, right


def test_join_profile_counts(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"k": i % 10} for i in range(1000)]).repartition(4)
    prof = join_profile(ds, "k")
    assert prof["rows"] == 1000
    assert abs(prof["distinct"] - 10) <= 2
    # every key holds exactly 10% of the rows -> all hot at 5%
    hot = [h for h, frac in prof["hot"] if frac >= 0.05]
    assert sorted(int(h) for h in hot) == list(range(10))


def test_broadcast_hash_join_matches_shuffle(ray_session):
    left, right = _mk(ray_session)
    import ray

    tbl = pa.concat_tables(ray.get(right.to_arrow_refs()))
    for how in ("inner", "left"):
        b = broadcast_hash_join(
            left, tbl, key="k", right_key="rk",
            left_cols={"v": "v"}, right_cols={"name": "name"}, how=how,
        ).to_pandas()
        s = hash_join(
            left, right, key="k", right_key="rk",
            left_cols={"v": "v"}, right_cols={"name": "name"}, how=how,
        ).to_pandas()
        assert _frame_set(b) == _frame_set(s), how
    for how in ("semi", "anti"):
        b = broadcast_hash_join(left, tbl, key="k", right_key="rk",
                                left_cols={"v": "v"}, right_cols={}, how=how).to_pandas()
        s = hash_join(left, right, key="k", right_key="rk",
                      left_cols={"v": "v"}, right_cols={}, how=how).to_pandas()
        assert _frame_set(b) == _frame_set(s), how


def test_broadcast_hash_join_nulls_and_dups(ray_session):
    import ray.data as rd

    left = rd.from_items(
        [{"k": 1, "v": 1.0}, {"k": 1, "v": 2.0}, {"k": None, "v": 3.0}, {"k": 9, "v": 4.0}]
    )
    tbl = pa.table({"rk": pa.array([1, 1, 1, None], pa.int64()),
                    "name": ["a", "b", "c", "z"]})
    inner = broadcast_hash_join(left, tbl, key="k", right_key="rk",
                                left_cols={"v": "v"}, right_cols={"name": "name"}).to_pandas()
    # m×n multiplicity: 2 left rows × 3 build rows; NULL keys never match
    assert len(inner) == 6
    assert set(inner["name"]) == {"a", "b", "c"}
    lj = broadcast_hash_join(left, tbl, key="k", right_key="rk",
                             left_cols={"v": "v"}, right_cols={"name": "name"},
                             how="left").to_pandas()
    assert len(lj) == 8  # 6 matches + NULL-key row + k=9 miss
    assert lj[lj["v"] == 3.0]["name"].isna().all()
    assert lj[lj["v"] == 4.0]["name"].isna().all()


def test_auto_join_picks_broadcast_and_matches(ray_session):
    left, right = _mk(ray_session)
    out, plan = auto_join(
        left, right, key="k", right_key="rk",
        left_cols={"v": "v"}, right_cols={"name": "name"}, explain=True,
    )
    assert plan["strategy"] == "broadcast"
    assert plan["right_rows"] == 120
    ref = hash_join(left, right, key="k", right_key="rk",
                    left_cols={"v": "v"}, right_cols={"name": "name"}).to_pandas()
    assert _frame_set(out.to_pandas()) == _frame_set(ref)


def test_auto_join_picks_shuffle_and_salted(ray_session):
    import ray.data as rd

    left, right = _mk(ray_session)
    # force the shuffle path: tiny broadcast threshold, no skew
    out, plan = auto_join(
        left, right, key="k", right_key="rk",
        left_cols={"v": "v"}, right_cols={"name": "name"},
        broadcast_threshold=10, skew_frac=0.5, explain=True,
    )
    assert plan["strategy"] == "shuffle"
    assert plan["left_rows"] == 500 and plan["hot_keys"] == []
    ref = hash_join(left, right, key="k", right_key="rk",
                    left_cols={"v": "v"}, right_cols={"name": "name"}).to_pandas()
    assert _frame_set(out.to_pandas()) == _frame_set(ref)

    # zipf-hot key 0 on the probe side -> salted plan, identical output
    skew_left = rd.from_items(
        [{"k": 0 if i % 2 == 0 else int(i % 37), "v": float(i)} for i in range(600)]
    ).repartition(4)
    out2, plan2 = auto_join(
        skew_left, right, key="k", right_key="rk",
        left_cols={"v": "v"}, right_cols={"name": "name"},
        broadcast_threshold=10, skew_frac=0.2, explain=True,
    )
    assert plan2["strategy"] == "salted"
    assert "0" in plan2["hot_keys"]
    ref2 = hash_join(skew_left, right, key="k", right_key="rk",
                     left_cols={"v": "v"}, right_cols={"name": "name"}).to_pandas()
    assert _frame_set(out2.to_pandas()) == _frame_set(ref2)


def test_auto_join_outer_routes_to_shuffle(ray_session):
    left, right = _mk(ray_session)
    out, plan = auto_join(
        left, right, key="k", right_key="rk",
        left_cols={"v": "v"}, right_cols={"name": "name"},
        how="outer", explain=True,
    )
    assert plan["strategy"] == "shuffle"
    ref = hash_join(left, right, key="k", right_key="rk",
                    left_cols={"v": "v"}, right_cols={"name": "name"},
                    how="outer").to_pandas()
    assert _frame_set(out.to_pandas()) == _frame_set(ref)


def test_broadcast_hash_join_empty_build(ray_session):
    import ray.data as rd

    left = rd.from_items([{"k": 1, "v": 1.0}, {"k": 2, "v": 2.0}])
    tbl = pa.table({"rk": pa.array([], pa.int64()), "name": pa.array([], pa.string())})
    inner = broadcast_hash_join(left, tbl, key="k", right_key="rk",
                                left_cols={"v": "v"}, right_cols={"name": "name"}).to_pandas()
    assert len(inner) == 0
    lj = broadcast_hash_join(left, tbl, key="k", right_key="rk",
                             left_cols={"v": "v"}, right_cols={"name": "name"},
                             how="left").to_pandas()
    assert len(lj) == 2 and lj["name"].isna().all()


def test_auto_join_bloom_runtime_filter(ray_session):
    import ray.data as rd

    # selective build side: 20 distinct right keys vs 1000 distinct left
    left = rd.from_items(
        [{"k": i, "v": float(i)} for i in range(1000)]
    ).repartition(4)
    right = rd.from_items(
        [{"rk": int(i % 20), "name": f"n{i % 20}"} for i in range(300)]
    ).repartition(3)
    # default probe floor (8M rows) declines to prune a 1000-row probe
    _, plan_floor = auto_join(
        left, right, key="k", right_key="rk",
        left_cols={"v": "v"}, right_cols={"name": "name"},
        broadcast_threshold=10, explain=True,
    )
    assert plan_floor["bloom_prune"] is None
    out, plan = auto_join(
        left, right, key="k", right_key="rk",
        left_cols={"v": "v"}, right_cols={"name": "name"},
        broadcast_threshold=10, bloom_min_probe_rows=0, explain=True,
    )
    assert plan["strategy"] == "shuffle"
    assert plan["bloom_prune"] is not None and plan["bloom_prune"]["num_items"] >= 1024
    ref = hash_join(left, right, key="k", right_key="rk",
                    left_cols={"v": "v"}, right_cols={"name": "name"}).to_pandas()
    got = out.to_pandas()
    assert len(got) == 20 * 15  # 20 matched keys x 15 dup build rows each
    assert _frame_set(got) == _frame_set(ref)

    # semi may prune; anti must NOT (misses are the output)
    semi, plan_s = auto_join(left, right, key="k", right_key="rk",
                             left_cols={"v": "v"}, right_cols={}, how="semi",
                             broadcast_threshold=10, bloom_min_probe_rows=0,
                             explain=True)
    assert plan_s["bloom_prune"] is not None
    assert sorted(semi.to_pandas()["k"]) == list(range(20))
    anti, plan_a = auto_join(left, right, key="k", right_key="rk",
                             left_cols={"v": "v"}, right_cols={}, how="anti",
                             broadcast_threshold=10, bloom_min_probe_rows=0,
                             explain=True)
    assert plan_a["bloom_prune"] is None
    assert sorted(anti.to_pandas()["k"]) == list(range(20, 1000))


def test_estimate_join_size(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.joins import estimate_join_size

    left = rd.from_items([{"k": i % 25} for i in range(500)]).repartition(3)
    right = rd.from_items([{"k": i % 50} for i in range(200)]).repartition(2)
    lp = join_profile(left, "k")
    rp = join_profile(right, "k")
    exact = 25 * 20 * 4  # matched keys 0..24, 20 left x 4 right rows each
    est = estimate_join_size(lp, rp)
    assert est >= exact  # CMS inner product never underestimates
    assert est <= exact + 2 * 0.0005 * 500 * 200  # within the eps*|L|*|R| bound

    # auto_join surfaces it on the shuffle path
    out, plan = auto_join(left, right, key="k",
                          left_cols={}, right_cols={},
                          broadcast_threshold=10, explain=True)
    assert plan["est_output_rows"] >= exact
    assert len(out.to_pandas()) == exact


def test_auto_join_bloom_mixed_key_types(ray_session):
    """Regression: the runtime filter must be built from the PROBE key's
    representation.  decimal build keys stringify as '1.00' but the join
    casts them to the probe's int64 ('1') before matching — an
    unnormalized bloom would hash-miss every true match and silently
    drop all output rows."""
    from decimal import Decimal

    import ray.data as rd

    left = rd.from_items([{"k": i, "v": float(i)} for i in range(100)]).repartition(2)
    tbl = pa.table({
        "rk": pa.array([Decimal(f"{i}.00") for i in range(10)], pa.decimal128(10, 2)),
        "name": [f"n{i}" for i in range(10)],
    })
    right = rd.from_arrow(tbl)
    out, plan = auto_join(left, right, key="k", right_key="rk",
                          left_cols={"v": "v"}, right_cols={"name": "name"},
                          broadcast_threshold=1, bloom_min_probe_rows=0, explain=True)
    assert plan["strategy"] == "shuffle" and plan["bloom_prune"] is not None
    got = out.to_pandas()
    assert len(got) == 10 and sorted(got["k"]) == list(range(10))
    # the CMS join-size estimate also sketches the normalized form
    assert plan["est_output_rows"] >= 10


def test_auto_join_randomized_parity(ray_session):
    """Randomized parity sweep: across varied shapes (null fractions,
    dup rates, skew, key-domain overlap) every planner path must equal
    hash_join's output set for every how it supports."""
    import ray.data as rd

    rng = np.random.default_rng(42)
    for trial in range(4):
        n_l = int(rng.integers(50, 400))
        n_r = int(rng.integers(20, 200))
        dom = int(rng.integers(5, 60))
        lk = rng.integers(0, dom, n_l).astype(object)
        rk = rng.integers(0, dom + 10, n_r).astype(object)
        # inject nulls on both sides
        lk[rng.random(n_l) < 0.1] = None
        rk[rng.random(n_r) < 0.1] = None
        left = rd.from_items(
            [{"k": (int(k) if k is not None else None), "v": float(i)}
             for i, k in enumerate(lk)]).repartition(3)
        right = rd.from_items(
            [{"rk": (int(k) if k is not None else None), "p": i}
             for i, k in enumerate(rk)]).repartition(2)
        for how in ("inner", "left", "semi", "anti"):
            rcols = {} if how in ("semi", "anti") else {"p": "p"}
            ref = hash_join(left, right, key="k", right_key="rk",
                            left_cols={"v": "v"}, right_cols=rcols,
                            how=how).to_pandas()
            # broadcast plan
            got_b = auto_join(left, right, key="k", right_key="rk",
                              left_cols={"v": "v"}, right_cols=rcols, how=how,
                              broadcast_threshold=10**6).to_pandas()
            assert _frame_set(got_b) == _frame_set(ref), (trial, how, "broadcast")
            # shuffle plan with the bloom prune forced on
            got_s = auto_join(left, right, key="k", right_key="rk",
                              left_cols={"v": "v"}, right_cols=rcols, how=how,
                              broadcast_threshold=0, bloom_min_probe_rows=0,
                              bloom_ratio=10.0).to_pandas()
            assert _frame_set(got_s) == _frame_set(ref), (trial, how, "shuffle")


def test_auto_join_cached_profiles(ray_session):
    """Precomputed profiles skip the profile scans and produce the
    identical plan and output."""
    left, right = _mk(ray_session)
    rp = join_profile(right, "rk")
    lp = join_profile(left, "k")
    out, plan = auto_join(left, right, key="k", right_key="rk",
                          left_cols={"v": "v"}, right_cols={"name": "name"},
                          broadcast_threshold=10, skew_frac=0.5,
                          left_profile=lp, right_profile=rp, explain=True)
    assert plan["strategy"] == "shuffle" and plan["right_rows"] == rp["rows"]
    ref = hash_join(left, right, key="k", right_key="rk",
                    left_cols={"v": "v"}, right_cols={"name": "name"}).to_pandas()
    assert _frame_set(out.to_pandas()) == _frame_set(ref)
