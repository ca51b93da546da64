"""Relational operators Ray Data lacks natively: as-of join
(stages/asof.py), grouped top-k ranking (stages/rank.py), broadcast
interval/range join (stages/joins.py:interval_join), and benchmark
decontamination n-gram machinery (stages/text_stats.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from gostatix_ray.stages.asof import asof_join
from gostatix_ray.stages.joins import interval_join
from gostatix_ray.stages.rank import grouped_topk
from gostatix_ray.stages.text_stats import doc_ngrams


def _events(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_asof_backward_basic(ray_session):
    left = _events(
        [
            {"k": 1, "t": 10, "lid": 100},
            {"k": 1, "t": 25, "lid": 101},
            {"k": 2, "t": 5, "lid": 102},
        ]
    )
    right = _events(
        [
            {"k": 1, "t": 10, "rid": 7, "val": 1.5},
            {"k": 1, "t": 20, "rid": 8, "val": 2.5},
            {"k": 2, "t": 9, "rid": 9, "val": 3.5},
        ]
    )
    out = (
        asof_join(
            left,
            right,
            key="k",
            on="t",
            left_cols={"lid": "lid"},
            right_cols={"rid": "rid", "val": "val"},
            tiebreak="rid",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # lid=100 matches at-or-before t=10 -> rid 7; lid=101 -> rid 8 (t=20);
    # lid=102 at t=5 has no right row <= 5 -> null.
    assert list(out["lid"]) == [100, 101, 102]
    assert out["rid"][0] == 7 and out["rid"][1] == 8
    assert pd.isna(out["rid"][2]) and pd.isna(out["val"][2])
    assert out["val"][1] == 2.5


def test_asof_tiebreak_and_forward(ray_session):
    left = _events([{"k": 1, "t": 10, "lid": 1}])
    # two right rows at the SAME (k, t): max tiebreak must win.
    right = _events(
        [
            {"k": 1, "t": 10, "rid": 3},
            {"k": 1, "t": 10, "rid": 5},
            {"k": 1, "t": 30, "rid": 9},
        ]
    )
    back = asof_join(
        left, right, key="k", on="t",
        left_cols={"lid": "lid"}, right_cols={"rid": "rid"}, tiebreak="rid",
    ).to_pandas()
    assert list(back["rid"]) == [5]
    fwd = asof_join(
        left, right, key="k", on="t",
        left_cols={"lid": "lid"}, right_cols={"rid": "rid"}, tiebreak="rid",
        direction="forward",
    ).to_pandas()
    # at-or-after t=10: rows at t=10 qualify; among ties max rid wins.
    assert list(fwd["rid"]) == [5]


def test_asof_matches_pandas_merge_asof(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    left_df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_l),
            "t": rng.integers(0, 1000, n_l),
            "lid": np.arange(n_l),
        }
    )
    right_df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_r),
            "t": rng.integers(0, 1000, n_r),
            "rid": np.arange(n_r),
        }
    )
    # make (k, t) unique on the right so merge_asof semantics are
    # deterministic without a tiebreak
    right_df = right_df.drop_duplicates(["k", "t"]).reset_index(drop=True)
    import ray.data as rd

    out = (
        asof_join(
            rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(5),
            rd.from_arrow(pa.Table.from_pandas(right_df)).repartition(3),
            key="k",
            on="t",
            left_cols={"lid": "lid"},
            right_cols={"rid": "rid"},
            tiebreak="rid",
            num_buckets=8,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left_df.sort_values("t", kind="stable"),
        right_df.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    assert list(out["lid"]) == list(exp["lid"])
    ours = out["rid"].astype("float64").to_numpy()
    theirs = exp["rid"].astype("float64").to_numpy()
    assert ((ours == theirs) | (np.isnan(ours) & np.isnan(theirs))).all()


def test_grouped_topk_ranks(ray_session):
    rows = []
    for g in range(5):
        for i in range(10):
            rows.append({"g": g, "uid": g * 100 + i, "score": float((i * 7) % 10)})
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = (
        grouped_topk(
            ds, group_col="g", order_col="score", tiebreak="uid", k=3,
            descending=True, num_buckets=4,
        )
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    assert len(out) == 15
    exp = (
        pd.DataFrame(rows)
        .sort_values(["g", "score", "uid"], ascending=[True, False, True], kind="stable")
        .groupby("g")
        .head(3)
    )
    exp["rank"] = exp.groupby("g").cumcount() + 1
    exp = exp.sort_values(["g", "rank"]).reset_index(drop=True)
    assert list(out["uid"]) == list(exp["uid"])
    assert list(out["rank"]) == list(exp["rank"])


def test_grouped_topk_small_groups(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"g": [1, 1, 2], "uid": [1, 2, 3], "score": [5.0, 4.0, 1.0]})
    )
    out = (
        grouped_topk(ds, group_col="g", order_col="score", tiebreak="uid", k=5)
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    # groups smaller than k emit all their rows
    assert list(out["uid"]) == [1, 2, 3]
    assert list(out["rank"]) == [1, 2, 1]


def test_interval_join_overlapping(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"v": [5.0, 15.0, 25.0, 99.0]}))
    iv = pa.table(
        {
            "band": ["low", "mid", "wide"],
            "lo": [0.0, 10.0, 0.0],
            "hi": [10.0, 20.0, 30.0],
        }
    )
    out = interval_join(ds, iv, value_col="v", columns=["band"]).to_pandas()
    got = sorted(zip(out["v"], out["band"]))
    # v=5 in low+wide, v=15 in mid+wide, v=25 in wide, v=99 nowhere
    assert got == [(5.0, "low"), (5.0, "wide"), (15.0, "mid"), (15.0, "wide"), (25.0, "wide")]


def test_doc_ngrams_vectorized():
    texts = pa.array(["a b c d", "x y", "", "p q r"])
    grams, doc_idx = doc_ngrams(texts, 3)
    pairs = sorted(zip(doc_idx.tolist(), grams.to_pylist()))
    # doc 0: two 3-grams; doc 1 (2 toks < 3): whole text; doc 2 empty:
    # splits to [''] (1 token < 3) -> whole text, matching the SQL twin;
    # doc 3: one 3-gram.
    assert pairs == [(0, "a b c"), (0, "b c d"), (1, "x y"), (2, ""), (3, "p q r")]


# ---------------------------------------------------------------------------
# hash_join (BIG ⨝ BIG shuffle join)
# ---------------------------------------------------------------------------

def _hj_reference(ldf, rdf, *, how, right_key="k"):
    m = ldf.merge(rdf.rename(columns={right_key: "k"}), on="k", how=how)
    return m.sort_values(list(m.columns), kind="stable").reset_index(drop=True)


def test_hash_join_inner_duplicates_and_blocks(ray_session):
    from gostatix_ray.stages.joins import hash_join

    rng = np.random.default_rng(7)
    ldf = pd.DataFrame({"k": rng.integers(0, 50, 400), "lv": np.arange(400)})
    rdf = pd.DataFrame({"rk": rng.integers(0, 60, 120), "rv": np.arange(120) * 10})
    import ray.data as rd

    left = rd.from_pandas(ldf).repartition(7)
    right = rd.from_pandas(rdf).repartition(3)
    out = hash_join(
        left, right, key="k", right_key="rk",
        left_cols={"lv": "lv"}, right_cols={"rv": "rv"}, num_buckets=16,
    ).to_pandas()
    got = out[["k", "lv", "rv"]].sort_values(["k", "lv", "rv"], kind="stable").reset_index(drop=True)
    exp = _hj_reference(ldf, rdf.rename(columns={"rk": "k"}), how="inner")[["k", "lv", "rv"]]
    exp = exp.sort_values(["k", "lv", "rv"], kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # duplicate keys must give the full m×n multiplicity — compare sizes
    assert len(got) == len(exp) and len(got) > len(ldf) * 0  # non-trivial


def test_hash_join_left_nulls_and_string_keys(ray_session):
    from gostatix_ray.stages.joins import hash_join

    import ray.data as rd

    ldf = pd.DataFrame({"k": ["a", "b", "c", "c", "zz"], "lv": [1, 2, 3, 4, 5]})
    rdf = pd.DataFrame({"k": ["a", "c", "c"], "rv": [10, 30, 31]})
    out = hash_join(
        rd.from_pandas(ldf).repartition(3),
        rd.from_pandas(rdf).repartition(2),
        key="k", left_cols={"lv": "lv"}, right_cols={"rv": "rv"},
        how="left", num_buckets=8,
    ).to_pandas()
    got = out.sort_values(["k", "lv", "rv"], kind="stable", na_position="last").reset_index(drop=True)
    exp = ldf.merge(rdf, on="k", how="left").sort_values(
        ["k", "lv", "rv"], kind="stable", na_position="last"
    ).reset_index(drop=True)
    assert list(got["k"]) == list(exp["k"]) and list(got["lv"]) == list(exp["lv"])
    assert got["rv"].isna().sum() == 2  # b and zz unmatched
    assert list(got["rv"].dropna().astype(int)) == list(exp["rv"].dropna().astype(int))


def test_hash_join_partition_independence(ray_session):
    """Output SET is identical for any block layout of either side."""
    from gostatix_ray.stages.joins import hash_join

    import ray.data as rd

    rng = np.random.default_rng(11)
    ldf = pd.DataFrame({"k": rng.integers(0, 9, 100), "lv": np.arange(100)})
    rdf = pd.DataFrame({"k": rng.integers(0, 9, 40), "rv": np.arange(40)})
    outs = []
    for lp, rp in [(1, 1), (5, 4), (13, 2)]:
        out = hash_join(
            rd.from_pandas(ldf).repartition(lp),
            rd.from_pandas(rdf).repartition(rp),
            key="k", left_cols={"lv": "lv"}, right_cols={"rv": "rv"}, num_buckets=4,
        ).to_pandas().sort_values(["k", "lv", "rv"], kind="stable").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1], check_dtype=False)
    pd.testing.assert_frame_equal(outs[0], outs[2], check_dtype=False)


def test_global_topn_deterministic_across_partitionings(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.rank import global_topn

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=300).astype(float)  # heavy ties
    tbl = pa.table({"id": np.arange(300, dtype=np.int64), "v": vals})
    expect = (
        pd.DataFrame({"id": np.arange(300), "v": vals})
        .sort_values(["v", "id"], ascending=[False, True], kind="stable")
        .head(10)
        .reset_index(drop=True)
    )
    for nblocks in (1, 4, 17):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = (
            global_topn(ds, order_col="v", tiebreak="id", n=10)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        assert list(out["id"]) == list(expect["id"])
        assert list(out["v"]) == list(expect["v"])
        assert list(out["rank"]) == list(range(1, 11))


def test_global_topn_string_tiebreak_and_small_input(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.rank import global_topn

    tbl = pa.table({"tok": ["b", "a", "c"], "df": [5, 5, 2]})
    out = (
        global_topn(rd.from_arrow(tbl), order_col="df", tiebreak="tok", n=10)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    # n larger than input: all rows, ties broken by token ascending
    assert list(out["tok"]) == ["a", "b", "c"]
    assert list(out["rank"]) == [1, 2, 3]


def test_global_topn_funnel_width_same_result(ray_session):
    """2-level funnel (for very wide inputs) == single-funnel top-n."""
    import ray.data as rd

    from gostatix_ray.stages.rank import global_topn

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 40, size=500).astype(float)  # heavy ties
    tbl = pa.table({"id": np.arange(500, dtype=np.int64), "v": vals})
    ds = rd.from_arrow(tbl).repartition(23)
    base = global_topn(ds, order_col="v", tiebreak="id", n=12).to_pandas()
    funneled = global_topn(
        rd.from_arrow(tbl).repartition(23), order_col="v", tiebreak="id",
        n=12, funnel_width=4,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        base.sort_values("rank").reset_index(drop=True),
        funneled.sort_values("rank").reset_index(drop=True),
        check_dtype=False,
    )


def test_asof_nearest_and_tolerance_match_pandas(ray_session):
    """direction='nearest' and tolerance vs pandas merge_asof on random
    data with dup keys (unique (k, t) on the right)."""
    import ray.data as rd

    rng = np.random.default_rng(13)
    n_l, n_r = 300, 120
    left_df = pd.DataFrame({
        "k": rng.integers(0, 9, n_l),
        "t": rng.integers(0, 500, n_l),
        "lid": np.arange(n_l),
    })
    right_df = pd.DataFrame({
        "k": rng.integers(0, 9, n_r),
        "t": rng.integers(0, 500, n_r),
        "rid": np.arange(n_r),
    }).drop_duplicates(["k", "t"]).reset_index(drop=True)

    for direction, tol in (("nearest", None), ("nearest", 25),
                           ("backward", 25), ("forward", 25)):
        out = (
            asof_join(
                rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(4),
                rd.from_arrow(pa.Table.from_pandas(right_df)).repartition(3),
                key="k", on="t",
                left_cols={"lid": "lid"}, right_cols={"rid": "rid"},
                tiebreak="rid", direction=direction, tolerance=tol,
                num_buckets=8,
            )
            .to_pandas().sort_values("lid").reset_index(drop=True)
        )
        exp = pd.merge_asof(
            left_df.sort_values("t", kind="stable"),
            right_df.sort_values("t", kind="stable"),
            on="t", by="k", direction=direction,
            **({"tolerance": tol} if tol is not None else {}),
        ).sort_values("lid").reset_index(drop=True)
        ours = out["rid"].astype("float64").to_numpy()
        theirs = exp["rid"].astype("float64").to_numpy()
        assert ((ours == theirs) | (np.isnan(ours) & np.isnan(theirs))).all(), \
            (direction, tol)


def test_asof_nearest_forward_tiebreak_greatest(ray_session):
    """When nearest selects the forward side and several right rows
    share (key, on), the GREATEST tiebreak must win — the same
    documented contract as backward/forward."""
    left = _events([{"k": 1, "t": 14, "lid": 1}])
    right = _events([
        {"k": 1, "t": 20, "rid": 1, "val": 1.0},  # forward, dist 6
        {"k": 1, "t": 20, "rid": 2, "val": 2.0},  # forward, dist 6
        {"k": 1, "t": 1, "rid": 0, "val": 0.5},   # backward, dist 13
    ])
    out = asof_join(left, right, key="k", on="t",
                    left_cols={"lid": "lid"}, right_cols={"rid": "rid"},
                    tiebreak="rid", direction="nearest").to_pandas()
    assert list(out["rid"]) == [2]
    fwd = asof_join(left, right, key="k", on="t",
                    left_cols={"lid": "lid"}, right_cols={"rid": "rid"},
                    tiebreak="rid", direction="forward").to_pandas()
    assert list(fwd["rid"]) == [2]
