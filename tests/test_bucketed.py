"""Bucketed layout + shuffle-free co-located joins (stages/bucketed.py):
equivalence with the shuffle hash join, all four modes, layout guard."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gostatix_ray.stages.bucketed import colocated_join, read_layout, write_bucketed


@pytest.fixture(scope="module")
def layouts(ray_session, tmp_path_factory):
    import ray.data as rd

    tmp = str(tmp_path_factory.mktemp("buckets"))
    rng = np.random.default_rng(11)
    # duplicate keys on both sides -> m×n expansion must be exact
    lkeys = rng.integers(0, 40, size=500)
    rkeys = rng.integers(20, 60, size=300)
    left = pa.table({"k": lkeys.astype(np.int64),
                     "lv": np.arange(500, dtype=np.int64)})
    right = pa.table({"rk": rkeys.astype(np.int64),
                      "rv": (np.arange(300) * 10).astype(np.int64)})
    ldir = os.path.join(tmp, "left")
    rdir = os.path.join(tmp, "right")
    write_bucketed(rd.from_arrow(left).repartition(5), ldir, key="k", num_buckets=8)
    write_bucketed(rd.from_arrow(right).repartition(3), rdir, key="rk", num_buckets=8)
    lpd = left.to_pandas()
    rpd = right.to_pandas()
    return ldir, rdir, lpd, rpd


def test_colocated_inner_matches_pandas(ray_session, layouts):
    ldir, rdir, lpd, rpd = layouts
    out = colocated_join(ldir, rdir, left_cols={"lv": "lv"},
                         right_cols={"rv": "rv"}).to_pandas()
    want = lpd.merge(rpd, left_on="k", right_on="rk")[["k", "lv", "rv"]]
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]].to_numpy()))
    assert key(out) == key(want)


def test_colocated_left_semi_anti(ray_session, layouts):
    ldir, rdir, lpd, rpd = layouts
    left_out = colocated_join(ldir, rdir, left_cols={"lv": "lv"},
                              right_cols={"rv": "rv"}, how="left").to_pandas()
    want = lpd.merge(rpd, left_on="k", right_on="rk", how="left")
    assert len(left_out) == len(want)
    assert int(left_out["rv"].isna().sum()) == int(want["rv"].isna().sum())

    semi = colocated_join(ldir, rdir, left_cols={"lv": "lv"},
                          right_cols={}, how="semi").to_pandas()
    matched = set(rpd["rk"])
    assert sorted(semi["lv"]) == sorted(lpd[lpd["k"].isin(matched)]["lv"])
    anti = colocated_join(ldir, rdir, left_cols={"lv": "lv"},
                          right_cols={}, how="anti").to_pandas()
    assert sorted(anti["lv"]) == sorted(lpd[~lpd["k"].isin(matched)]["lv"])
    assert len(semi) + len(anti) == len(lpd)


def test_colocated_join_matches_shuffle_hash_join(ray_session, layouts):
    import ray.data as rd

    from gostatix_ray.stages.joins import hash_join

    ldir, rdir, lpd, rpd = layouts
    shuffled = hash_join(
        rd.from_pandas(lpd), rd.from_pandas(rpd), key="k", right_key="rk",
        left_cols={"lv": "lv"}, right_cols={"rv": "rv"},
    ).to_pandas()
    coloc = colocated_join(ldir, rdir, left_cols={"lv": "lv"},
                           right_cols={"rv": "rv"}).to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]].to_numpy()))
    assert key(coloc) == key(shuffled)


def test_layout_mismatch_rejected(ray_session, layouts, tmp_path):
    import ray.data as rd

    ldir, rdir, lpd, _ = layouts
    other = os.path.join(str(tmp_path), "other")
    write_bucketed(rd.from_pandas(lpd), other, key="k", num_buckets=4)
    with pytest.raises(ValueError, match="incompatible"):
        colocated_join(ldir, other, left_cols={}, right_cols={})
    man = read_layout(ldir)
    assert man["num_buckets"] == 8 and man["key"] == "k"
