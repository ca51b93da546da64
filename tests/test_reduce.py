"""small_group_agg: streaming combiner == Ray's sort-based aggregate."""

import numpy as np
import pandas as pd
import pytest

from gostatix_ray.stages.reduce import small_group_agg


def test_matches_sort_aggregate(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    rng = np.random.default_rng(5)
    n = 20_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], size=n),
            "v": rng.integers(-1000, 1000, size=n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(13)
    ours = (
        small_group_agg(
            ds,
            "g",
            {
                "n": (None, "count"),
                "s": ("v", "sum"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    theirs = (
        rd.from_pandas(df)
        .groupby("g")
        .aggregate(
            Count(alias_name="n"),
            Sum("v", alias_name="s"),
            Min("v", alias_name="lo"),
            Max("v", alias_name="hi"),
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)
    # int sums stay exact int64 (no float round-trip)
    assert ours["s"].dtype == np.int64


def test_multi_key_and_sparse_blocks(ray_session):
    import ray.data as rd

    # more blocks than rows: most partials are empty and must vanish
    df = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "x", "y"], "v": [10, 20, 30]})
    out = (
        small_group_agg(rd.from_pandas(df).repartition(16), ["a", "b"], {"s": ("v", "sum")})
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert out.to_dict("list") == {"a": [1, 2], "b": ["x", "y"], "s": [30, 30]}


def test_rejects_unknown_op(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="unsupported op"):
        small_group_agg(rd.range(4), "id", {"m": ("id", "mean")})
