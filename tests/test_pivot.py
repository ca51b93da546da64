"""Distributed PIVOT (stages/pivot.py) vs pandas pivot_table."""

import numpy as np
import pandas as pd
import pytest

from gostatix_ray.stages.pivot import pivot_table


@pytest.fixture(scope="module")
def long_df():
    rng = np.random.default_rng(5)
    return pd.DataFrame(
        {
            "grp": rng.choice([f"g{i}" for i in range(40)], 8000),
            "cat": rng.choice(["a", "b", "c", "d"], 8000),
            "amt": rng.integers(0, 1000, 8000).astype(np.int64),
        }
    )


def test_pivot_counts_and_sums(ray_session, long_df):
    import ray.data as rd

    out = pivot_table(
        rd.from_pandas(long_df).repartition(9),
        index="grp", columns="cat", values=["a", "b", "c"], sum_col="amt",
    ).to_pandas().sort_values("grp").reset_index(drop=True)
    want_cnt = long_df.pivot_table(index="grp", columns="cat", values="amt",
                                   aggfunc="count", fill_value=0)
    want_sum = long_df.pivot_table(index="grp", columns="cat", values="amt",
                                   aggfunc="sum", fill_value=0)
    for v in ("a", "b", "c"):
        assert (out.set_index("grp")[f"n_{v}"] == want_cnt[v]).all()
        assert (out.set_index("grp")[f"sum_{v}"] == want_sum[v]).all()
    # category 'd' excluded by the IN-list
    assert "n_d" not in out.columns


def test_pivot_partition_independent(ray_session, long_df):
    import ray.data as rd

    outs = []
    for parts in (1, 13):
        o = pivot_table(rd.from_pandas(long_df).repartition(parts),
                        index="grp", columns="cat", values=["a", "d"]) \
            .to_pandas().sort_values("grp").reset_index(drop=True)
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_pivot_rejects_float_sum(ray_session, long_df):
    import ray.data as rd

    df = long_df.assign(amt=long_df["amt"].astype(float))
    with pytest.raises(Exception):
        pivot_table(rd.from_pandas(df), index="grp", columns="cat",
                    values=["a"], sum_col="amt").to_pandas()


def test_pivot_sum_exact_above_2_53(ray_session):
    """Integer cents above 2^53 must survive exactly (np.add.at, not
    float64 bincount weights)."""
    import ray.data as rd

    big = (1 << 60) + 1
    df = pd.DataFrame({"grp": ["g1", "g1", "g2"], "cat": ["a", "a", "a"],
                       "amt": np.array([big, 1, 5], dtype=np.int64)})
    out = (pivot_table(rd.from_pandas(df).repartition(2), index="grp",
                       columns="cat", values=["a"], sum_col="amt")
           .to_pandas().sort_values("grp").reset_index(drop=True))
    assert list(out["sum_a"]) == [big + 1, 5]


def test_pivot_randomized_vs_duckdb(ray_session):
    """Cross-engine fuzz: pivot counts + int sums vs DuckDB FILTER
    aggregates on random long frames (incl. categories absent from some
    index rows and rows outside the IN-list)."""
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(3)
    for trial in range(3):
        n = int(rng.integers(100, 500))
        df = pd.DataFrame({
            "idx": rng.integers(0, 12, n).astype(np.int64),
            "cat": rng.choice(list("abcdX"), n),  # X excluded from IN-list
            "x": rng.integers(-50, 50, n).astype(np.int64),
        })
        cats = ["a", "b", "c", "d"]
        out = (pivot_table(rd.from_pandas(df).repartition(4), index="idx",
                           columns="cat", values=cats, sum_col="x", num_buckets=4)
               .to_pandas().sort_values("idx").reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", df)
        exprs = ", ".join(
            f"CAST(count(*) FILTER (cat = '{c}') AS BIGINT) AS n_{c}, "
            f"CAST(coalesce(sum(x) FILTER (cat = '{c}'), 0) AS BIGINT) AS sum_{c}"
            for c in cats)
        exp = con.execute(
            f"SELECT idx, {exprs} FROM t WHERE cat IN ('a','b','c','d') "
            f"GROUP BY idx ORDER BY idx").df().reset_index(drop=True)
        for c in cats:
            assert list(out[f"n_{c}"]) == list(exp[f"n_{c}"]), (trial, c)
            assert list(out[f"sum_{c}"]) == list(exp[f"sum_{c}"]), (trial, c)


def test_unpivot_matches_pandas_melt(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.pivot import unpivot

    df = pd.DataFrame({
        "id": [1, 2, 3],
        "a": np.array([10, 20, 30], dtype=np.int64),
        "b": np.array([-1, -2, -3], dtype=np.int64),
    })
    out = (unpivot(rd.from_pandas(df).repartition(2), id_cols=["id"],
                   value_cols=["a", "b"])
           .to_pandas().sort_values(["id", "variable"]).reset_index(drop=True))
    exp = (df.melt(id_vars=["id"], value_vars=["a", "b"])
           .sort_values(["id", "variable"]).reset_index(drop=True))
    assert out.equals(exp.astype({"value": "int64"}))
