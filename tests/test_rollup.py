"""GROUPING SETS / ROLLUP (stages/rollup.py) vs DuckDB on a tiny table."""

import duckdb
import pyarrow as pa


def _partials(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows)).repartition(3)


def test_rollup_matches_duckdb(ray_session):
    from gostatix_ray.stages.rollup import rollup

    rows = {
        "a": ["x", "x", "y", "y", "y", "z"],
        "b": ["p", "q", "p", "p", "q", "p"],
        "pn": [1, 1, 1, 1, 1, 1],
        "pv": [10, 20, 30, 40, 50, 60],
    }
    out = rollup(_partials(rows), keys=["a", "b"],
                 value_cols={"pn": "n", "pv": "total"}).to_pandas()
    exp = duckdb.sql(
        "SELECT COALESCE(a,'ALL') AS a, COALESCE(b,'ALL') AS b, "
        "CAST(sum(pn) AS BIGINT) AS n, CAST(sum(pv) AS BIGINT) AS total "
        "FROM (SELECT unnest(['x','x','y','y','y','z']) a, "
        "unnest(['p','q','p','p','q','p']) b, 1 pn, "
        "unnest([10,20,30,40,50,60]) pv) GROUP BY ROLLUP(a, b)"
    ).df()
    key = ["a", "b"]
    o = out.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert len(o) == len(e)
    for c in ("a", "b", "n", "total"):
        assert list(o[c]) == list(e[c]), c


def test_grouping_sets_int_key_and_scan_once(ray_session):
    from gostatix_ray.stages.rollup import grouping_sets

    rows = {"k": [1, 1, 2, 2, 3], "g": ["u", "v", "u", "u", "v"],
            "pv": [5, 5, 7, 7, 9]}
    out = grouping_sets(
        _partials(rows), keys=["k", "g"], value_cols={"pv": "total"},
        sets=[["g"], []], fill={"k": -1, "g": "ALL"},
    ).to_pandas().sort_values(["k", "g"]).reset_index(drop=True)
    # level (g): k filled with -1; grand total: both sentinels
    assert set(out["k"]) == {-1}
    by_g = {(r.k, r.g): r.total for r in out.itertuples()}
    assert by_g[(-1, "u")] == 19 and by_g[(-1, "v")] == 14
    assert by_g[(-1, "ALL")] == 33


def test_grouping_sets_rejects_unknown_key(ray_session):
    import pytest

    from gostatix_ray.stages.rollup import grouping_sets

    with pytest.raises(ValueError):
        grouping_sets(_partials({"a": ["x"], "pv": [1]}), keys=["a"],
                      value_cols={"pv": "t"}, sets=[["a", "bogus"]])


def test_cube_matches_duckdb(ray_session):
    """cube() vs GROUP BY CUBE on random 3-key partials — all 8
    grouping sets from one scan."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], n),
        "b": rng.choice(["p", "q", "r"], n),
        "c": rng.integers(0, 3, n).astype(np.int64).astype(str),
        "m": rng.integers(0, 100, n).astype(np.int64),
    })
    # map-side partials: one row per (a, b, c) per block with n/sum
    parts = (
        rd.from_pandas(df).repartition(5)
        .map_batches(
            lambda t: t.groupby(["a", "b", "c"], as_index=False)
            .agg(pn=("m", "size"), ps=("m", "sum")),
            batch_format="pandas",
        )
    )
    from gostatix_ray.stages.rollup import cube

    out = (cube(parts, keys=["a", "b", "c"], value_cols={"pn": "n", "ps": "s"})
           .to_pandas().sort_values(["a", "b", "c"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT COALESCE(a, 'ALL') AS a, COALESCE(b, 'ALL') AS b, "
        "COALESCE(c, 'ALL') AS c, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(m) AS BIGINT) AS s FROM t GROUP BY CUBE(a, b, c) "
        "ORDER BY a, b, c").df().reset_index(drop=True)
    assert len(out) == len(exp)
    for col in ("a", "b", "c", "n", "s"):
        assert list(out[col]) == list(exp[col]), col
