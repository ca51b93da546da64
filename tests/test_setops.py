"""Distributed DISTINCT set operations (stages/setops.py)."""

import numpy as np
import pandas as pd
import pytest

from gostatix_ray.stages.setops import key_set_op


@pytest.fixture(scope="module")
def sides(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    a = pd.DataFrame({"k": rng.integers(0, 400, 3000), "x": 1.0})
    b = pd.DataFrame({"k": rng.integers(200, 600, 3000), "x": 2.0})
    return (rd.from_pandas(a).repartition(7), rd.from_pandas(b).repartition(5),
            set(a["k"].tolist()), set(b["k"].tolist()))


def _keys(ds):
    return set(ds.to_pandas()["k"].tolist())


def test_intersect(sides):
    ds_a, ds_b, sa, sb = sides
    assert _keys(key_set_op(ds_a, ds_b, key="k", op="intersect")) == sa & sb


def test_except(sides):
    ds_a, ds_b, sa, sb = sides
    assert _keys(key_set_op(ds_a, ds_b, key="k", op="except")) == sa - sb
    # not symmetric
    assert _keys(key_set_op(ds_b, ds_a, key="k", op="except")) == sb - sa


def test_union_and_distinctness(sides):
    ds_a, ds_b, sa, sb = sides
    out = key_set_op(ds_a, ds_b, key="k", op="union").to_pandas()
    assert set(out["k"].tolist()) == sa | sb
    assert len(out) == len(sa | sb)  # each key exactly once


def test_string_keys(ray_session):
    import ray.data as rd

    a = rd.from_pandas(pd.DataFrame({"name": ["x", "y", "z", "x"]}))
    b = rd.from_pandas(pd.DataFrame({"name": ["y", "w", "y"]}))
    out = key_set_op(a, b, key="name", op="intersect").to_pandas()
    assert list(out.columns) == ["name"] and set(out["name"]) == {"y"}


def test_composite_key(ray_session):
    import ray.data as rd

    a = pd.DataFrame({"u": [1, 1, 2, 2, 3], "d": ["a", "b", "a", "b", "a"]})
    b = pd.DataFrame({"u": [1, 2, 9], "d": ["b", "a", "a"]})
    got = key_set_op(rd.from_pandas(a).repartition(3), rd.from_pandas(b),
                     key=["u", "d"], op="except").to_pandas()
    assert set(map(tuple, got.itertuples(index=False))) == {(1, "a"), (2, "b"), (3, "a")}
    inter = key_set_op(rd.from_pandas(a), rd.from_pandas(b),
                       key=["u", "d"], op="intersect").to_pandas()
    assert set(map(tuple, inter.itertuples(index=False))) == {(1, "b"), (2, "a")}


def test_bad_op(ray_session):
    import ray.data as rd

    ds = rd.range(3)
    with pytest.raises(ValueError):
        key_set_op(ds, ds, key="id", op="minus")


def test_null_keys_are_real_keys(ray_session):
    """ADVICE r3: NULL keys must factorize to a real code — SQL set ops
    treat NULLs as equal, and the -1 sentinel made (g, NULL) collide
    with (g-1, last_code)."""
    import ray.data as rd

    a = pd.DataFrame({"g": [1, 1, 2, 2], "d": ["x", None, "x", None]})
    b = pd.DataFrame({"g": [1, 2], "d": [None, "x"]})
    inter = key_set_op(rd.from_pandas(a).repartition(2), rd.from_pandas(b),
                       key=["g", "d"], op="intersect").to_pandas()
    got = {(int(r.g), r.d) for r in inter.itertuples(index=False)}
    assert got == {(1, None), (2, "x")}
    ex = key_set_op(rd.from_pandas(a), rd.from_pandas(b),
                    key=["g", "d"], op="except").to_pandas()
    got = {(int(r.g), r.d) for r in ex.itertuples(index=False)}
    assert got == {(1, "x"), (2, None)}


def test_distinct_count_with_nulls(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.setops import distinct_count

    df = pd.DataFrame({"g": [1, 1, 2, 2, 2], "d": ["x", None, "x", None, None]})
    assert distinct_count(rd.from_pandas(df).repartition(2), ["g", "d"]) == 4


def test_setops_randomized_vs_duckdb(ray_session):
    """Absolute-correctness fuzz: INTERSECT/EXCEPT/UNION on random
    composite keys with NULLs vs DuckDB (SQL set ops treat NULLs as
    equal — the round-3 null-factorization fix under load)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(5)

    def _null_some(a, frac):
        a = a.astype(object)
        a[rng.random(len(a)) < frac] = None
        return list(a)

    for trial in range(3):
        n_a, n_b = int(rng.integers(50, 250)), int(rng.integers(50, 250))
        adf = pd.DataFrame({
            "g": _null_some(rng.integers(0, 5, n_a), 0.1),
            "k": _null_some(rng.integers(0, 15, n_a), 0.1),
        })
        bdf = pd.DataFrame({
            "g": _null_some(rng.integers(0, 5, n_b), 0.1),
            "k": _null_some(rng.integers(0, 20, n_b), 0.1),
        })
        con = duckdb.connect()
        con.register("a", adf)
        con.register("b", bdf)
        da = rd.from_arrow(pa.Table.from_pandas(adf)).repartition(3)
        db = rd.from_arrow(pa.Table.from_pandas(bdf)).repartition(2)
        for op, sql in (("intersect", "SELECT g, k FROM a INTERSECT SELECT g, k FROM b"),
                        ("except", "SELECT g, k FROM a EXCEPT SELECT g, k FROM b"),
                        ("union", "SELECT g, k FROM a UNION SELECT g, k FROM b")):
            got = key_set_op(da, db, key=["g", "k"], op=op, num_buckets=8).to_pandas()
            exp = con.execute(sql).df()

            def canon(df):
                rows = df[["g", "k"]].astype(object).where(df[["g", "k"]].notna(), None).values.tolist()
                return sorted(map(tuple, rows),
                              key=lambda t: tuple((v is None, v if v is not None else 0) for v in t))

            assert canon(got) == canon(exp), (trial, op)
