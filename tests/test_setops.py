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
