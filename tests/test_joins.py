"""Broadcast hash join (stages/joins.py): inner/left semantics, type
coercion across key types, once-per-worker small side."""

import pyarrow as pa

from gostatix_ray.stages.joins import broadcast_join


def test_inner_and_left_join(ray_session):
    import ray.data as rd

    big = rd.from_items([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 9, "v": "c"}])
    small = pa.table({"sk": pa.array([1, 2], pa.int32()), "name": ["one", "two"]})
    inner = broadcast_join(big, small, key="k", small_key="sk", columns=["name"]).to_pandas()
    assert sorted(zip(inner["k"], inner["name"])) == [(1, "one"), (2, "two")]
    left = broadcast_join(big, small, key="k", small_key="sk", columns=["name"], how="left").to_pandas()
    assert len(left) == 3
    assert left.set_index("k")["name"].to_dict()[9] is None or left.set_index("k")["name"].isna().any()


def test_chained_joins(ray_session):
    import ray.data as rd

    facts = rd.from_items([{"a": i % 3, "x": i} for i in range(30)])
    d1 = pa.table({"a": [0, 1, 2], "b": [10, 11, 12]})
    d2 = pa.table({"b": [10, 11, 12], "label": ["x", "y", "z"]})
    out = broadcast_join(
        broadcast_join(facts, d1, key="a", small_key="a", columns=["b"]),
        d2, key="b", small_key="b", columns=["label"],
    ).to_pandas()
    assert len(out) == 30
    assert set(out["label"]) == {"x", "y", "z"}
