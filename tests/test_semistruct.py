"""Semi-structured JSON field extraction (stages/semistruct.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from gostatix_ray.stages.semistruct import extract_int_field, json_int_field_stats


def test_extract_int_field_shapes():
    col = pa.array(
        ['{"k": 42}', '{"x": 1, "k": -7}', '{"x": 2}', None, '{"k":  13, "z": 0}']
    )
    got = extract_int_field(col, "k").to_pylist()
    assert got == [42, -7, None, None, 13]


def test_json_int_field_stats_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(6)
    g = rng.choice(["a", "b", "c"], 5000)
    k = rng.integers(-50, 100, 5000)
    has = rng.random(5000) < 0.8
    props = np.where(has, [f'{{"k": {v}}}' for v in k], '{"other": 1}')
    df = pd.DataFrame({"grp": g, "props": props})
    out = (
        json_int_field_stats(rd.from_pandas(df).repartition(7),
                             json_col="props", field="k", group_col="grp")
        .to_pandas().sort_values("grp").reset_index(drop=True)
    )
    sub = pd.DataFrame({"grp": g[has], "k": k[has]})
    want = sub.groupby("grp")["k"].agg(["count", "sum", "min", "max"])
    assert list(out["n_k"]) == list(want["count"])
    assert list(out["sum_k"]) == list(want["sum"])
    assert list(out["min_k"]) == list(want["min"])
    assert list(out["max_k"]) == list(want["max"])
