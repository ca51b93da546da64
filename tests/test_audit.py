"""Data-quality audit (stages/audit.py) — exact violation counts vs
DuckDB, partition independence, and the no-unique fast path."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _df(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    ids[n - 10:] = ids[:10]  # 10 planted duplicate ids
    vals = rng.uniform(-5.0, 105.0, n)
    vals[::97] = np.nan
    types = rng.choice(["a", "b", "c", "zz"], n, p=[0.4, 0.3, 0.2, 0.1])
    fk = rng.integers(0, 40, n)
    txt = np.where(rng.random(n) < 0.9, "code=" + pd.Series(fk).astype(str),
                   "garbage").astype(object)
    return pd.DataFrame({"id": ids, "val": vals, "typ": types,
                         "fk": fk, "txt": txt})


CHECKS = [
    ("not_null", "val"),
    ("unique", "id"),
    ("unique", "typ"),
    ("in_range", "val", 0.0, 100.0),
    ("in_set", "typ", ["a", "b", "c"]),
    ("matches", "txt", "^code=[0-9]+$"),
    ("ref_integrity", "fk", list(range(0, 30))),
]

ORACLE = """
SELECT 'in_range' AS check_name, 'val' AS col,
  count(*) FILTER (WHERE val IS NOT NULL AND (val < 0.0 OR val > 100.0)) AS violations,
  count(val) AS total FROM t
UNION ALL SELECT 'in_set','typ',
  count(*) FILTER (WHERE typ IS NOT NULL AND typ NOT IN ('a','b','c')), count(typ) FROM t
UNION ALL SELECT 'matches','txt',
  count(*) FILTER (WHERE txt IS NOT NULL AND NOT regexp_matches(txt, '^code=[0-9]+$')), count(txt) FROM t
UNION ALL SELECT 'not_null','val', count(*) FILTER (WHERE val IS NULL), count(*) FROM t
UNION ALL SELECT 'ref_integrity','fk',
  count(*) FILTER (WHERE fk IS NOT NULL AND fk NOT IN (SELECT unnest(range(0, 30)))), count(fk) FROM t
UNION ALL SELECT 'unique','id', count(id) - count(DISTINCT id), count(id) FROM t
UNION ALL SELECT 'unique','typ', count(typ) - count(DISTINCT typ), count(typ) FROM t
ORDER BY check_name, col
"""


def test_quality_audit_matches_duckdb_and_partitioning(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.audit import quality_audit

    df = _df()
    con = duckdb.connect()
    con.register("t", df)
    expect = con.execute(ORACLE).df()
    outs = []
    for parts in (1, 11):
        ds = rd.from_pandas(df).repartition(parts) if parts > 1 else rd.from_pandas(df)
        out = quality_audit(ds, CHECKS).to_pandas()
        outs.append(out.reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0].astype({"violations": "int64", "total": "int64"})
    expect = expect.astype({"violations": "int64", "total": "int64"})
    pd.testing.assert_frame_equal(got, expect)
    # sanity: the planted defects are actually seen
    byk = got.set_index(["check_name", "col"])["violations"]
    assert byk[("unique", "id")] == 10
    assert byk[("not_null", "val")] > 0
    assert byk[("in_set", "typ")] > 0


def test_quality_audit_no_unique_fast_path(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.audit import quality_audit

    df = _df(1000)
    out = quality_audit(
        rd.from_pandas(df).repartition(3),
        [("not_null", "val"), ("in_range", "val", 0.0, 100.0)],
    ).to_pandas()
    assert list(out["check_name"]) == ["in_range", "not_null"]
    assert out.loc[out.check_name == "not_null", "total"].iloc[0] == 1000


def test_quality_audit_validates(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.audit import quality_audit

    ds = rd.from_pandas(_df(10))
    with pytest.raises(ValueError):
        quality_audit(ds, [])
    with pytest.raises(ValueError):
        quality_audit(ds, [("not_null", "val"), ("not_null", "val")])
    with pytest.raises(ValueError):
        quality_audit(ds, [("bogus", "val")])


def test_quality_audit_broadcast_ref_keys(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.audit import quality_audit

    # key set above the inline cap -> ray.put broadcast path
    df = pd.DataFrame({"fk": np.arange(20_000, dtype=np.int64) % 10_000})
    out = quality_audit(
        rd.from_pandas(df).repartition(5),
        [("ref_integrity", "fk", np.arange(5_000, dtype=np.int64))],
    ).to_pandas()
    assert out["violations"].iloc[0] == 10_000  # fk 5000..9999, twice each
    assert out["total"].iloc[0] == 20_000
