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


def test_hash_join_semi_anti(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.joins import hash_join

    left = rd.from_items(
        [{"k": i, "v": float(i)} for i in range(20)]
    ).repartition(3)
    # right has duplicate keys (semi/anti must not expand) across blocks
    right = rd.from_items(
        [{"rk": k} for k in [2, 2, 5, 5, 5, 7, 11, 13, 13, 17, 19]]
    ).repartition(4)
    semi = hash_join(left, right, key="k", right_key="rk",
                     left_cols={"v": "v"}, right_cols={}, how="semi").to_pandas()
    assert sorted(semi["k"]) == [2, 5, 7, 11, 13, 17, 19]
    assert len(semi) == 7  # one output row per matching left row
    anti = hash_join(left, right, key="k", right_key="rk",
                     left_cols={"v": "v"}, right_cols={}, how="anti").to_pandas()
    assert sorted(anti["k"]) == sorted(set(range(20)) - {2, 5, 7, 11, 13, 17, 19})
    # left-side duplicates survive in semi output with multiplicity 1 each
    left2 = rd.from_items([{"k": 5, "v": 1.0}, {"k": 5, "v": 2.0}, {"k": 6, "v": 3.0}])
    semi2 = hash_join(left2, right, key="k", right_key="rk",
                      left_cols={"v": "v"}, right_cols={}, how="semi").to_pandas()
    assert sorted(semi2["v"]) == [1.0, 2.0]


def test_hash_join_semi_rejects_right_cols(ray_session):
    import pytest
    import ray.data as rd

    from gostatix_ray.stages.joins import hash_join

    ds = rd.from_items([{"k": 1}])
    with pytest.raises(ValueError):
        hash_join(ds, ds, key="k", left_cols={}, right_cols={"k": "x"}, how="anti")


def test_hash_join_full_outer(ray_session):
    import numpy as np
    import ray.data as rd

    from gostatix_ray.stages.joins import hash_join

    # left keys 0..9 (5,5 duplicated), right keys 5..14 (7 duplicated):
    # matched m*n expansion, left-only 0..4, right-only 10..14
    left = rd.from_items(
        [{"k": i, "v": float(i)} for i in range(10)] + [{"k": 5, "v": 55.0}]
    ).repartition(3)
    right = rd.from_items(
        [{"rk": k, "w": k * 10} for k in range(5, 15)] + [{"rk": 7, "w": 700}]
    ).repartition(4)
    out = hash_join(left, right, key="k", right_key="rk",
                    left_cols={"v": "v"}, right_cols={"w": "w"},
                    how="outer").to_pandas().sort_values(["k", "v", "w"])
    # duckdb twin
    import duckdb

    exp = duckdb.sql(
        "SELECT COALESCE(l.k, r.rk) AS k, l.v, r.w FROM "
        "(VALUES " + ",".join(f"({i}, {float(i)})" for i in range(10)) + ",(5, 55.0)) l(k, v) "
        "FULL OUTER JOIN (VALUES " + ",".join(f"({k}, {k*10})" for k in range(5, 15)) + ",(7, 700)) r(rk, w) "
        "ON l.k = r.rk"
    ).df().sort_values(["k", "v", "w"])
    assert len(out) == len(exp)
    for col in ("k", "v", "w"):
        a = out[col].to_numpy(dtype=float, na_value=np.nan)
        b = exp[col].to_numpy(dtype=float, na_value=np.nan)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), col


def test_salted_hash_join_matches_unsalted(ray_session):
    """Skew salting must not change the join output SET (dup keys incl.)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gostatix_ray.stages.joins import hash_join

    rng = np.random.default_rng(13)
    # zipf-ish probe: key 0 is ~half the rows; build side has dup keys
    keys = np.where(rng.random(4000) < 0.5, 0, rng.integers(1, 50, 4000))
    left = rd.from_pandas(pd.DataFrame({"k": keys, "x": np.arange(4000)})).repartition(5)
    build = pd.DataFrame({"k": [0, 0, 1, 2, 3, 60], "y": [10, 20, 30, 40, 50, 99]})
    right = rd.from_pandas(build).repartition(3)

    for how in ("inner", "left", "semi", "anti"):
        salted = hash_join(left, right, key="k", left_cols={"x": "x"},
                           right_cols={"y": "y"} if how in ("inner", "left") else {},
                           how=how, hot_keys=["0", "1"], n_salts=4).to_pandas()
        plain = hash_join(left, right, key="k", left_cols={"x": "x"},
                          right_cols={"y": "y"} if how in ("inner", "left") else {},
                          how=how).to_pandas()
        cols = [c for c in ("k", "x", "y") if c in salted.columns]
        s = salted[cols].fillna(-1)
        p = plain[cols].fillna(-1)
        assert sorted(map(tuple, s.itertuples(index=False))) == \
               sorted(map(tuple, p.itertuples(index=False))), how


def test_salted_hash_join_rejects_outer(ray_session):
    import pytest
    import ray.data as rd

    from gostatix_ray.stages.joins import hash_join

    ds = rd.from_items([{"k": 1, "v": 2}])
    with pytest.raises(ValueError):
        hash_join(ds, ds, key="k", left_cols={}, right_cols={"v": "v2"},
                  how="outer", hot_keys=["1"])


def test_detect_hot_keys(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gostatix_ray.stages.joins import detect_hot_keys

    rng = np.random.default_rng(4)
    keys = np.concatenate([np.full(5000, 7), rng.integers(100, 5000, 5000)])
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(6)
    hot = detect_hot_keys(ds, "k", k=16, min_frac=0.05)
    assert "7" in hot
    assert len(hot) <= 16


def test_interval_join_matches_brute_force(ray_session):
    """Property (round-3 verdict #9, sole path since round 5): the
    sorted-endpoint path emits exactly the brute-force (row x interval)
    match set, including overlapping, nested and degenerate intervals."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gostatix_ray.stages.joins import interval_join

    rng = np.random.default_rng(23)
    n_iv = 400
    lo = rng.uniform(0, 1000, n_iv)
    hi = lo + rng.uniform(0, 80, n_iv)  # overlapping + some near-empty
    hi[::37] = lo[::37]                 # degenerate lo == hi -> match nothing
    intervals = pa.table({
        "lo": lo, "hi": hi,
        "iv_id": np.arange(n_iv, dtype=np.int64),
    })
    vals = pd.DataFrame({
        "row_id": np.arange(3000, dtype=np.int64),
        "v": rng.uniform(-50, 1100, 3000),
    })

    ds = rd.from_pandas(vals).repartition(5)
    got = interval_join(ds, intervals, value_col="v",
                        columns=["iv_id"]).to_pandas()

    v = vals["v"].to_numpy()
    mask = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
    rr, ii = np.nonzero(mask)
    expect = sorted(zip(vals["row_id"].to_numpy()[rr].tolist(), ii.tolist()))

    key = lambda df: sorted(map(tuple, df[["row_id", "iv_id"]].itertuples(index=False)))
    assert key(got) == expect
    assert len(got) > 0


def test_interval_join_10k_intervals_stress(ray_session):
    """10k overlapping intervals x 50k rows: the old per-interval loop
    would run 10k Python iterations per batch; the segment path must
    both stay exact (vs a DuckDB range join) and finish promptly."""
    import time

    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gostatix_ray.stages.joins import interval_join

    rng = np.random.default_rng(7)
    n_iv, n_rows = 10_000, 50_000
    lo = rng.uniform(0, 1_000_000, n_iv)
    hi = lo + rng.uniform(0, 300, n_iv)  # ~3 expected matches/row
    intervals = pa.table({
        "lo": lo, "hi": hi, "iv_id": np.arange(n_iv, dtype=np.int64),
    })
    vals = pd.DataFrame({
        "row_id": np.arange(n_rows, dtype=np.int64),
        "v": rng.uniform(0, 1_000_000, n_rows),
    })

    t0 = time.perf_counter()
    got = (
        interval_join(rd.from_pandas(vals).repartition(4), intervals,
                      value_col="v", columns=["iv_id"])
        .to_pandas()
    )
    elapsed = time.perf_counter() - t0

    iv_df = intervals.to_pandas()
    exp = duckdb.sql(
        "SELECT row_id, iv_id FROM vals JOIN iv_df "
        "ON v >= lo AND v < hi ORDER BY row_id, iv_id"
    ).df()
    key = lambda df: sorted(map(tuple, df[["row_id", "iv_id"]].itertuples(index=False)))
    assert key(got) == key(exp)
    assert len(got) > n_rows  # overlap actually exercised
    # generous wall bound (noisy host): the loop path took minutes here
    assert elapsed < 60, f"interval join stress took {elapsed:.1f}s"


def test_hash_join_randomized_vs_duckdb(ray_session):
    """Absolute-correctness fuzz: hash_join vs DuckDB on random frames
    with duplicate keys and NULLs, all five hows, plain AND salted."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gostatix_ray.stages.joins import hash_join

    rng = np.random.default_rng(77)

    def _frame_set(df):
        cols = sorted(df.columns)
        rows = df[cols].astype(object).where(df[cols].notna(), None).values.tolist()
        return sorted(map(tuple, rows),
                      key=lambda t: tuple((v is None, v if v is not None else 0) for v in t))

    for trial in range(3):
        n_l, n_r = int(rng.integers(40, 250)), int(rng.integers(30, 150))
        lk = rng.integers(0, 30, n_l).astype(object)
        rk = rng.integers(0, 40, n_r).astype(object)
        lk[rng.random(n_l) < 0.08] = None
        rk[rng.random(n_r) < 0.08] = None
        ldf = pd.DataFrame({"k": [int(x) if x is not None else None for x in lk],
                            "v": np.arange(n_l, dtype=np.int64)})
        rdf = pd.DataFrame({"rk": [int(x) if x is not None else None for x in rk],
                            "p": np.arange(n_r, dtype=np.int64)})
        con = duckdb.connect()
        con.register("l", ldf)
        con.register("r", rdf)
        sqls = {
            "inner": "SELECT l.k, l.v, r.p FROM l JOIN r ON l.k = r.rk",
            "left": "SELECT l.k, l.v, r.p FROM l LEFT JOIN r ON l.k = r.rk",
            "outer": ("SELECT COALESCE(l.k, r.rk) AS k, l.v, r.p "
                      "FROM l FULL OUTER JOIN r ON l.k = r.rk"),
            "semi": "SELECT l.k, l.v FROM l SEMI JOIN r ON l.k = r.rk",
            "anti": "SELECT l.k, l.v FROM l ANTI JOIN r ON l.k = r.rk",
        }
        left = rd.from_arrow(pa.Table.from_pandas(ldf)).repartition(3)
        right = rd.from_arrow(pa.Table.from_pandas(rdf)).repartition(2)
        for how, sql in sqls.items():
            rcols = {} if how in ("semi", "anti") else {"p": "p"}
            got = hash_join(left, right, key="k", right_key="rk",
                            left_cols={"v": "v"}, right_cols=rcols,
                            how=how, num_buckets=8).to_pandas()
            exp = con.execute(sql).df()
            assert _frame_set(got) == _frame_set(exp), (trial, how)
            if how in ("inner", "left", "semi", "anti"):
                salted = hash_join(left, right, key="k", right_key="rk",
                                   left_cols={"v": "v"}, right_cols=rcols,
                                   how=how, num_buckets=8,
                                   hot_keys=["3", "7"], n_salts=3).to_pandas()
                assert _frame_set(salted) == _frame_set(exp), (trial, how, "salted")
