"""Deterministic sampling (stages/sample.py) and per-partition window
functions (stages/window_fns.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gostatix_ray.stages.sample import (
    hash_sample,
    hash_threshold,
    hashed_keys,
    stratified_sample,
)


def _ds(df, parts=1):
    import ray.data as rd

    out = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return out.repartition(parts) if parts > 1 else out


def test_hash_sample_partition_independent(ray_session):
    df = pd.DataFrame({"k": np.arange(10_000, dtype=np.int64), "v": np.arange(10_000)})
    picks = []
    for parts in (1, 7):
        out = hash_sample(_ds(df, parts), key_col="k", fraction=0.1).to_pandas()
        picks.append(set(out["k"]))
    assert picks[0] == picks[1]
    # matches the exact arithmetic definition
    expect = set(np.flatnonzero(hashed_keys(df["k"].to_numpy()) < hash_threshold(0.1)))
    assert picks[0] == expect
    # and the rate is near the fraction (Knuth hash mixes well)
    assert 0.08 < len(picks[0]) / len(df) < 0.12


def test_mixture_sample_nests_and_matches_duckdb(ray_session):
    import duckdb

    from gostatix_ray.stages.sample import mixture_sample

    df = pd.DataFrame({
        "k": np.arange(12_000, dtype=np.int64),
        "g": [f"d{i % 5}" for i in range(12_000)],
    })
    fr = {"d0": 1.0, "d1": 0.5, "d2": 0.25}
    outs = []
    for parts in (1, 9):
        out = mixture_sample(
            _ds(df, parts), key_col="k", group_col="g",
            fractions=fr, default_fraction=0.1,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    thr = {g: hash_threshold(f) for g, f in fr.items()}
    exp = duckdb.sql(
        "SELECT k, g FROM df "
        "WHERE (CAST(k AS HUGEINT) * 2654435761) % 4294967296 < "
        f"CASE g WHEN 'd0' THEN {thr['d0']} WHEN 'd1' THEN {thr['d1']} "
        f"WHEN 'd2' THEN {thr['d2']} ELSE {hash_threshold(0.1)} END "
        "ORDER BY k"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(outs[0], exp)
    # per-domain rates land near their fractions; full-keep domain exact
    rates = outs[0].groupby("g").size() / df.groupby("g").size()
    assert rates["d0"] == 1.0
    assert abs(rates["d1"] - 0.5) < 0.05 and abs(rates["d2"] - 0.25) < 0.05
    assert abs(rates["d3"] - 0.1) < 0.04 and abs(rates["d4"] - 0.1) < 0.04
    # selections NEST: re-tuning a fraction down keeps a subset
    smaller = mixture_sample(
        _ds(df), key_col="k", group_col="g",
        fractions={"d1": 0.2}, default_fraction=0.0,
    ).to_pandas()
    d1_big = set(outs[0][outs[0]["g"] == "d1"]["k"])
    assert set(smaller["k"]) <= d1_big


def test_hash_sample_rejects_negative_keys(ray_session):
    df = pd.DataFrame({"k": np.array([-1, 2, 3], dtype=np.int64)})
    with pytest.raises(Exception):
        hash_sample(_ds(df), key_col="k", fraction=0.5).to_pandas()


def test_stratified_sample_k_per_group_and_determinism(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 3_000),
            "k": np.arange(3_000, dtype=np.int64),
        }
    )
    outs = []
    for parts in (1, 9):
        out = (
            stratified_sample(_ds(df, parts), group_col="g", key_col="k", k=4)
            .to_pandas()
            .sort_values(["g", "rank"], kind="stable")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1], check_dtype=False)
    out = outs[0]
    assert (out.groupby("g")["k"].count() == 4).all()
    assert set(out["rank"]) == {1, 2, 3, 4}
    # ranks follow the hash ordering within each group
    for g, sub in out.groupby("g"):
        h = hashed_keys(sub.sort_values("rank")["k"].to_numpy())
        assert (np.diff(h.astype(np.int64)) >= 0).all()
        expect = df[df["g"] == g]["k"].to_numpy()
        hall = hashed_keys(expect)
        best = expect[np.lexsort((expect, hall))][:4]
        assert list(sub.sort_values("rank")["k"]) == list(best)


# ---------------------------------------------------------------------------
# window_over (per-partition lag / running sum)
# ---------------------------------------------------------------------------

def _window_reference(df):
    out = df.sort_values(["g", "o", "id"], kind="stable").copy()
    out["running"] = out.groupby("g")["v"].cumsum()
    gap = out.groupby("g")["o"].diff()
    out["gap"] = gap.fillna(-1).astype(np.int64)
    return out.reset_index(drop=True)


def test_window_over_matches_pandas_and_partitioning(ray_session):
    from gostatix_ray.stages.window_fns import window_over

    rng = np.random.default_rng(5)
    n = 4_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 37, n),
            "o": rng.integers(0, 10_000, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(-50, 50, n).astype(np.int64),
        }
    )
    exp = _window_reference(df)
    for parts in (1, 11):
        got = (
            window_over(
                _ds(df, parts),
                part_col="g", order_col="o", tiebreak="id",
                sum_col="v", running_name="running",
                gap_name="gap", gap_default=-1,
                keep=["g", "o", "id", "v"],
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["g", "o", "id"], kind="stable")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["g", "o", "id", "v", "gap", "running"]],
            exp[["g", "o", "id", "v", "gap", "running"]],
            check_dtype=False,
        )


def test_window_over_rejects_float_sum(ray_session):
    from gostatix_ray.stages.window_fns import window_over

    df = pd.DataFrame({"g": [1, 1], "o": [1, 2], "id": [0, 1], "v": [0.5, 1.5]})
    with pytest.raises(Exception):
        window_over(
            _ds(df), part_col="g", order_col="o", tiebreak="id", sum_col="v"
        ).to_pandas()


def test_window_over_timestamp_gap_units(ray_session):
    from gostatix_ray.stages.window_fns import window_over

    ts = pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:00:01", "2026-01-01 00:01:00"])
    df = pd.DataFrame({"g": [1, 1, 1], "o": ts.astype("datetime64[us]"), "id": [0, 1, 2]})
    got = (
        window_over(_ds(df), part_col="g", order_col="o", tiebreak="id",
                    gap_name="gap_us", keep=["id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(got["gap_us"]) == [-1, 1_000_000, 59_000_000]


def test_window_over_seq_and_dense_rank(ray_session):
    from gostatix_ray.stages.window_fns import window_over

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 20, 2000),
            "o": rng.integers(0, 50, 2000),  # duplicate order values => rank ties
            "id": np.arange(2000),
        }
    )
    got = (
        window_over(_ds(df).repartition(7), part_col="g", order_col="o",
                    tiebreak="id", gap_name=None, seq_name="seq",
                    dense_rank_name="drank", keep=["g", "id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    srt = df.sort_values(["g", "o", "id"])
    exp_seq = srt.groupby("g").cumcount() + 1
    exp_dr = srt.groupby("g")["o"].rank(method="dense").astype(int)
    exp = srt.assign(seq=exp_seq, drank=exp_dr).sort_values("id").reset_index(drop=True)
    assert list(got["seq"]) == list(exp["seq"])
    assert list(got["drank"]) == list(exp["drank"])


def test_window_lead_ntile(ray_session):
    """LEAD: next ordered value, NULL at partition end; NTILE: the
    SQL-standard split incl. partitions smaller than k."""
    import ray.data as rd

    from gostatix_ray.stages.window_fns import window_over

    rows = (
        [{"g": "a", "o": i, "v": i * 10} for i in range(5)]   # n=5, k=4: sizes 2,1,1,1
        + [{"g": "b", "o": i, "v": i} for i in range(2)]      # n=2 < k: tiles 1,2
    )
    ds = rd.from_items(rows).repartition(3)
    out = (
        window_over(ds, part_col="g", order_col="o", tiebreak="o",
                    gap_name=None, lead_col="v", lead_name="nxt",
                    ntile_n=4, ntile_name="tile", keep=["g", "o"])
        .to_pandas().sort_values(["g", "o"]).reset_index(drop=True)
    )
    a = out[out["g"] == "a"]
    assert list(a["nxt"])[:-1] == [10, 20, 30, 40] and pd.isna(a["nxt"].iloc[-1])
    assert list(a["tile"]) == [1, 1, 2, 3, 4]
    b = out[out["g"] == "b"]
    assert list(b["tile"]) == [1, 2] and pd.isna(b["nxt"].iloc[-1])
    assert b["nxt"].iloc[0] == 1


def test_window_rank_pct_cume_first(ray_session):
    """RANK/PERCENT_RANK/CUME_DIST with true peer ties (equal order
    values) and deterministic FIRST_VALUE."""
    import ray.data as rd

    from gostatix_ray.stages.window_fns import window_over

    # partition a: order values [1, 1, 2, 2, 2] -> ranks 1,1,3,3,3
    rows = [{"g": "a", "o": o, "id": i, "v": 100 + i}
            for i, o in enumerate([1, 1, 2, 2, 2])]
    rows += [{"g": "b", "o": 7, "id": 9, "v": 5}]  # single-row partition
    ds = rd.from_items(rows).repartition(3)
    out = (
        window_over(ds, part_col="g", order_col="o", tiebreak="id",
                    gap_name=None, rank_name="rnk", pct_rank_name="pr",
                    cume_name="cd", first_col="v", first_name="fv",
                    keep=["g", "id"])
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    )
    a = out[out["g"] == "a"]
    assert list(a["rnk"]) == [1, 1, 3, 3, 3]
    assert list(a["pr"]) == [0.0, 0.0, 0.5, 0.5, 0.5]
    assert list(a["cd"]) == [0.4, 0.4, 1.0, 1.0, 1.0]
    assert list(a["fv"]) == [100] * 5
    b = out[out["g"] == "b"]
    assert list(b["rnk"]) == [1] and list(b["pr"]) == [0.0] and list(b["cd"]) == [1.0]


def test_window_over_randomized_vs_duckdb(ray_session):
    """Absolute-correctness fuzz: every window column at once vs the
    DuckDB OVER twins on random data with heavy order-value ties."""
    import duckdb
    import ray.data as rd

    from gostatix_ray.stages.window_fns import window_over

    rng = np.random.default_rng(31)
    for trial in range(3):
        n = 300
        df = pd.DataFrame({
            "g": rng.integers(0, 8, n).astype(np.int64),
            "o": rng.integers(0, 20, n).astype(np.int64),  # heavy ties
            "id": np.arange(n, dtype=np.int64),
            "x": rng.integers(-100, 100, n).astype(np.int64),
        })
        out = (
            window_over(
                rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
                part_col="g", order_col="o", tiebreak="id",
                sum_col="x", running_name="rs",
                gap_name="gap", gap_default=-1,
                seq_name="rn", dense_rank_name="dr",
                rank_name="rk", pct_rank_name="pr", cume_name="cd",
                lead_col="x", lead_name="nx",
                ntile_n=3, ntile_name="nt",
                first_col="x", first_name="fv",
                frame_k=2 + trial, frame_j=trial,
                frame_sum_col="x", frame_sum_name="ts",
                frame_avg_name="ta", frame_min_col="x", frame_min_name="tm",
                range_k=5 + 3 * trial, range_sum_col="x", range_sum_name="qs",
                range_avg_name="qa", range_count_name="qc",
                range_min_col="x", range_min_name="qm",
                last_col="x", last_name="lv",
                nth_col="x", nth_k=20 + 10 * trial, nth_name="nv",
                keep=["g", "id"], num_buckets=8,
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            "SELECT g, id, "
            "CAST(row_number() OVER wt AS BIGINT) AS rn, "
            "CAST(dense_rank() OVER wo AS BIGINT) AS dr, "
            "CAST(rank() OVER wo AS BIGINT) AS rk, "
            "percent_rank() OVER wo AS pr, "
            "cume_dist() OVER wo AS cd, "
            "CAST(sum(x) OVER wt AS BIGINT) AS rs, "
            "CAST(coalesce(o - lag(o) OVER wt, -1) AS BIGINT) AS gap, "
            "lead(x) OVER wt AS nx, "
            "CAST(ntile(3) OVER wt AS BIGINT) AS nt, "
            "first_value(x) OVER wt AS fv, "
            "CAST(sum(x) OVER wf AS BIGINT) AS ts, "
            "avg(x) OVER wf AS ta, "
            "CAST(min(x) OVER wf AS BIGINT) AS tm, "
            "CAST(sum(x) OVER wr AS BIGINT) AS qs, "
            "avg(x) OVER wr AS qa, "
            "CAST(count(*) OVER wr AS BIGINT) AS qc, "
            "CAST(min(x) OVER wr AS BIGINT) AS qm, "
            "last_value(x) OVER wu AS lv, "
            f"nth_value(x, {20 + 10 * trial}) OVER wu AS nv "
            "FROM t WINDOW wo AS (PARTITION BY g ORDER BY o), "
            "wt AS (PARTITION BY g ORDER BY o, id), "
            f"wf AS (PARTITION BY g ORDER BY o, id "
            f"ROWS BETWEEN {2 + trial} PRECEDING AND {trial} FOLLOWING), "
            f"wr AS (PARTITION BY g ORDER BY o "
            f"RANGE BETWEEN {5 + 3 * trial} PRECEDING AND CURRENT ROW), "
            "wu AS (PARTITION BY g ORDER BY o, id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY id"
        ).df().reset_index(drop=True)
        for col in ("rn", "dr", "rk", "pr", "cd", "rs", "gap", "nt", "fv",
                    "ts", "ta", "tm", "qs", "qa", "qc", "qm", "lv"):
            assert list(out[col]) == list(exp[col]), (trial, col)
        ours_nv = out["nv"].astype("float64").to_numpy()
        theirs_nv = exp["nv"].astype("float64").to_numpy()
        assert ((ours_nv == theirs_nv)
                | (np.isnan(ours_nv) & np.isnan(theirs_nv))).all(), (trial, "nv")
        ours_nx = out["nx"].astype("float64").to_numpy()
        theirs_nx = exp["nx"].astype("float64").to_numpy()
        assert ((ours_nx == theirs_nx)
                | (np.isnan(ours_nx) & np.isnan(theirs_nx))).all(), (trial, "nx")


def test_user_event_paths_null_semantics(ray_session, tmp_path):
    """The string_agg query under NULLs: null event_type skipped (but
    counted by n_events), all-null group -> NULL path, null user_id
    kept as its own group — matching DuckDB string_agg exactly."""
    import duckdb
    import pyarrow.parquet as pq

    from gostatix_ray.pipelines.catalog import q_user_event_paths

    tbl = pa.table({
        "event_id": pa.array(list(range(7)), pa.int64()),
        "ts": pa.array([np.datetime64("2025-01-01T00:00:00", "us")] * 7,
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2, None, None], pa.int64()),
        "event_type": pa.array(["a", None, "b", None, None, "z", None]),
        "value": pa.array([0.0] * 7),
        "props": pa.array(["{}"] * 7),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = (q_user_event_paths(str(tmp_path)).to_pandas()
           .sort_values("user_id", na_position="last").reset_index(drop=True))
    exp = duckdb.sql(
        f"SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS path, "
        f"CAST(count(*) AS BIGINT) AS n_events "
        f"FROM '{tmp_path}/events.parquet' GROUP BY user_id "
        f"ORDER BY user_id NULLS LAST"
    ).df().reset_index(drop=True)
    assert list(out["n_events"]) == list(exp["n_events"]) == [3, 2, 2]
    for o, e in zip(out["path"], exp["path"]):
        assert (o == e) or (pd.isna(o) and pd.isna(e)), (o, e)


def test_reservoir_sample_exact_k_deterministic(ray_session):
    """Exactly-k, partition-independent, seed-redrawable, roughly
    uniform across seeds."""
    import ray.data as rd

    from gostatix_ray.stages.sample import reservoir_sample

    rows = [{"id": i, "v": float(i)} for i in range(500)]
    a = rd.from_items(rows).repartition(2)
    b = rd.from_items(list(reversed(rows))).repartition(7)
    sa = reservoir_sample(a, key_col="id", k=50).to_pandas()
    sb = reservoir_sample(b, key_col="id", k=50).to_pandas()
    assert len(sa) == len(sb) == 50
    assert sorted(sa["id"]) == sorted(sb["id"])  # partition/order independent
    s2 = reservoir_sample(a, key_col="id", k=50, seed=1).to_pandas()
    assert sorted(s2["id"]) != sorted(sa["id"])  # a fresh draw
    # crude uniformity: over 8 seeds, inclusion counts per id stay in a
    # sane band (expected 0.8 inclusions/id; bound generously)
    counts = np.zeros(500, dtype=np.int64)
    for s in range(8):
        got = reservoir_sample(a, key_col="id", k=50, seed=s).to_pandas()
        counts[got["id"].to_numpy()] += 1
    assert counts.sum() == 400
    assert counts.max() <= 6  # P(id in >=7 of 8 draws) is astronomically small


def test_window_over_frame_aggregates_vs_duckdb(ray_session):
    """ROWS BETWEEN 4 PRECEDING AND CURRENT ROW moving sum/avg/min,
    bit-exact vs DuckDB over the same frame order, partition-count
    independent."""
    import duckdb

    from gostatix_ray.stages.window_fns import window_over

    rng = np.random.default_rng(11)
    n = 3_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 23, n),
            "o": rng.integers(0, 500, n).astype(np.int64),  # ties in order
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    exp = duckdb.sql(
        "SELECT g, id, "
        "CAST(sum(v) OVER w AS BIGINT) AS tsum, "
        "avg(v) OVER w AS tavg, "
        "CAST(min(v) OVER w AS BIGINT) AS tmin "
        "FROM df WINDOW w AS (PARTITION BY g ORDER BY o, id "
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) ORDER BY g, id"
    ).df().reset_index(drop=True)
    for parts in (1, 9):
        got = (
            window_over(
                _ds(df, parts),
                part_col="g", order_col="o", tiebreak="id",
                gap_name=None,
                frame_k=4, frame_sum_col="v", frame_sum_name="tsum",
                frame_avg_name="tavg", frame_min_col="v", frame_min_name="tmin",
                keep=["g", "id"],
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["g", "id"], kind="stable")
            .reset_index(drop=True)
        )
        assert list(got["tsum"]) == list(exp["tsum"])
        assert list(got["tmin"]) == list(exp["tmin"])
        # avg: identical int sums / identical counts divided in float64
        assert got["tavg"].to_numpy().tobytes() == exp["tavg"].to_numpy().tobytes()


def test_window_over_frame_float_min_and_small_partitions(ray_session):
    from gostatix_ray.stages.window_fns import window_over

    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2, 3],
            "o": [1, 2, 3, 1, 2, 1],
            "id": [0, 1, 2, 3, 4, 5],
            "x": [5.0, 1.0, 9.0, 2.0, 7.0, 4.0],
        }
    )
    got = (
        window_over(_ds(df), part_col="g", order_col="o", tiebreak="id",
                    gap_name=None, frame_k=1, frame_min_col="x",
                    frame_min_name="m", keep=["id"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # frame = [max(i-1, part_start), i]
    assert list(got["m"]) == [5.0, 1.0, 1.0, 2.0, 2.0, 4.0]


def test_window_over_range_frame_vs_duckdb(ray_session):
    """RANGE BETWEEN K PRECEDING AND CURRENT ROW over the order VALUE
    (time-window semantics): sum/avg/count/min bit-exact vs DuckDB,
    including peer ties at the upper bound, partition-count
    independent."""
    import duckdb

    from gostatix_ray.stages.window_fns import window_over

    rng = np.random.default_rng(23)
    n = 4_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 31, n),
            "o": rng.integers(0, 2_000, n).astype(np.int64),  # heavy ties
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    exp = duckdb.sql(
        "SELECT g, id, "
        "CAST(sum(v) OVER w AS BIGINT) AS rsum, "
        "avg(v) OVER w AS ravg, "
        "CAST(count(*) OVER w AS BIGINT) AS rcnt, "
        "CAST(min(v) OVER w AS BIGINT) AS rmin "
        "FROM df WINDOW w AS (PARTITION BY g ORDER BY o "
        "RANGE BETWEEN 150 PRECEDING AND CURRENT ROW) ORDER BY g, id"
    ).df().reset_index(drop=True)
    for parts in (1, 9):
        got = (
            window_over(
                _ds(df, parts),
                part_col="g", order_col="o", tiebreak="id",
                gap_name=None,
                range_k=150, range_sum_col="v", range_sum_name="rsum",
                range_avg_name="ravg", range_count_name="rcnt",
                range_min_col="v", range_min_name="rmin",
                keep=["g", "id"],
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["g", "id"], kind="stable")
            .reset_index(drop=True)
        )
        assert list(got["rsum"]) == list(exp["rsum"])
        assert list(got["rcnt"]) == list(exp["rcnt"])
        assert list(got["rmin"]) == list(exp["rmin"])
        assert got["ravg"].to_numpy().tobytes() == exp["ravg"].to_numpy().tobytes()


def test_window_over_rows_following_frame_vs_duckdb(ray_session):
    """ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING (centered frame):
    sum/avg/min bit-exact vs DuckDB; the FOLLOWING bound exercises the
    sparse-table RMQ min path."""
    import duckdb

    from gostatix_ray.stages.window_fns import window_over

    rng = np.random.default_rng(29)
    n = 3_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 17, n),
            "o": rng.integers(0, 400, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    exp = duckdb.sql(
        "SELECT g, id, "
        "CAST(sum(v) OVER w AS BIGINT) AS csum, "
        "avg(v) OVER w AS cavg, "
        "CAST(min(v) OVER w AS BIGINT) AS cmin "
        "FROM df WINDOW w AS (PARTITION BY g ORDER BY o, id "
        "ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING) ORDER BY g, id"
    ).df().reset_index(drop=True)
    got = (
        window_over(
            _ds(df, 7),
            part_col="g", order_col="o", tiebreak="id",
            gap_name=None,
            frame_k=3, frame_j=2, frame_sum_col="v", frame_sum_name="csum",
            frame_avg_name="cavg", frame_min_col="v", frame_min_name="cmin",
            keep=["g", "id"],
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["g", "id"], kind="stable")
        .reset_index(drop=True)
    )
    assert list(got["csum"]) == list(exp["csum"])
    assert list(got["cmin"]) == list(exp["cmin"])
    assert got["cavg"].to_numpy().tobytes() == exp["cavg"].to_numpy().tobytes()


def test_trailing_range_start_overflow_fallback():
    """The shifted-searchsorted trick falls back to the per-group exact
    loop when order values would overflow int64 after shifting; both
    paths agree with a brute-force frame start."""
    from gostatix_ray.stages.window_fns import _trailing_range_start

    rng = np.random.default_rng(31)
    # extreme spread: values near +/- 2^61 force the fallback
    base = np.int64(2**61)
    parts = np.repeat(np.arange(40), 25)
    ov = np.sort(rng.integers(-base, base, parts.size).reshape(40, 25), axis=1).ravel()
    newg = np.zeros(parts.size, dtype=bool)
    newg[0] = True
    newg[1:] = parts[1:] != parts[:-1]
    K = int(2**59)
    fs = _trailing_range_start(ov, newg, K)
    # brute force
    gstart = np.maximum.accumulate(np.where(newg, np.arange(parts.size), 0))
    for i in range(parts.size):
        j = gstart[i]
        while ov[j] < ov[i] - K:
            j += 1
        assert fs[i] == j, i


def test_window_min_rmq_matches_naive():
    from gostatix_ray.stages.window_fns import _window_min

    rng = np.random.default_rng(37)
    vals = rng.integers(-1000, 1000, 5000).astype(np.int64)
    lo = rng.integers(0, 5000, 800)
    hi = np.minimum(lo + rng.integers(0, 600, 800), 4999)
    got = _window_min(vals, lo.astype(np.int64), hi.astype(np.int64))
    exp = np.array([vals[a:b + 1].min() for a, b in zip(lo, hi)])
    assert np.array_equal(got, exp)


def test_weighted_sample_matches_reference_and_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from gostatix_ray.stages.sample import weighted_sample

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64) * 3 + 1,
        "w": rng.integers(0, 700, n).astype(np.int64),  # some clamp >512
    })
    out = weighted_sample(rd.from_pandas(df).repartition(6),
                          key_col="k", weight_col="w",
                          rate=1.0 / 512.0).to_pandas()
    want = duckdb.sql(
        "SELECT k, w FROM df WHERE (CAST(k AS HUGEINT)*2654435761)%4294967296 "
        "< LEAST(CAST(floor(w * 0.001953125 * 4294967296) AS HUGEINT), 4294967296)"
    ).df()
    got = sorted(out["k"].tolist())
    assert got == sorted(want["k"].tolist())
    # clamp: weight >= 512 -> probability 1, always kept
    heavy = set(df.loc[df.w >= 512, "k"])
    assert heavy <= set(got)
    # zero weight never kept
    assert not (set(df.loc[df.w == 0, "k"]) & set(got))


def test_weighted_sample_nests_across_rates(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.sample import weighted_sample

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": np.arange(3000, dtype=np.int64),
        "w": rng.integers(1, 400, 3000).astype(np.int64),
    })
    kept = {}
    for rate in (1.0 / 2048.0, 1.0 / 512.0, 1.0 / 128.0):
        out = weighted_sample(rd.from_pandas(df).repartition(4),
                              key_col="k", weight_col="w", rate=rate)
        kept[rate] = set(out.to_pandas()["k"].tolist())
    assert kept[1.0 / 2048.0] <= kept[1.0 / 512.0] <= kept[1.0 / 128.0]
    # sanity: rates actually separate
    assert len(kept[1.0 / 2048.0]) < len(kept[1.0 / 128.0])


def test_weighted_sample_null_and_negative_weights_drop(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.sample import weighted_sample

    df = pd.DataFrame({
        "k": np.arange(10, dtype=np.int64),
        "w": pd.array([None, -5, 0, 600, 600, None, -1, 600, 600, 600],
                      dtype="Int64"),
    })
    out = weighted_sample(rd.from_pandas(df), key_col="k", weight_col="w",
                          rate=1.0 / 512.0).to_pandas()
    # >=512 always kept; null/negative/zero never
    assert sorted(out["k"].tolist()) == [3, 4, 7, 8, 9]


def test_hash_split_disjoint_exhaustive_stable(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.sample import hash_split

    df = pd.DataFrame({"k": np.arange(20_000, dtype=np.int64),
                       "v": np.arange(20_000)})
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    outs = []
    for parts in (1, 9):
        out = hash_split(rd.from_pandas(df).repartition(parts),
                         key_col="k", fractions=fr).to_pandas()
        outs.append(out.sort_values("k").reset_index(drop=True))
    # partitioning-independent: identical labels
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # exhaustive + disjoint: every row exactly one label
    assert len(out) == len(df)
    counts = out["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert 0.77 < counts["train"] / len(df) < 0.83
    assert 0.08 < counts["val"] / len(df) < 0.12
    # stable as the corpus grows: the first 20k keys keep their labels
    bigger = hash_split(
        rd.from_pandas(pd.DataFrame({"k": np.arange(40_000, dtype=np.int64),
                                     "v": np.arange(40_000)})),
        key_col="k", fractions=fr).to_pandas()
    merged = out.merge(bigger[["k", "split"]], on="k", suffixes=("", "_big"))
    assert (merged["split"] == merged["split_big"]).all()


def test_hash_split_consistent_with_hash_sample(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.sample import hash_sample, hash_split

    df = pd.DataFrame({"k": np.arange(10_000, dtype=np.int64)})
    split = hash_split(rd.from_pandas(df), key_col="k",
                       fractions={"train": 0.8, "val": 0.2}).to_pandas()
    sample = hash_sample(rd.from_pandas(df), key_col="k",
                         fraction=0.8).to_pandas()
    assert set(split.loc[split["split"] == "train", "k"]) == set(sample["k"])


def test_hash_split_validates_fractions():
    from gostatix_ray.stages.sample import split_thresholds

    with pytest.raises(ValueError):
        split_thresholds({"train": 0.8, "val": 0.1})  # sums to 0.9
    with pytest.raises(ValueError):
        split_thresholds({"only": 1.0})  # one label is not a split
    with pytest.raises(ValueError):
        split_thresholds({"a": 1.2, "b": -0.2})
