"""Exact distributed quantiles (stages/quantiles.py): quantile_disc
semantics, exactness vs numpy order statistics, degenerate inputs."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def values_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    vals = rng.lognormal(0, 1, 50_000)
    return rd.from_items([{"value": float(v)} for v in vals]).repartition(16), np.sort(vals)


def test_matches_order_statistics(values_ds):
    from gostatix_ray.stages.quantiles import exact_quantiles

    ds, srt = values_ds
    qs = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    out = exact_quantiles(ds, "value", qs, bins=1 << 12)
    n = len(srt)
    for q, got in zip(out["q"], out["value_exact"]):
        k = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
        assert got == srt[k], (q, got, srt[k])


def test_constant_column(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.quantiles import exact_quantiles

    ds = rd.from_items([{"value": 7.5}] * 100)
    out = exact_quantiles(ds, "value", [0.1, 0.9])
    assert list(out["value_exact"]) == [7.5, 7.5]


def test_nan_excluded(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.quantiles import exact_quantiles

    rows = [{"value": float(v)} for v in range(1, 101)] + [{"value": float("nan")}] * 20
    ds = rd.from_items(rows)
    out = exact_quantiles(ds, "value", [0.5], bins=64)
    assert out["value_exact"].iloc[0] == 50.0  # ceil(0.5*100)-1 = index 49


def test_grouped_matches_order_statistics(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.quantiles import exact_quantiles_grouped

    rng = np.random.default_rng(3)
    rows = []
    for g, n in (("a", 5000), ("b", 333), ("c", 1)):
        for v in rng.normal(0, 1, n):
            rows.append({"g": g, "value": float(v)})
    ds = rd.from_items(rows).repartition(8)
    out = exact_quantiles_grouped(ds, "value", "g", [0.1, 0.5, 0.99], bins=256)
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["value"])
    for _, row in out.iterrows():
        srt = np.sort(by_g[row["g"]])
        n = len(srt)
        k = min(max(int(np.ceil(row["q"] * n)) - 1, 0), n - 1)
        assert row["value_exact"] == srt[k], (row["g"], row["q"])


def test_grouped_high_cardinality_guard(ray_session):
    import pytest
    import ray.data as rd

    from gostatix_ray.stages.quantiles import exact_quantiles_grouped

    rows = [{"g": i, "value": float(i)} for i in range(50)]
    ds = rd.from_items(rows)
    with pytest.raises(ValueError, match="distinct"):
        exact_quantiles_grouped(ds, "value", "g", [0.5], bins=64, max_groups=10)


def test_cont_matches_duckdb(values_ds):
    """percentile_cont: bit-identical to DuckDB quantile_cont, incl. qs
    that land exactly on an order statistic (no interpolation) and ones
    that bracket two (interpolated with DuckDB's formula)."""
    import duckdb

    from gostatix_ray.stages.quantiles import exact_quantiles_cont

    ds, srt = values_ds
    qs = [0.0, 0.01, 0.25, 0.5, 0.733, 0.9, 1.0]
    out = exact_quantiles_cont(ds, "value", qs, bins=1 << 12)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS v)",
                [srt.tolist()])
    for q, got in zip(out["q"], out["value_cont"]):
        exp = con.execute(f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
        assert float(got) == float(exp), (q, got, exp)


def test_cont_constant_and_small(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.quantiles import exact_quantiles_cont

    const = rd.from_items([{"value": 5.0}] * 100)
    out = exact_quantiles_cont(const, "value", [0.1, 0.9])
    assert list(out["value_cont"]) == [5.0, 5.0]
    two = rd.from_items([{"value": 1.0}, {"value": 3.0}])
    out2 = exact_quantiles_cont(two, "value", [0.5])
    assert float(out2["value_cont"].iloc[0]) == 2.0  # true interpolation


def test_grouped_cont_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from gostatix_ray.stages.quantiles import exact_quantiles_grouped

    rng = np.random.default_rng(11)
    gs = rng.integers(0, 4, 5000)
    vs = rng.normal(0, 100, 5000)
    ds = rd.from_items(
        [{"g": f"g{g}", "value": float(v)} for g, v in zip(gs, vs)]
    ).repartition(6)
    out = exact_quantiles_grouped(ds, "value", "g", [0.25, 0.5, 0.733], mode="cont")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS g, unnest(?) AS v)",
        [[f"g{g}" for g in gs], vs.tolist()],
    )
    for _, row in out.iterrows():
        exp = con.execute(
            "SELECT quantile_cont(v, ?) FROM t WHERE g = ?", [row["q"], row["g"]]
        ).fetchone()[0]
        assert float(row["value_cont"]) == float(exp), (row["g"], row["q"])


def test_cont_pathological_distributions(ray_session):
    """percentile_cont stays bit-identical to DuckDB on adversarial
    shapes: heavy ties, lognormal tails, constant runs, negatives."""
    import duckdb
    import ray.data as rd

    from gostatix_ray.stages.quantiles import exact_quantiles_cont

    rng = np.random.default_rng(23)
    shapes = [
        np.repeat([1.0, 2.0, 3.0], [100, 1, 99]),
        rng.lognormal(0, 2, 3000),
        np.concatenate([np.full(500, -7.25), rng.normal(0, 1, 500)]),
        rng.integers(-5, 5, 999).astype(float),
    ]
    qs = [0.0, 0.123, 0.5, 0.877, 1.0]
    for trial, vals in enumerate(shapes):
        ds = rd.from_items([{"value": float(v)} for v in vals]).repartition(4)
        out = exact_quantiles_cont(ds, "value", qs, bins=1 << 10)
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS v)",
                    [vals.tolist()])
        for q, got in zip(out["q"], out["value_cont"]):
            exp = con.execute(f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
            assert float(got) == float(exp), (trial, q, got, exp)
