"""Driver-contract smoke: entry() / queries() / oracle_sql() shape."""

import pandas as pd
import pytest

import __ray_entry__ as entrymod


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)  # every oracle has a query
    assert len(oracles) >= 15
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_runs(ray_session):
    out = entrymod.entry()
    assert isinstance(out, pd.DataFrame)
    assert len(out) >= 1
    assert {"sketch", "kind", "rows", "headline_estimate"} <= set(out.columns)


def test_hll_daily_active_users_within_bound(ray_session):
    """The windowed grouped sketch (one HLL per derived day key) must
    agree with its exact twin within the published HLL bound
    (3x 1.04/sqrt(m) to keep the test deterministic-safe)."""
    from gostatix_ray.pipelines import catalog

    sf = "/root/testdata/sf0.001"
    est = catalog.q_hll_daily_active_users(sf).set_index("day")["active_users_est"]
    exact = catalog.q_events_daily_active_users(sf).to_pandas()
    exact["day"] = exact["day"].astype(str).str.slice(0, 10)
    exact = exact.set_index("day")["active_users"]
    assert set(est.index) == set(exact.index)
    bound = 3 * 1.04 / (1 << 12) ** 0.5
    for day, e in exact.items():
        assert abs(est[day] - e) <= max(2.0, bound * e), (day, est[day], e)


def test_cms_inner_product_bounds(ray_session):
    """Overestimate-only + Cormode-Muthukrishnan error bound vs the exact
    inner-product twin."""
    from gostatix_ray.pipelines import catalog

    sf = "/root/testdata/sf0.001"
    exact = int(catalog.q_lang_token_inner_product_exact(sf)["inner_product"].iloc[0])
    est_df = catalog.q_cms_lang_inner_product(sf)
    est = int(est_df["inner_product_est"].iloc[0])
    na = int(est_df["n_tokens_en"].iloc[0])
    nb = int(est_df["n_tokens_de"].iloc[0])
    assert est >= exact  # CMS never underestimates
    assert est <= exact + 3 * 0.0001 * na * nb  # 3x the eps*Na*Nb bound


def test_kll_rank_within_bound(ray_session):
    """KLL normalized rank vs the exact CDF twin: rank error O(1/k)."""
    from gostatix_ray.pipelines import catalog

    sf = "/root/testdata/sf0.001"
    exact = catalog.q_value_rank_exact(sf).set_index("x")["rank_frac"]
    est = catalog.q_value_rank_kll(sf).set_index("x")["rank_est"]
    for x in exact.index:
        assert abs(est[x] - exact[x]) < 0.05, (x, est[x], exact[x])


def test_grouped_tdigest_median_within_bound_per_group(ray_session):
    """Per-GROUP bound (round-3 verdict #10): each event_type's t-digest
    median must sit within a tight quantile window of that group's own
    exact distribution — not just the global one."""
    import duckdb
    import numpy as np

    from gostatix_ray.pipelines import catalog

    sf = "/root/testdata/sf0.001"
    est = catalog.q_value_quantiles_by_type_tdigest(sf).set_index("event_type")["median_value"]
    con = duckdb.connect()
    exact = con.execute(
        "SELECT event_type,"
        " quantile_cont(value, 0.45) AS q45,"
        " quantile_cont(value, 0.55) AS q55"
        f" FROM read_parquet('{sf}/events.parquet') GROUP BY event_type"
    ).df().set_index("event_type")
    con.close()
    assert set(est.index) == set(exact.index)
    for g in exact.index:
        # delta=200 digest: the median estimate must land within the
        # group's [q45, q55] band (generous vs the ~1% theoretical
        # mid-quantile error at this compression)
        assert exact.loc[g, "q45"] <= est[g] <= exact.loc[g, "q55"], (
            g, est[g], exact.loc[g, "q45"], exact.loc[g, "q55"])


def test_grouped_kll_rank_within_bound_per_group(ray_session):
    """Per-group KLL rank error: build one KLL per event_type and check
    the normalized rank of each group's own median within O(1/k)."""
    import duckdb
    import numpy as np

    from gostatix_ray.kernels import kll
    from gostatix_ray.pipelines import catalog
    from gostatix_ray.stages.build import SketchRequest, build_partials
    from gostatix_ray.stages.merge import collect_final, merge_partials_streaming

    sf = "/root/testdata/sf0.001"
    ds = catalog._read(sf, "events", ["value", "event_type"])
    partials = build_partials(
        ds,
        [SketchRequest("kll_by_type", "kll", kll.KLLSpec(k=200),
                       on="value", group_by="event_type")],
        concurrency=2,
    )
    final = collect_final(merge_partials_streaming(partials))
    con = duckdb.connect()
    med = con.execute(
        "SELECT event_type, quantile_cont(value, 0.5) AS m"
        f" FROM read_parquet('{sf}/events.parquet') GROUP BY event_type"
    ).df().set_index("event_type")["m"]
    con.close()
    groups = {gk for (_, gk) in final}
    assert groups == set(med.index)
    for (name, gk), blob in final.items():
        st = kll.from_bytes(blob)
        r = float(kll.rank(st, [float(med[gk])])[0])
        assert abs(r - 0.5) < 0.05, (gk, r)
