"""Adversarial oracle fuzz: run the production catalog queries AND their
DuckDB twins over synthetic degenerate tables, comparing bit-exactly via
scripts/check_oracles.py (the driver-gate compare).

Two generators:

* documents — empty / whitespace-only / single-token / repeated-token /
  CJK-no-space / emoji-soup texts, plus injected exact duplicates and
  shared-prefix near-duplicates (stresses substring dedup, chunk/pack
  clamped-gram edges, tf-idf, contamination, mixture sampling).
* events — zipf user skew (one user owns ~30% of rows), minute-quantized
  tie-heavy timestamps, value ties / zeros / negatives / outliers
  (stresses every window frame, rank peers, quantiles, pivots, sessions).
* relational — TPC-H-ish region/nation/customer/orders/lineitem (+events)
  with order/ship dates spiked EXACTLY at every predicate cutoff the
  catalog uses (1998-01-01, 2000-01-01), dangling foreign keys on both
  sides (orders without customers, lineitems without orders, customers
  without orders), empty dimension branches (a region with no nations,
  nations with no customers), and one customer / one order owning a
  large share of the fact rows (stresses every join strategy, semi/anti
  gates, rollup/cube/grouping-sets, corr, top-per-group).
* embeddings — clustered unit vectors plus exact duplicates,
  near-antipodal pairs, and non-unit norms, REJECTION-SAMPLED so no
  relevant cosine sits within 5e-4 of a fixed threshold or top-10 rank
  cut (stresses the exact similarity join / threshold / top-k oracles
  without measuring cross-engine float noise; the ANN sketch paths run
  as must-not-crash rows checks).

Usage: python scripts/fuzz_oracles.py [N_SEEDS] (default 3)

Each seed writes /tmp/gostatix_ray/fuzz_{docs,events}_sN and invokes
check_oracles.py in a subprocess (fresh Ray session per run, matching
the driver's process model).  Exit 0 iff every seed × family passes.
"""
from __future__ import annotations

import datetime as dt
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))

DOC_QUERIES = [
    "substring_dup_pairs", "substring_dup_spans", "doc_chunks",
    "doc_chunks_overlap", "doc_packs", "mixture_sampled_docs",
    "doc_token_stats", "doc_repetition_stats", "doc_quality_scores",
    "doc_langid", "doc_scrubbed", "doc_tfidf_top_terms",
    "token_doc_frequency", "docs_above_quality_cutoff", "doc_hash_sample",
    "docs_weighted_sample", "corpus_snapshot_diff", "doc_train_split",
    "doc_dedup_exact", "decontaminated_docs", "cross_corpus_contamination",
    "keyword_search_topk", "doc_lm_frequency_stats",
    "doc_lm_crossref_stats", "doc_dedup_normalized", "top_collocations",
]
EVENT_QUERIES = [
    "user_running_value", "user_running_value_scan", "user_trailing_value", "user_event_lead_ntile",
    "user_event_rank_dist", "user_event_paths", "user_event_last_nth",
    "user_centered_value", "user_hourly_range_value", "events_hourly_window",
    "events_sliding_window", "events_daily_active_users",
    "user_session_stats", "user_sessions", "events_stratified_sample",
    "user_event_ranks", "value_quantiles_exact", "value_quantiles_cont",
    "value_quantiles_by_type_exact", "value_quantiles_by_type_cont",
    "value_equidepth_histogram", "value_histogram", "value_rank_exact",
    "value_stats_by_type", "events_value_winsorized",
    "daily_type_counts_unpivot", "events_daily_type_pivot",
    "top_value_events", "user_top_event_type", "distinct_users_exact",
    "distinct_users_by_type_exact", "user_event_type_pairs_exact",
    "top_event_types_exact", "props_field_stats",
    "daily_value_anomalies", "events_rolling_7d_users",
    "user_cohort_retention", "events_funnel", "events_stickiness",
    "funnel_latency_quantiles", "event_type_transitions",
    "events_value_quartile_bin",
]
EMBEDDING_QUERIES = [
    # oracle-exact
    "embedding_similarity_join", "ann_threshold_cosine", "ann_topk_ids",
    "semantic_dedup_exact",
    # rows-only (recall/shape checked in tests/; here they must not crash)
    "ann_brute_cosine", "embedding_near_dup", "embedding_kmeans",
    "ann_ivf_cosine", "ann_pq_cosine", "ann_ivfpq_cosine", "ann_ivf_partitioned",
    "semantic_dedup_pruned",
]
RELATIONAL_QUERIES = [
    "revenue_by_nation", "lineitem_recent_pricing", "top_orders_per_customer",
    "lineitem_orders_bloom_semijoin", "auto_mktsegment_revenue",
    "building_orders_top_revenue", "order_priority_revenue",
    "orders_by_customer_nation", "orders_price_band", "revenue_cube",
    "revenue_rollup", "revenue_grouping_sets", "bloom_anti_join_open_orders",
    "customers_without_finished_orders", "lineitem_pricing_summary",
    "bucketed_priority_revenue", "lineitem_qty_price_corr",
    "event_users_customers_outer", "salted_event_spend_join",
    "bloom_click_users_semijoin", "cuckoo_signup_users_semijoin",
    "events_quality_audit",
]


def gen_documents(seed: int, outdir: str, n: int = 1500) -> None:
    rng = np.random.default_rng(seed)
    words = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
             "part", "hash", "merge", "batch", "émigré", "naïve", "Ω", "λ",
             "东京", "數據", "🎉", "a", "I", "x1", "-", "..."]
    texts: list[str] = []
    for _ in range(n):
        kind = rng.integers(0, 12)
        if kind == 0:
            texts.append("")
        elif kind == 1:
            texts.append("   ")
        elif kind == 2:
            texts.append(str(rng.choice(words)))
        elif kind == 3:  # around the gram-clamp width
            texts.append(" ".join(rng.choice(words, size=rng.integers(1, 9))))
        elif kind == 4:  # long repeated-token doc
            texts.append(" ".join([str(rng.choice(words))] * int(rng.integers(50, 400))))
        elif kind == 5:  # CJK no-space run
            texts.append("".join(rng.choice(list("东京數據分布式引擎草莓"),
                                            size=rng.integers(5, 60))))
        elif kind == 6:  # emoji / punctuation soup
            texts.append("".join(rng.choice(list("🎉!?.,;:()[]{}@#$%"),
                                            size=rng.integers(3, 40))))
        else:
            texts.append(" ".join(rng.choice(words, size=rng.integers(10, 120))))
    for _ in range(120):  # exact duplicates
        i, j = rng.integers(0, n, size=2)
        texts[j] = texts[i]
    for _ in range(120):  # shared-prefix near-duplicates
        i, j = rng.integers(0, n, size=2)
        texts[j] = texts[i][: max(1, len(texts[i]) // 2)] + " tail" + str(int(rng.integers(0, 5)))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array([str(rng.choice(["en", "fr", "de", "zh", "xx"])) for _ in range(n)]),
        "source": pa.array([str(rng.choice(["src0", "src1", "web", "books", "code"])) for _ in range(n)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(tbl, os.path.join(outdir, "documents.parquet"), row_group_size=200)


def gen_events(seed: int, outdir: str, n: int = 8000) -> None:
    rng = np.random.default_rng(seed)
    users = np.where(rng.random(n) < 0.3, 7,
                     rng.zipf(1.6, n).clip(1, 500)).astype(np.int64)
    types = rng.choice(["click", "view", "purchase", "signup", "error"],
                       size=n, p=[0.55, 0.2, 0.1, 0.05, 0.1])
    base = dt.datetime(2024, 1, 1)
    mins = np.sort(rng.integers(0, 60 * 24 * 14, size=n))
    ts = [base + dt.timedelta(minutes=int(m)) for m in mins]
    value = rng.choice([0.0, -5.25, 1.0, 1.0, 2.5, 99999.99, 42.0, 13.37],
                       size=n) + rng.integers(0, 3, size=n) * 0.25
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array([str(t) for t in types]),
        "value": pa.array(value, type=pa.float64()),
        "props": pa.array([f'{{"k": {int(k)}}}' for k in rng.integers(0, 10, size=n)]),
    })
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(tbl, os.path.join(outdir, "events.parquet"), row_group_size=1000)


def gen_relational(seed: int, outdir: str) -> None:
    """TPC-H-ish tables stressing join/aggregate edges: dates spiked
    exactly at the catalog's predicate cutoffs, dangling FKs both ways,
    empty dimension branches, and heavy key skew.  Also writes events
    (user_id range overlapping c_custkey) for the event⨝customer joins."""
    rng = np.random.default_rng(seed + 1000)
    os.makedirs(outdir, exist_ok=True)

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(regions),
    }), os.path.join(outdir, "region.parquet"))

    n_nat = 10
    # region 4 gets NO nations (empty dimension branch)
    nat_region = rng.integers(0, 4, size=n_nat).astype(np.int32)
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array(nat_region),
    }), os.path.join(outdir, "nation.parquet"))

    n_cust = 300
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, n_cust + 1)]),
        # nations 8,9 get no customers
        "c_nationkey": pa.array(rng.integers(0, 8, size=n_cust).astype(np.int32)),
        "c_acctbal": pa.array(rng.choice([-999.99, 0.0, 0.005, 1234.56, 9999.99], size=n_cust)),
        "c_mktsegment": pa.array([str(s) for s in rng.choice(segs, size=n_cust)]),
    }), os.path.join(outdir, "customer.parquet"), row_group_size=64)

    n_ord = 3000
    # 5% dangling custkeys (beyond n_cust); one customer owns ~25% of orders;
    # ~40 customers have no orders at all (keys 261..300 excluded)
    cust = np.where(rng.random(n_ord) < 0.25, 7,
                    rng.integers(1, 261, size=n_ord)).astype(np.int64)
    cust[rng.random(n_ord) < 0.05] = rng.integers(n_cust + 1, n_cust + 50)
    base = dt.datetime(1995, 1, 1)
    odate = [base + dt.timedelta(days=int(d)) for d in rng.integers(0, 2400, size=n_ord)]
    for i in np.flatnonzero(rng.random(n_ord) < 0.08):  # spike AT the cutoffs
        odate[i] = dt.datetime(1998, 1, 1) if rng.random() < 0.5 else dt.datetime(2000, 1, 1)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
        "o_custkey": pa.array(cust),
        "o_orderstatus": pa.array([str(s) for s in rng.choice(["F", "O", "P"], size=n_ord, p=[0.5, 0.45, 0.05])]),
        "o_totalprice": pa.array(np.round(rng.uniform(900.0, 500000.0, size=n_ord), 2)),
        "o_orderdate": pa.array(odate, type=pa.timestamp("us")),
        "o_orderpriority": pa.array([str(s) for s in rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], size=n_ord)]),
    }), os.path.join(outdir, "orders.parquet"), row_group_size=512)

    n_li = 9000
    # 4% dangling orderkeys; one order carries ~200 lineitems
    lord = rng.integers(1, n_ord + 1, size=n_li).astype(np.int64)
    lord[:200] = 42
    lord[rng.random(n_li) < 0.04] = rng.integers(n_ord + 1, n_ord + 100)
    sdate = [base + dt.timedelta(days=int(d)) for d in rng.integers(0, 2500, size=n_li)]
    for i in np.flatnonzero(rng.random(n_li) < 0.08):
        sdate[i] = dt.datetime(1998, 1, 1) if rng.random() < 0.5 else dt.datetime(2000, 1, 1)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lord),
        "l_partkey": pa.array(rng.integers(1, 2000, size=n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(1, 100, size=n_li).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, size=n_li).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, size=n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900.0, 105000.0, size=n_li), 2)),
        "l_discount": pa.array(rng.choice([0.0, 0.01, 0.05, 0.1], size=n_li)),
        "l_tax": pa.array(rng.choice([0.0, 0.02, 0.08], size=n_li)),
        "l_returnflag": pa.array([str(s) for s in rng.choice(["A", "N", "R"], size=n_li)]),
        "l_linestatus": pa.array([str(s) for s in rng.choice(["F", "O"], size=n_li)]),
        "l_shipdate": pa.array(sdate, type=pa.timestamp("us")),
    }), os.path.join(outdir, "lineitem.parquet"), row_group_size=1024)

    gen_events(seed + 1000, outdir)  # user_id range overlaps c_custkey


def gen_embeddings(seed: int, outdir: str, n: int = 500, dim: int = 64) -> None:
    """Adversarial embeddings: 10 tight clusters plus exact-duplicate
    vectors, near-antipodal vectors (negative cosine), and non-unit
    norms (0.01 / 5.0 — cosine must normalize).  The exact queries
    compare floats cross-engine at fixed thresholds (0.32, 0.42 for
    semantic_dedup_exact, 0.4422) and a top-10 rank cut, so generation
    REJECTS candidate tables where any
    relevant cosine sits within 5e-4 of a threshold or where a query's
    10th/11th neighbours are closer than 5e-4 — inside that guard the
    comparison is exact by construction, outside it would measure float
    noise, not correctness."""
    rng = np.random.default_rng(seed + 2000)
    for attempt in range(50):
        centers = rng.normal(size=(10, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.integers(0, 10, size=n).astype(np.int32)
        vecs = centers[labels] + 0.35 * rng.normal(size=(n, dim))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        for _ in range(30):  # exact duplicates
            i, j = rng.integers(0, n, size=2)
            vecs[j] = vecs[i]
            labels[j] = labels[i]
        for _ in range(10):  # near-antipodal pairs
            i, j = rng.integers(0, n, size=2)
            vecs[j] = -vecs[i] + 0.05 * rng.normal(size=dim)
            vecs[j] /= np.linalg.norm(vecs[j])
        scale = np.ones(n)
        scale[rng.integers(0, n, size=15)] = 0.01   # tiny-norm rows
        scale[rng.integers(0, n, size=15)] = 5.0    # large-norm rows
        v32 = (vecs * scale[:, None]).astype(np.float32)

        # margin guard on the float32-rounded values (what both engines read)
        unit = v32.astype(np.float64)
        unit /= np.linalg.norm(unit, axis=1, keepdims=True)
        sims_q3 = unit @ unit[:3].T        # ann_topk_ids / ann_threshold_cosine queries
        sims_q100 = unit @ unit[:100].T    # embedding_similarity_join query side
        sims_all = unit @ unit.T           # semantic_dedup_exact is all-pairs
        off_diag = sims_all[~np.eye(n, dtype=bool)]
        # the 0.42 guard covers ALL n^2/2 pairs, whose min distance to the
        # threshold is typically 1e-5..4e-4 — a 5e-4 margin there never
        # finds a table.  2e-6 suffices: BOTH engines compute the float64
        # cosine for this query (the twin casts ::DOUBLE[]), so the only
        # cross-engine term is the engine's f32-unit rounding, measured
        # <= 2e-8 on these tables (100x headroom).
        ok = (np.abs(sims_q3 - 0.32).min() > 5e-4
              and np.abs(sims_q100 - 0.4422).min() > 5e-4
              and np.abs(off_diag - 0.42).min() > 2e-6)
        if ok:
            for c in range(3):             # top-10 rank-cut gap per query
                s = np.sort(sims_q3[:, c])[::-1]
                if s[9] - s[10] <= 5e-4:
                    ok = False
                    break
        if ok:
            break
        seed_bump = int(rng.integers(0, 2**31))
        rng = np.random.default_rng(seed_bump)
    else:
        raise RuntimeError("embedding fuzz: no margin-safe table in 50 attempts")

    os.makedirs(outdir, exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in v32],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }), os.path.join(outdir, "embeddings.parquet"), row_group_size=128)


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    failed = []
    for seed in range(n_seeds):
        for fam, gen, queries in (("docs", gen_documents, DOC_QUERIES),
                                  ("events", gen_events, EVENT_QUERIES),
                                  ("relational", gen_relational, RELATIONAL_QUERIES),
                                  ("embeddings", gen_embeddings, EMBEDDING_QUERIES)):
            outdir = f"/tmp/gostatix_ray/fuzz_{fam}_s{seed}"
            gen(seed, outdir)
            proc = subprocess.run(
                [sys.executable, "-u", os.path.join(HERE, "check_oracles.py"),
                 outdir, *queries],
                capture_output=True, text=True,
            )
            ok = proc.returncode == 0 and "all checked queries passed" in proc.stdout
            print(f"[{'OK' if ok else 'FAIL'}] {fam} seed {seed}", flush=True)
            if not ok:
                failed.append((fam, seed))
                print(proc.stdout[-3000:])
    if failed:
        print("FAILED:", failed)
        return 1
    print(f"all {n_seeds} seeds x 4 families passed "
          f"({len(DOC_QUERIES)} doc + {len(EVENT_QUERIES)} event + "
          f"{len(RELATIONAL_QUERIES)} relational + "
          f"{len(EMBEDDING_QUERIES)} embedding queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
