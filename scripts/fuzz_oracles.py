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
    "doc_dedup_exact", "decontaminated_docs", "cross_corpus_contamination",
]
EVENT_QUERIES = [
    "user_running_value", "user_trailing_value", "user_event_lead_ntile",
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


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    failed = []
    for seed in range(n_seeds):
        for fam, gen, queries in (("docs", gen_documents, DOC_QUERIES),
                                  ("events", gen_events, EVENT_QUERIES)):
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
    print(f"all {n_seeds} seeds x 2 families passed "
          f"({len(DOC_QUERIES)} doc + {len(EVENT_QUERIES)} event queries, bit-exact)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
