#!/usr/bin/env python
"""Published-error-bound evidence report: build every sketch through the
REAL engine path (fused read -> SketchBuilder -> combiner tree -> merge)
over testdata parquet, compare each estimate against the exact answer
(DuckDB on the same files), and check the algorithm's published bound:

* HLL   — relative error 1.04/sqrt(m) (Flajolet et al. 2007); checked at
          m = 2^10 / 2^12 / 2^14 against 3 sigma.
* CMS   — overestimate only, count_hat <= count + eps*N with prob 1-delta,
          eps = e/w, delta = (1/2)^d (Cormode-Muthukrishnan 2005);
          `count_min_sketch.go:44-52` sizing.
* Bloom — observed FPP on non-members <= ~1.5x configured p
          (`bloom_filter.go:84-89` sizing); never a false negative.
* Top-K — the sketch's top-k set equals the exact top-k (CMS+heap,
          `top_k.go:95-134`).
* t-digest / KLL — rank error of returned quantiles; KLL's bound is
          ~O(1/k) normalized rank (Karnin-Lang-Liberty 2016), t-digest
          is tightest at the tails (Dunning 2019).

Writes BOUNDS.md at the repo root and prints one JSON line.

Usage: python scripts/bounds_report.py [sf_dir]   (default sf0.1)
Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gostatix_ray.kernels import bloom, cms, hll, kll, tdigest, topk  # noqa: E402
from gostatix_ray.stages.build import SketchRequest, build_partials, tokens_of  # noqa: E402
from gostatix_ray.stages.merge import collect_final, full_throttle_dataset, merge_partials_streaming  # noqa: E402


def one_state(ds, req, conc=8):
    partials = build_partials(full_throttle_dataset(ds), [req], concurrency=conc)
    final = collect_final(merge_partials_streaming(partials))
    from gostatix_ray.registry import kernel_for

    return kernel_for(req.kind).from_bytes(final[(req.name, "")])


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    con = duckdb.connect()
    ev = os.path.join(sf_dir, "events.parquet")
    docs = os.path.join(sf_dir, "documents.parquet")
    rows: list[dict] = []

    def read(path, cols):
        from gostatix_ray.sources.pq_read import clean_read_parquet

        return clean_read_parquet(path, columns=cols)

    # ---- HLL ---------------------------------------------------------------
    exact_users = con.sql(f"SELECT count(DISTINCT user_id) FROM '{ev}'").fetchone()[0]
    for logm in (10, 12, 14):
        m = 1 << logm
        st = one_state(read(ev, ["user_id"]),
                       SketchRequest("h", "hll", hll.HLLSpec(m=m),
                                     on=lambda b: pc.cast(b["user_id"], pa.string())))
        est = float(hll.count(st))
        rel = abs(est - exact_users) / exact_users
        bound = 1.04 / np.sqrt(m)
        rows.append(dict(sketch=f"HLL m=2^{logm}", metric="distinct user_id",
                         exact=exact_users, estimate=round(est, 1),
                         observed=f"{rel:.4%} rel err", bound=f"3*1.04/sqrt(m) = {3*bound:.4%}",
                         ok=bool(rel <= 3 * bound)))

    # ---- CMS ---------------------------------------------------------------
    tok_exact = con.sql(
        f"SELECT token, count(*) c FROM (SELECT unnest(string_split(text,' ')) AS token "
        f"FROM '{docs}') GROUP BY token ORDER BY c DESC"
    ).df()
    N = int(tok_exact["c"].sum())
    for eps_target, d in ((0.001, 5), (0.0001, 7)):
        spec = cms.CMSSpec.from_error_rate(eps_target, 0.5 ** d)
        st = one_state(read(docs, ["text"]),
                       SketchRequest("c", "cms", spec, on=tokens_of("text")))
        probe = tok_exact.head(2000)
        est = cms.count(st, pa.array(probe["token"].astype(str)))
        over = est - probe["c"].to_numpy()
        eps = spec.error_bound_eps()
        rows.append(dict(sketch=f"CMS w={spec.columns} d={spec.rows}",
                         metric=f"{len(probe)} token counts (N={N})",
                         exact="-", estimate="-",
                         observed=f"max over-count {int(over.max())}, under-counts {int((over < 0).sum())}",
                         bound=f"over <= eps*N = {eps * N:.1f} w.p. {1 - spec.failure_probability():.5f}; never under",
                         ok=bool(over.min() >= 0 and (over <= eps * N).all())))

    # ---- Bloom -------------------------------------------------------------
    members = con.sql(f"SELECT DISTINCT user_id FROM '{ev}' WHERE event_type='click'").df()["user_id"].to_numpy()
    p_cfg = 0.01
    spec = bloom.BloomSpec.from_params(max(len(members), 1), p_cfg)
    st = one_state(
        read(ev, ["user_id", "event_type"]).filter(lambda r: r["event_type"] == "click"),
        SketchRequest("b", "bloom", spec, on=lambda b: pc.cast(b["user_id"], pa.string())))
    non_members = np.setdiff1d(np.arange(10 ** 7, 10 ** 7 + 20000), members)
    fp = bloom.contains(st, pa.array(non_members.astype(str))).mean()
    fn = (~bloom.contains(st, pa.array(members.astype(str)))).sum()
    rows.append(dict(sketch=f"Bloom n={len(members)} p={p_cfg}", metric="click-user membership",
                     exact="-", estimate="-",
                     observed=f"FPP {fp:.4f}, false negatives {int(fn)}",
                     bound=f"FPP <= ~1.5*p = {1.5 * p_cfg}; FN = 0",
                     ok=bool(fn == 0 and fp <= 1.5 * p_cfg)))

    # ---- KMV (bottom-k / theta) ---------------------------------------------
    from gostatix_ray.kernels import kmv

    k = 1024
    st = one_state(read(ev, ["user_id"]),
                   SketchRequest("k", "kmv", kmv.KMVSpec(k=k),
                                 on=lambda b: pc.cast(b["user_id"], pa.string())))
    est = kmv.estimate(st)
    rel = abs(est - exact_users) / exact_users
    rse = kmv.KMVSpec(k=k).relative_standard_error()
    rows.append(dict(sketch=f"KMV k={k}", metric="distinct user_id",
                     exact=exact_users, estimate=round(est, 1),
                     observed=f"{rel:.4%} rel err",
                     bound=f"3/sqrt(k-2) = {3 * rse:.4%}" + (" (exact below k)" if est == exact_users else ""),
                     ok=bool(rel <= 3 * rse)))

    # ---- Top-K -------------------------------------------------------------
    top_exact = con.sql(
        f"SELECT event_type, count(*) c FROM '{ev}' GROUP BY event_type ORDER BY c DESC, event_type LIMIT 3"
    ).df()
    st = one_state(read(ev, ["event_type"]),
                   SketchRequest("t", "topk",
                                 topk.TopKSpec(k=3, error_rate=0.0001, accuracy=0.01),
                                 on="event_type"))
    got = [v for v, _ in topk.values(st)]
    rows.append(dict(sketch="TopK k=3 (CMS+heap)", metric="top event_type set",
                     exact=",".join(top_exact["event_type"]), estimate=",".join(got),
                     observed="sets " + ("equal" if set(got) == set(top_exact["event_type"]) else "DIFFER"),
                     bound="top-k set recovery", ok=bool(set(got) == set(top_exact["event_type"]))))

    # ---- quantiles: t-digest + KLL ------------------------------------------
    vals = con.sql(f"SELECT value FROM '{ev}' ORDER BY value").df()["value"].to_numpy()
    n = len(vals)
    for kind, spec_obj, rank_bound in (
        ("tdigest delta=200", tdigest.TDigestSpec(200.0), 0.01),
        # KLL eps ~ C/k with C≈1.65 at one sigma (Karnin-Lang-Liberty
        # 2016 §5); we assert the 2-sigma envelope 3.3/k = 0.0165
        ("kll k=200", kll.KLLSpec(k=200), 3.3 / 200),
    ):
        st = one_state(read(ev, ["value"]), SketchRequest("q", kind.split()[0], spec_obj, on="value"))
        mod = tdigest if kind.startswith("tdigest") else kll
        qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
        est = np.asarray(mod.quantile(st, qs), dtype=np.float64)
        ranks = np.searchsorted(vals, est, side="right") / n
        err = float(np.abs(ranks - qs).max())
        bound_txt = ("tail-tight eps <= 0.01 (Dunning 2019)" if kind.startswith("tdigest")
                     else f"2-sigma envelope 3.3/k = {rank_bound}")
        rows.append(dict(sketch=kind, metric="value quantiles q=1/10/50/90/99%",
                         exact="-", estimate="-",
                         observed=f"max rank error {err:.5f}",
                         bound=bound_txt, ok=bool(err <= rank_bound)))

    # ---- DDSketch: relative-VALUE error (Masson et al. VLDB'19) -------------
    from gostatix_ray.kernels import ddsketch

    alpha = 0.01
    st = one_state(read(ev, ["value"]),
                   SketchRequest("q", "ddsketch", ddsketch.DDSpec(alpha=alpha),
                                 on="value"))
    qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
    est = np.asarray(ddsketch.quantile(st, qs), dtype=np.float64)
    k = np.clip(np.ceil(qs * n).astype(np.int64), 1, n)
    exact_q = vals[k - 1]
    rel = np.abs(est - exact_q) / np.maximum(np.abs(exact_q), 1e-300)
    ok = bool((np.abs(est - exact_q)
               <= alpha * np.abs(exact_q) * (1 + 1e-9) + 1e-9).all()
              and not st.collapsed)
    rows.append(dict(sketch=f"ddsketch alpha={alpha}",
                     metric="value quantiles q=1/10/50/90/99%",
                     exact="-", estimate="-",
                     observed=f"max rel value error {float(rel.max()):.5f}",
                     bound=f"relative error <= alpha = {alpha} (uncollapsed)",
                     ok=ok))

    # ---- render -------------------------------------------------------------
    df = pd.DataFrame(rows)
    all_ok = bool(df["ok"].all())
    lines = [
        "# BOUNDS — estimates vs published error bounds",
        "",
        f"Input: `{sf_dir}` (events {con.sql(f'SELECT count(*) FROM {chr(39)}{ev}{chr(39)}').fetchone()[0]:,} rows).",
        "Every sketch built through the full engine path (fused parquet read ->",
        "`SketchBuilder` -> combiner tree -> merged state); exact answers from DuckDB",
        "on the same files.  Regenerate: `python scripts/bounds_report.py [sf_dir]`.",
        "",
        "| sketch | measured | observed | published bound | ok |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['sketch']} | {r['metric']} | {r['observed']} | {r['bound']} | "
                     f"{'PASS' if r['ok'] else '**FAIL**'} |")
    lines += ["", f"**{int(df['ok'].sum())}/{len(df)} bounds hold.**", ""]
    with open(os.path.join(REPO, "BOUNDS.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"sf_dir": sf_dir, "checks": len(rows), "all_ok": all_ok}))
    ray.shutdown()
    if not all_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
