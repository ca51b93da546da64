"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + schema column names + order-insensitive value equality).

Usage: python scripts/check_oracles.py [sf_dir] [name ...] [--json PATH]

``--json PATH`` additionally writes one record per checked query
(status ok/rows/fail/err, row counts, columns, seconds) — the
round-end full-catalog artifact (ORACLES_FULL_rN.json) so judges see
the queries outside the driver's 50-row gate without re-running.
"""

from __future__ import annotations

import functools
import os
import sys
import time

print = functools.partial(print, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df):
    import numpy as np
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    import duckdb
    import ray

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    records = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            records[name] = {"status": "err", "error": f"{type(e).__name__}: {e}"}
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            records[name] = {"status": "rows", "rows": len(ours),
                             "cols": list(ours.columns), "secs": round(dt, 2)}
            print(f"[rows] {name}: {len(ours)} rows, cols={list(ours.columns)} ({dt:.1f}s)")
            continue
        theirs = normalize(con.sql(oracles[name]).df())
        ok_cols = list(ours.columns) == list(theirs.columns)
        ok_rows = len(ours) == len(theirs)
        ok_vals = ok_cols and ok_rows and ours.equals(theirs)
        status = "OK  " if ok_vals else "FAIL"
        if not ok_vals:
            failures.append(name)
        records[name] = {"status": "ok" if ok_vals else "fail",
                         "rows": len(ours), "oracle_rows": len(theirs),
                         "cols_match": ok_cols, "values_match": bool(ok_vals),
                         "secs": round(dt, 2)}
        print(f"[{status}] {name}: rows {len(ours)}/{len(theirs)} cols_match={ok_cols} ({dt:.1f}s)")
        if not ok_vals and ok_cols and ok_rows:
            neq = ~(ours == theirs).all(axis=1)
            print("  first diffs (ours vs oracle):")
            print(ours[neq].head(3))
            print(theirs[neq].head(3))
        elif not ok_cols:
            print(f"  ours cols: {list(ours.columns)}  oracle cols: {list(theirs.columns)}")
    ray.shutdown()
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_checked": len(records),
                       "n_failures": len(failures), "queries": records}, f, indent=1)
        print(f"wrote {json_path} ({len(records)} records)")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries passed")


if __name__ == "__main__":
    main()
