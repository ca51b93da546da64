"""Empty-input robustness sweep: run EVERY catalog query over a
zero-row corpus (all ten driver tables, correct schemas, 0 rows) and
report crashes.

A 100 TB pipeline routinely meets empty partitions — an empty day, a
filter that kills a shard, a new-crawl diff with nothing new.  Stages
must either return an empty (schema-stable) result or raise a
DOCUMENTED ValueError for genuinely undefined requests (e.g. exact
quantiles of zero rows); anything else (KeyError, IndexError, numpy
shape errors, Arrow cast crashes) is a latent production bug.

Usage: python scripts/empty_probe.py [name ...]
Writes the empty tables under /tmp/gostatix_ray/sf_empty and prints
one line per query: ok (n rows) / VALUEERROR (accepted, message) /
CRASH (traceback head).  Exit 1 iff any CRASH.
"""

from __future__ import annotations

import functools
import os
import sys
import traceback

print = functools.partial(print, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
SRC = "/root/testdata/sf0.001"
DST = "/tmp/gostatix_ray/sf_empty"


def make_empty_dir() -> str:
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        out = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(out):
            continue
        schema = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), out)
    return DST


def main(names: list[str]) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sf = make_empty_dir()
    from gostatix_ray.pipelines import catalog

    todo = names or list(catalog.QUERIES)
    crashes = []
    for name in todo:
        fn = catalog.QUERIES[name]
        try:
            res = fn(sf)
            try:
                import pandas as pd
                import pyarrow as pa

                if isinstance(res, pd.DataFrame):
                    n = len(res)
                elif isinstance(res, pa.Table):
                    n = res.num_rows
                else:
                    n = res.count()
                print(f"[ok   ] {name}: {n} rows")
            except Exception:
                raise
        except ValueError as e:
            print(f"[value] {name}: {str(e).splitlines()[0][:100]}")
        except Exception as e:
            crashes.append(name)
            head = traceback.format_exc().strip().splitlines()
            print(f"[CRASH] {name}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120] if str(e) else ''}")
            for ln in head[-3:]:
                print(f"        {ln[:150]}")
    print(f"\n{len(todo)} queries: {len(crashes)} crashes"
          + (f" -> {crashes}" if crashes else ""))
    ray.shutdown()
    return 1 if crashes else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
