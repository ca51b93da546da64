"""Deterministic scale-up of the TPC-H-ish testdata tables.

The driver ships sf0.001/0.01/0.1; the relational planner's
broadcast-vs-shuffle and Bloom-crossover decisions deserve at least one
10x data point (round-4 verdict #5), so ``scale_tables`` replicates a
source scale factor K times with JOIN-STRUCTURE-PRESERVING key offsets:
copy ``i`` shifts every orderkey by ``i * orderkey_span`` and every
custkey by ``i * custkey_span`` on BOTH sides of each relationship, so
per-key join fan-outs (lines per order, orders per customer) are
exactly those of the source — the scaled tables stress data volume,
not a different join shape.  Non-key attribute columns are copied
verbatim.  Output is one parquet file per (table, copy) under
``<out_dir>/<table>.parquet/`` so readers shard naturally and a
partial generation can resume per file.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: key columns shifted per copy, per table: {table: {col: span_source}}
#: span_source names the (table, column) whose max+1 defines the span.
_KEY_SHIFTS = {
    "lineitem": {"l_orderkey": ("orders", "o_orderkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "customer": {"c_custkey": ("customer", "c_custkey")},
}


def scale_tables(src_dir: str, out_dir: str, factor: int,
                 tables: tuple = ("lineitem", "orders", "customer")) -> str:
    """Materialize ``factor``x copies of ``tables`` under ``out_dir``.

    Idempotent/resumable: each (table, copy) is one atomically-renamed
    parquet file, and existing files are skipped — rerunning after a
    kill finishes the remainder.  Returns ``out_dir``.
    """
    spans: dict[tuple, int] = {}

    def _span(table: str, col: str) -> int:
        key = (table, col)
        if key not in spans:
            t = pq.read_table(os.path.join(src_dir, f"{table}.parquet"), columns=[col])
            spans[key] = int(pc.max(t[col]).as_py()) + 1
        return spans[key]

    for table in tables:
        src = pq.read_table(os.path.join(src_dir, f"{table}.parquet"))
        tdir = os.path.join(out_dir, f"{table}.parquet")
        os.makedirs(tdir, exist_ok=True)
        shifts = _KEY_SHIFTS.get(table, {})
        for i in range(factor):
            dst = os.path.join(tdir, f"copy_{i:03d}.parquet")
            if os.path.exists(dst):
                continue
            cols = {}
            for name in src.column_names:
                col = src[name]
                if name in shifts and i > 0:
                    off = i * _span(*shifts[name])
                    col = pc.add(col, pa.scalar(off, type=pa.int64()))
                    col = col.cast(src.schema.field(name).type)
                cols[name] = col
            tmp = dst + ".tmp"
            pq.write_table(pa.table(cols, schema=src.schema), tmp)
            os.rename(tmp, dst)
    return out_dir


def ensure_sf1(src_dir: str = "/root/testdata/sf0.1",
               out_dir: str = "/tmp/gostatix_ray/sf1") -> str:
    """The cached 10x (sf1-equivalent) relational tables."""
    return scale_tables(src_dir, out_dir, 10)
