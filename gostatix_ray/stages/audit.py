"""Data-quality audit — declarative constraint checks (the Deequ /
dbt-tests family) as ONE streaming pass over the table.

A production ingest pipeline asserts its contracts before training ever
sees the data: required columns non-null, keys unique, categoricals
drawn from a closed set, numerics in range, strings shaped right,
foreign keys resolvable.  ``quality_audit`` takes a list of check specs
and returns a tiny Dataset of ``(check_name, col, violations, total)``
rows — exact counts, not samples, so the result is SQL-twinnable
(each check is one ``count(*) FILTER`` / ``count DISTINCT`` row).

Scale shape (100 TB posture):

* Every streaming check (not_null / in_range / in_set / matches /
  ref_integrity) is a vectorized Arrow-kernel counter that collapses a
  block to ONE partial row — the exchange carries O(checks × blocks)
  rows, never the table.
* ``unique`` needs global distinct counts: each block emits its
  per-batch-DISTINCT 128-bit value hashes (slim 3-int rows — values
  never ride the wire) into one coarse bucket shuffle shared by ALL
  unique checks; per-bucket ``np.unique`` counts, tiny final sum.
  Same exactness contract as the dedup family: 128-bit hash equality
  stands in for value equality.
* The partial map runs ONCE over the input (check partials and unique
  hashes ride the same output block, tagged), so auditing never pays a
  second read; with no ``unique`` checks the shuffle is skipped
  entirely.
* ``ref_integrity`` key sets are broadcast once (``ray.put``) and
  resolved lazily once per worker — the dimension side must be the
  SMALL side (a few million keys); audit a big-big FK with
  ``joins.hash_join`` anti semantics instead.

The reference engine has no relational/audit surface (SURVEY.md §2.6);
this is a north-rule training-data extra, like ``stages/sample.py``.

Totals convention: ``not_null`` counts ALL rows; every other check
counts NON-NULL rows (SQL ``count(col)``) — nulls are the not_null
check's job, not double-billed to range/set/regex checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_STREAM_KINDS = {"not_null", "in_range", "in_set", "matches", "ref_integrity"}
_BROADCAST_INLINE_MAX = 4096  # key sets this small ship inside the pickle


def _normalize_keys(keys):
    ks = np.asarray(list(keys) if not isinstance(keys, np.ndarray) else keys)
    if ks.dtype.kind in "iu":
        return np.sort(ks.astype(np.int64))
    return np.unique(ks.astype(object))


class _AuditPartial:
    """Pickled-instance per-batch counter (stateless dispatch; lazy
    once-per-worker ``ray.get`` of broadcast ref-key sets — never an
    actor pool, per the repo's small-cluster deadlock rule)."""

    def __init__(self, specs, unique_cols):
        self._specs = specs  # [(kind, col, arg)] streaming checks
        self._unique = unique_cols
        self._resolved = None

    def _keys(self, arg):
        if self._resolved is None:
            self._resolved = {}
        if id(arg) not in self._resolved:
            if isinstance(arg, np.ndarray):
                ks = arg
            else:  # ObjectRef
                import ray

                ks = ray.get(arg)
            self._resolved[id(arg)] = ks
        return self._resolved[id(arg)]

    @staticmethod
    def _nonnull(col) -> int:
        return len(col) - col.null_count

    def __call__(self, batch: pa.Table):
        if batch.num_rows == 0:
            return
        kinds, names, cols, viols, tots, dists, h1s, h2s = (
            [], [], [], [], [], [], [], [])

        def emit(name, col, v, t, kind="c", d=0, h1=0, h2=0):
            kinds.append(kind); names.append(name); cols.append(col)
            viols.append(v); tots.append(t); dists.append(d)
            h1s.append(h1); h2s.append(h2)

        for kind, col, arg in self._specs:
            arr = batch[col]
            t = self._nonnull(arr)
            if kind == "not_null":
                emit(kind, col, arr.null_count, batch.num_rows)
                continue
            if t == 0:
                emit(kind, col, 0, 0)
                continue
            if kind == "in_range":
                lo, hi = arg
                ok = pc.and_(pc.greater_equal(arr, pa.scalar(lo)),
                             pc.less_equal(arr, pa.scalar(hi)))
                n_ok = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
            elif kind == "in_set":
                # is_in -> false for nulls, so the sum counts non-null hits
                ok = pc.is_in(arr, value_set=pa.array(list(arg)))
                n_ok = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
            elif kind == "matches":
                ok = pc.match_substring_regex(pc.cast(arr, pa.string()), arg)
                n_ok = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
            else:  # ref_integrity
                ks = self._keys(arg)
                x = arr.drop_null().to_numpy(zero_copy_only=False)
                if len(ks) == 0:
                    n_ok = 0
                elif ks.dtype.kind in "iu":
                    x = x.astype(np.int64)
                    idx = np.minimum(np.searchsorted(ks, x), len(ks) - 1)
                    n_ok = int((ks[idx] == x).sum())
                else:
                    n_ok = int(np.isin(x.astype(object), ks).sum())
            emit(kind, col, t - n_ok, t)

        if self._unique:
            from ..hashing import hash128_keyed

            for col in self._unique:
                arr = batch[col]
                t = self._nonnull(arr)
                emit("unique", col, 0, t)  # totals ride the check row
                if t == 0:
                    continue
                nn = arr.drop_null()
                h1, h2 = hash128_keyed(pc.cast(nn, pa.string()), 97)
                pairs = np.unique(np.stack([h1, h2], axis=1), axis=0)
                n = len(pairs)
                kinds.extend(["u"] * n); names.extend(["unique"] * n)
                cols.extend([col] * n); viols.extend([0] * n)
                tots.extend([0] * n); dists.extend([0] * n)
                h1s.extend(((pairs[:, 0] >> np.uint64(1)).astype(np.int64)).tolist())
                h2s.extend(((pairs[:, 1] >> np.uint64(1)).astype(np.int64)).tolist())

        yield pa.table({
            "kind": pa.array(kinds, pa.string()),
            "check_name": pa.array(names, pa.string()),
            "col": pa.array(cols, pa.string()),
            "violations": pa.array(viols, pa.int64()),
            "total": pa.array(tots, pa.int64()),
            "distinct": pa.array(dists, pa.int64()),
            "h1": pa.array(h1s, pa.int64()),
            "h2": pa.array(h2s, pa.int64()),
        })


def _bucket_combine(df: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket shrink: sum check partials, np.unique the hash rows."""
    outs = []
    c = df[df["kind"] == "c"]
    if len(c):
        g = (c.groupby(["check_name", "col"], as_index=False)
             [["violations", "total", "distinct"]].sum())
        outs.append(g)
    u = df[df["kind"] == "u"]
    if len(u):
        d = (u.drop_duplicates(["col", "h1", "h2"])
             .groupby("col").size())
        outs.append(pd.DataFrame({
            "check_name": "unique", "col": d.index.to_numpy(),
            "violations": 0, "total": 0, "distinct": d.to_numpy()}))
    out = pd.concat(outs, ignore_index=True)
    out["kind"] = "c"
    out["h1"] = 0
    out["h2"] = 0
    return out[["kind", "check_name", "col", "violations", "total",
                "distinct", "h1", "h2"]].astype(
        {"violations": "int64", "total": "int64", "distinct": "int64",
         "h1": "int64", "h2": "int64"})


def _finalize(df: pd.DataFrame) -> pd.DataFrame:
    g = (df.groupby(["check_name", "col"], as_index=False)
         [["violations", "total", "distinct"]].sum())
    g["violations"] = np.where(
        g["check_name"] == "unique", g["total"] - g["distinct"],
        g["violations"]).astype(np.int64)
    g["total"] = g["total"].astype(np.int64)
    return (g[["check_name", "col", "violations", "total"]]
            .sort_values(["check_name", "col"])
            .reset_index(drop=True))


def quality_audit(ds, checks, *, num_buckets: int = 64):
    """Run declarative constraint checks over ``ds`` in one pass.

    ``checks`` — list of specs:

    * ``("not_null", col)`` — violations: NULL rows (total: all rows)
    * ``("unique", col)`` — violations: non-null rows beyond the first
      per distinct value (``count(col) - count(DISTINCT col)``)
    * ``("in_range", col, lo, hi)`` — non-null rows outside [lo, hi]
    * ``("in_set", col, values)`` — non-null rows not in ``values``
    * ``("matches", col, pattern)`` — non-null rows the RE2 pattern
      does not match anywhere (SQL twin: ``NOT regexp_matches``)
    * ``("ref_integrity", col, keys)`` — non-null rows whose value is
      absent from ``keys`` (an iterable of valid dimension keys; big
      sets are broadcast once via ``ray.put``)

    Returns a Dataset of ``(check_name, col, violations, total)`` rows,
    one per check, sorted by (check_name, col).
    """
    import ray

    if not checks:
        raise ValueError("quality_audit: no checks given")
    specs, unique_cols = [], []
    for spec in checks:
        kind = spec[0]
        if kind == "unique":
            unique_cols.append(spec[1])
        elif kind == "not_null":
            specs.append((kind, spec[1], None))
        elif kind == "in_range":
            specs.append((kind, spec[1], (spec[2], spec[3])))
        elif kind in ("in_set", "matches"):
            specs.append((kind, spec[1], spec[2]))
        elif kind == "ref_integrity":
            ks = _normalize_keys(spec[2])
            arg = ks if len(ks) <= _BROADCAST_INLINE_MAX else ray.put(ks)
            specs.append((kind, spec[1], arg))
        else:
            raise ValueError(f"quality_audit: unknown check kind {kind!r}")
    seen = set()
    for spec in checks:
        key = (spec[0], spec[1])
        if key in seen:
            raise ValueError(f"quality_audit: duplicate check {key}")
        seen.add(key)

    partials = ds.map_batches(
        _AuditPartial(specs, unique_cols),
        batch_format="pyarrow", batch_size=None)

    if unique_cols:
        from .dedup import bucketed_groupby

        partials = bucketed_groupby(
            partials, ["h1"], _bucket_combine, num_buckets=num_buckets)

    return (partials.repartition(1)
            .map_batches(_finalize, batch_format="pandas", batch_size=None))
