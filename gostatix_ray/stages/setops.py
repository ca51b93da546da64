"""Distributed DISTINCT set operations (INTERSECT / EXCEPT / UNION) on keys.

The reference engine answers approximate set questions with its filters
(Bloom/Cuckoo membership, HLL cardinality — `/root/reference/bloom_filter.go`,
`hyperloglog.go`); this stage supplies the *exact* relational twins so
both layers can be cross-checked (SURVEY.md §2.6 engine side, north-rule
extra).  Pairs with the HLL inclusion–exclusion estimate in
pipelines/catalog.py (q_hll_users_intersection): |A∩B| ≈ |A|+|B|−|A∪B|
where the union sketch is just `hll.merge(a, b)` — sketch algebra the
exact path here validates.

Scale shape: each side collapses to its per-batch DISTINCT key rows with
a side bit (map-side combine — the shuffle moves one slim key row per
distinct key per block, not raw rows), the two datasets union, and ONE
coarse-bucket shuffle (dedup.bucketed_groupby) ORs the side bits per key
and filters: 3 = intersect, 1 = except (A\\B), any = union.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import bucketed_groupby

_OPS = {"intersect": 3, "except": 1, "union": 0}


def _combined_codes(df: "pd.DataFrame", keys) -> "np.ndarray":
    """Composite-key group ids, overflow-safe.

    Per-column factorized codes are packed pairwise with RE-COMPACTION
    after every step: the naive running product ``comb*len(uniq)+codes``
    silently wraps int64 once three-plus high-cardinality columns
    multiply out past 2^63, colliding distinct keys.  Re-factorizing
    keeps ``comb < len(df)``, so each pack is bounded by
    ``len(df) * len(uniq) <= len(df)^2`` — safe for any bucket under
    ~3e9 rows.  NULLs get a REAL code (use_na_sentinel=False): the -1
    sentinel would make (g, NULL) collide with (g-1, last_code), and
    SQL set ops treat NULLs as equal-to-each-other keys.
    """
    comb = None
    for c in keys:
        codes, uniq = pd.factorize(df[c], use_na_sentinel=False)
        if comb is None:
            comb = codes.astype(np.int64)
        else:
            packed = comb * np.int64(len(uniq)) + codes.astype(np.int64)
            comb = pd.factorize(packed)[0].astype(np.int64)
    return comb


def key_set_op(ds_a, ds_b, *, key, op: str, num_buckets: int = 64):
    """DISTINCT keys of ``op`` applied to two Datasets' ``key`` column(s).

    ``key``: one column name or a list of them (composite key).
    ``op``: ``"intersect"`` (A ∩ B), ``"except"`` (A \\ B, SQL EXCEPT),
    ``"union"`` (A ∪ B).  Returns a Dataset holding each qualifying key
    row exactly once, original dtypes, key column names preserved.
    """
    if op not in _OPS:
        raise ValueError(f"op must be one of {sorted(_OPS)}, got {op!r}")
    keys = [key] if isinstance(key, str) else list(key)

    def _tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            distinct = batch.select(keys).group_by(keys).aggregate([])
            return distinct.append_column(
                "__side", pa.array(np.full(distinct.num_rows, side, np.int8))
            )
        return fn

    tagged = ds_a.map_batches(_tag(1), batch_format="pyarrow").union(
        ds_b.map_batches(_tag(2), batch_format="pyarrow")
    )
    want = _OPS[op]

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized group id per composite key (see _combined_codes
        # for the overflow + NULL story)
        comb = _combined_codes(df, keys)
        ucomb, first_idx = np.unique(comb, return_index=True)
        gcodes = np.searchsorted(ucomb, comb)
        tags = np.zeros(len(ucomb), dtype=np.int8)
        np.bitwise_or.at(tags, gcodes, df["__side"].to_numpy())
        keep = np.ones(len(ucomb), dtype=bool) if want == 0 else tags == want
        return df.iloc[first_idx[keep]][keys].reset_index(drop=True)

    return bucketed_groupby(tagged, keys, _reduce, num_buckets=num_buckets)


def distinct_count(ds, keys, *, num_buckets: int = 32) -> int:
    """Exact COUNT(DISTINCT keys) without Ray's sort-based groupby
    (pathological on many tiny groups — CLAUDE.md): per-batch distinct
    rows map-side, one coarse-bucket shuffle, per-bucket vectorized
    unique count, one tiny scalar sum."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def _distinct(batch: pa.Table) -> pa.Table:
        return batch.select(keys).group_by(keys).aggregate([])

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        comb = _combined_codes(df, keys)
        return pd.DataFrame({"n": np.array([len(np.unique(comb))], dtype=np.int64)})

    parts = bucketed_groupby(ds.map_batches(_distinct, batch_format="pyarrow"),
                             keys, _count, num_buckets=num_buckets)
    return int(parts.sum("n"))
