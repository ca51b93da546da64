"""Deterministic sampling — hash-fraction and stratified per-group
sampling for training-data pipelines.

Sampling at 100 TB must be (a) a pure per-batch filter — no shuffle, no
RNG state, so reruns and task retries agree row-for-row — and (b)
exactly checkable.  Both follow from a Knuth multiplicative hash over a
non-negative integer key:

    h(k) = (k * 2654435761) mod 2^32

exact integer arithmetic every engine reproduces bit-identically
(DuckDB twin: ``(CAST(k AS HUGEINT) * 2654435761) % 4294967296``), with
well-mixed low bits for uniform selection.  ``hash_sample`` keeps rows
with h(k) below fraction·2^32 — embarrassingly parallel, zero exchange.
``stratified_sample`` keeps the k smallest-h rows PER GROUP (a
deterministic "uniform k per stratum"): it rides stages/rank.py's
grouped_topk, so every block pre-prunes to ≤k rows per group it sees
before the single coarse-bucket shuffle — the exchange carries
O(k · groups/block · blocks) rows, never the table.

The reference engine has no sampling operators (SURVEY.md §2.6 — engine
side); these are north-rule training-data extras.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNUTH = np.uint64(2654435761)
MOD_BITS = 32
_MOD = np.uint64(1) << np.uint64(MOD_BITS)

HKEY_COL = "__hkey"


def hash_threshold(fraction: float) -> int:
    """The inclusive-exclusive cut: keep rows with h(k) < threshold.
    Use this SAME integer literal in any SQL twin."""
    return int(fraction * float(1 << MOD_BITS))


def hashed_keys(arr: np.ndarray) -> np.ndarray:
    """h(k) for a non-negative integer key array (uint64 wraparound is
    exact and deterministic; negative keys would disagree with SQL's
    HUGEINT arithmetic — rejected)."""
    a = np.asarray(arr)
    if a.dtype.kind == "i" and len(a) and a.min() < 0:
        raise ValueError("hash_sample keys must be non-negative integers")
    return (a.astype(np.uint64) * KNUTH) % _MOD


def hash_sample(ds, *, key_col: str, fraction: float):
    """Keep ~fraction of rows, chosen deterministically by key hash.

    Pure per-batch filter: no shuffle, no state, retry-stable, and the
    SAME rows are selected regardless of partitioning or cluster size.
    Repeated keys are kept/dropped together (sampling is by key).
    """
    thresh = np.uint64(hash_threshold(fraction))

    def _filter(batch: pa.Table) -> pa.Table:
        h = hashed_keys(batch[key_col].to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(h < thresh))

    return ds.map_batches(_filter, batch_format="pyarrow")


def weighted_sample(ds, *, key_col: str, weight_col: str, rate: float):
    """Weighted Bernoulli (Poisson) sampling: keep each row with
    inclusion probability ``min(1, weight * rate)``, decided
    deterministically by the same Knuth hash cut as ``hash_sample`` —
    the survey-sampling primitive behind length/quality-proportional
    corpus selection ("sample documents ∝ token count").

    Pure per-batch filter (no shuffle, retry-stable, partitioning-
    independent), and selections NEST across rates: the kept set at
    rate r is a subset of the kept set at any r' > r (same hash, larger
    per-row threshold) — re-tuning the budget never churns rows.

    Exactness: keep iff ``h(key) < min(2^32, floor(weight·rate·2^32))``
    — all-integer compare.  For a BIT-EXACT SQL twin prefer a dyadic
    ``rate`` (k/2^m, e.g. 1/512): then ``weight·rate·2^32`` is exact in
    BOTH float64 and SQL decimal arithmetic, so the twin
    ``h < LEAST(CAST(floor(w * rate * 4294967296) AS HUGEINT),
    4294967296)`` matches row-for-row regardless of how the engine
    parses the literal.  NULL weights drop (SQL: NULL compare is not
    true); negative weights drop (threshold < 0).
    """
    def _filter(batch: pa.Table) -> pa.Table:
        h = hashed_keys(batch[key_col].to_numpy(zero_copy_only=False))
        w = pc.fill_null(pc.cast(batch[weight_col], pa.float64()), -1.0
                         ).to_numpy(zero_copy_only=False)
        t = np.minimum(np.floor(w * rate * float(_MOD)), float(_MOD))
        keep = h.astype(np.float64) < t  # both sides < 2^53: exact
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow", batch_size=None)


def split_thresholds(fractions: dict[str, float]) -> tuple[list[str], np.ndarray]:
    """Labels + cumulative integer hash cuts for ``hash_split``.
    Use these SAME integer literals in any SQL twin
    (``CASE WHEN h < t1 THEN l1 WHEN h < t2 THEN l2 ... ELSE l_last``)."""
    labels = list(fractions)
    if len(labels) < 2:
        raise ValueError("hash_split needs at least two labels")
    fr = np.array([float(fractions[l]) for l in labels])
    if (fr < 0).any() or abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError(
            f"hash_split fractions must be non-negative and sum to 1, got {fr.sum()!r}")
    cum = np.cumsum(fr)[:-1]  # the last label takes everything above
    return labels, np.array([hash_threshold(c) for c in cum], dtype=np.uint64)


def hash_split(ds, *, key_col: str, fractions: dict[str, float],
               split_col: str = "split"):
    """Deterministic labeled dataset partition — the train/val/test
    split primitive.  Every row gets exactly one label from
    ``fractions`` (e.g. ``{"train": .8, "val": .1, "test": .1}``),
    decided by the same Knuth hash cut as ``hash_sample``: label i iff
    ``t_{i-1} <= h(key) < t_i`` over cumulative integer thresholds.

    Properties a training pipeline needs, all free from the hash rule:
    disjoint + exhaustive (the CASE ladder covers [0, 2^32)); stable —
    a key's label never changes as the corpus grows, is re-sharded, or
    tasks retry, so no example ever migrates from test into train; and
    CONSISTENT with ``hash_sample``: the 'train' rows at fraction f are
    exactly ``hash_sample(fraction=f)``'s selection, so a downsampled
    dev run trains on a subset of the full run's train split.  Repeated
    keys land in the same split (split is by key — dedupe first if
    leakage across duplicates matters).  Pure per-batch map: no
    shuffle, no RNG state, zero exchange at any scale.

    SQL twin: ``CASE WHEN (CAST(k AS HUGEINT)*2654435761)%4294967296 <
    t1 THEN l1 ... ELSE l_last END`` with ``split_thresholds`` literals.
    """
    labels, bounds = split_thresholds(fractions)
    label_arr = pa.array(labels, type=pa.string())

    def _assign(batch: pa.Table) -> pa.Table:
        h = hashed_keys(batch[key_col].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(bounds, h, side="right")
        # take() builds the string column in C from the k-label pool —
        # no per-row Python objects (the unpivot lesson, ADVICE r4)
        return batch.append_column(
            split_col, pc.take(label_arr, pa.array(idx, type=pa.int32())))

    return ds.map_batches(_assign, batch_format="pyarrow", batch_size=None)


def mixture_sample(ds, *, key_col: str, group_col: str,
                   fractions: dict[str, float], default_fraction: float = 0.0):
    """Per-domain reweighted sampling: keep ~fractions[g] of each
    ``group_col`` domain, chosen deterministically by key hash — the
    standard corpus-mixture rebalance (upweight curated sources,
    downsample crawl) as one shuffle-free per-batch filter.

    Same cut rule as ``hash_sample`` (h(k) < per-group threshold), so a
    row's fate is independent of partitioning, retries and cluster
    size, and the selection NESTS across fractions: the 10% sample of a
    domain is a subset of its 50% sample (mixture re-tuning never
    churns previously selected rows).  SQL twin: compare the same hash
    against ``CASE group_col WHEN ... THEN hash_threshold(f) ...``.
    """
    thresholds = {g: np.uint64(hash_threshold(f)) for g, f in fractions.items()}
    default_t = np.uint64(hash_threshold(default_fraction))

    def _filter(batch: pa.Table) -> pa.Table:
        h = hashed_keys(batch[key_col].to_numpy(zero_copy_only=False))
        g = batch[group_col].to_numpy(zero_copy_only=False)
        thr = np.full(len(g), default_t, dtype=np.uint64)
        # few domains by construction (a mixture config is hand-sized);
        # one vectorized mask per domain beats a per-row dict lookup
        for dom, t in thresholds.items():
            thr[g == dom] = t
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(_filter, batch_format="pyarrow", batch_size=None)


def stratified_sample(ds, *, group_col: str, key_col: str, k: int,
                      rank_col: str = "rank", num_buckets: int = 64):
    """Deterministic k-per-group sample: the k smallest hash keys in
    each group, ranked 1..k (ties broken by ``key_col`` ascending).

    Map-side pruning via grouped_topk: each block ships at most k rows
    per group it holds.  SQL twin: ``row_number() OVER (PARTITION BY g
    ORDER BY (CAST(key AS HUGEINT)*2654435761)%4294967296, key) <= k``.
    """
    from .rank import grouped_topk

    def _add_hkey(batch: pa.Table) -> pa.Table:
        h = hashed_keys(batch[key_col].to_numpy(zero_copy_only=False))
        return batch.append_column(HKEY_COL, pa.array(h.astype(np.int64)))

    out = grouped_topk(
        ds.map_batches(_add_hkey, batch_format="pyarrow"),
        group_col=group_col,
        order_col=HKEY_COL,
        tiebreak=key_col,
        k=k,
        descending=False,
        rank_col=rank_col,
        num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda b: b.drop_columns([HKEY_COL]), batch_format="pyarrow"
    )


def reservoir_sample(ds, *, key_col: str, k: int, seed: int = 0,
                     drop_rank: bool = True):
    """Deterministic EXACTLY-k uniform sample without replacement.

    Rank every row by ``murmur128(key ++ seed)`` and keep the global
    bottom-k ranks — the hash plays the role of the reservoir's random
    tags, so the result is (a) exactly k rows (when the input has ≥ k
    distinct keys), (b) independent of partitioning/arrival order, and
    (c) re-drawable: a different ``seed`` yields an independent sample.
    Scale shape: per-block bottom-k prune + the global_topn funnel —
    the exchange carries ≤ k × blocks rows, never the dataset (compare
    `hash_sample`, which takes a FRACTION; this takes a COUNT — the
    training-data "give me exactly 10k docs" primitive).  Duplicate
    keys rank identically: pass a unique NON-NULL id column (null keys
    all hash to the same rank with a null tiebreak — survivor choice
    would depend on arrival order — so they are rejected).
    """
    from ..hashing import hash128
    from .rank import global_topn

    if k < 1:
        raise ValueError("k must be >= 1")

    def _rank(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if col.null_count:
            raise ValueError(
                f"reservoir_sample: {key_col!r} has NULLs — pass a non-null "
                "unique id column (null keys would sample order-dependently)")
        # to_padded_bytes casts non-string columns itself
        h1, _ = hash128(col, 1469598103 + seed)
        # uint64 -> order-preserving int64 (drop the low bit)
        return batch.append_column(
            "__rank", pa.array((h1 >> np.uint64(1)).astype(np.int64)))

    ranked = ds.map_batches(_rank, batch_format="pyarrow", zero_copy_batch=True)
    out = global_topn(ranked, order_col="__rank", tiebreak=key_col, n=k,
                      descending=False, rank_col="__pos")
    if drop_rank:
        out = out.drop_columns(["__rank", "__pos"])
    return out
