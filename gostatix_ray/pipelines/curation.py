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
):
    """documents -> Dataset[doc_id] of the curated corpus.

    The near-dup removal set (cluster members above the cluster minimum)
    is tiny relative to the corpus, so it broadcasts exactly (ray.put of
    an id array) — never a probabilistic filter."""
    import ray

    filtered = quality_filter(ds, text_col=text_col, id_col=id_col, min_quality=min_quality)
    survivors = exact_dedup_with_text(filtered, text_col=text_col, id_col=id_col).materialize()

    pairs = near_dup_pairs_verified(
        survivors, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, shingle=shingle, threshold=jaccard_threshold,
        concurrency=concurrency,
    )
    drop: np.ndarray
    if pairs.count() == 0:
        drop = np.empty(0, np.int64)
    else:
        clusters = duplicate_clusters(pairs).to_pandas()
        drop = clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"].to_numpy(np.int64)
    drop_ref = ray.put(np.sort(drop))

    def _prune(batch: pa.Table) -> pa.Table:
        import ray as _ray

        d = _ray.get(drop_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, d)
        return pa.table({id_col: pa.array(ids[keep].astype(np.int64))})

    return survivors.map_batches(_prune, batch_format="pyarrow")


def write_partitioned_resumable(ds, out_dir: str, *, key_col="doc_id", n_parts: int = 16):
    """Resumable partitioned-parquet sink: one directory per hash
    partition of ``key_col``, written atomically (tmp + rename, then a
    _SUCCESS marker) so a rerun SKIPS finished partitions — never one
    giant file, never a half-written directory.

    Returns the list of partition directories.  Each partition's write
    is itself a distributed filtered write; the driver only loops over
    the (small, fixed) partition count.
    """
    import os
    import shutil

    from ..hashing import hash128

    os.makedirs(out_dir, exist_ok=True)

    def _with_part(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h1, _ = hash128(col.cast(pa.string()), 41)
        return batch.append_column("__part", pa.array((h1 % np.uint64(n_parts)).astype(np.int64)))

    parted = ds.map_batches(_with_part, batch_format="pyarrow").materialize()
    dirs = []
    for p in range(n_parts):
        pdir = os.path.join(out_dir, f"part={p}")
        dirs.append(pdir)
        if os.path.exists(os.path.join(pdir, "_SUCCESS")):
            continue  # resume: partition already complete
        tmp = pdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        sub = parted.filter(expr=f"__part == {p}").drop_columns(["__part"])
        sub.write_parquet(tmp)
        shutil.rmtree(pdir, ignore_errors=True)
        os.rename(tmp, pdir)
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write("")
    return dirs
