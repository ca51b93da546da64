"""Document-corpus sources: one reader for the formats web corpora
actually arrive in (parquet, JSONL, CSV), normalized to the canonical
``(doc_id, text, ...)`` schema the text/dedup/curation stages consume.

No reference counterpart (gostatix is a sketch library; sources are
engine-side).  Scale posture: format readers are Ray Data's own
distributed readers (``read_parquet`` / ``read_json`` / ``read_csv``
— parallel file splits, streaming blocks); the normalization is one
zero-copy-where-possible ``map_batches``.  Missing ids are assigned
DETERMINISTICALLY from a 128->64-bit content hash of the text (stable
across runs and partitionings; collision odds ~n²/2⁶⁵ — at 10¹⁰ docs
~3%, acceptable for dedup-style ids, documented for callers needing
stronger guarantees to supply their own).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import SEED_FEATURE, hash128

_FORMATS = ("parquet", "jsonl", "csv")


def read_documents(path, *, format: str = "parquet", text_col: str = "text",
                   id_col: str = "doc_id", keep_cols: list[str] | None = None,
                   **reader_kwargs):
    """Read a document corpus into Dataset[doc_id, text, *keep_cols].

    ``text_col`` / ``id_col`` name the SOURCE columns; output always
    uses canonical names.  When ``id_col`` is absent from the source
    schema, deterministic content-hash ids are assigned.  For parquet,
    column pruning is pushed into the scan; JSONL/CSV readers must
    parse whole records by nature (the format has no column chunks) —
    convert to parquet upstream for the 100-TB path, which is exactly
    what :func:`to_parquet_corpus` is for.
    """
    import ray.data as rd

    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    if format == "parquet":
        cols = None
        if keep_cols is not None:
            cols = list(dict.fromkeys([text_col, id_col] + keep_cols))
        from .pq_read import clean_read_parquet

        # clean_read_parquet silently drops requested-but-absent columns,
        # so an optional id column needs no probe-and-re-read here
        ds = clean_read_parquet(path, columns=cols, **reader_kwargs)
    elif format == "jsonl":
        ds = rd.read_json(path, **reader_kwargs)
    else:
        ds = rd.read_csv(path, **reader_kwargs)

    names = _schema_names(ds)
    if text_col not in names:
        raise ValueError(f"source has no text column {text_col!r}: {names}")
    has_id = id_col in names
    keep = [c for c in (keep_cols or []) if c in names]

    def _normalize(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if has_id:
            ids = batch[id_col].cast(pa.int64())
        else:
            h1, _ = hash128(
                text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text,
                SEED_FEATURE,
            )
            ids = pa.array(h1.astype(np.int64))
        cols = {"doc_id": ids, "text": text}
        for c in keep:
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(_normalize, batch_format="pyarrow")


def to_parquet_corpus(ds, out_dir: str, *, partition_cols: list[str] | None = None):
    """One distributed pass: persist a normalized corpus as parquet
    (optionally Hive-partitioned) so every later read is column-pruned
    and row-group-splittable — the storage format the 100-TB pipeline
    should live in."""
    ds.write_parquet(out_dir, partition_cols=partition_cols)
    return out_dir


def _schema_names(ds) -> list[str]:
    return list(ds.schema().base_schema.names)
