"""Parquet reads with schema METADATA stripped.

Parquet files written by pandas/other engines carry a ``b'pandas'``
schema-metadata blob.  ``hash(pa.Schema)`` raises ``unhashable type:
'dict'`` on such schemas, which defeats Ray Data's schema-deduplication
fast path (``transform_pyarrow.unify_schemas`` logs "Failed to hash the
schemas" per task and falls back to full unification).  Passing an
explicit metadata-free ``schema=`` to ``read_parquet`` makes every block
leave the read clean and hashable.

The schema must be PROJECTED when ``columns=`` is given — Ray's reader
asserts the schema matches the projected batch exactly.
"""

from __future__ import annotations

import pyarrow as pa


def clean_read_parquet(path, *, columns=None, filter_columns=None, **kwargs):
    """``ray.data.read_parquet`` emitting metadata-free (hashable) blocks.

    ``filter_columns``: columns referenced by a ``filter=`` expression
    but not in ``columns`` — pyarrow binds the filter against the
    provided schema, so they must be part of the scan; they are dropped
    again with a fused ``select_columns`` projection.
    """
    import pyarrow.dataset as pads
    import ray.data as rd

    sch = pads.dataset(path).schema.remove_metadata()
    read_cols = columns
    if columns is not None and filter_columns:
        read_cols = list(dict.fromkeys(list(columns) + list(filter_columns)))
    if read_cols is not None:
        # mirror read_parquet's tolerance of absent columns (callers may
        # request optional columns this way)
        read_cols = [c for c in read_cols if c in sch.names]
        columns = [c for c in columns if c in sch.names]
        sch = pa.schema([sch.field(c) for c in read_cols])
    ds = rd.read_parquet(path, columns=read_cols, schema=sch, **kwargs)
    # re-project ONLY when the filter genuinely widened the scan — a
    # select_columns equal to the read's own projection is a pure no-op
    # operator between the read and the first real map (it blocks
    # read->map fusion)
    if columns is not None and list(read_cols) != list(columns):
        ds = ds.select_columns(list(columns))
    return ds
