"""Bucketed storage layout + shuffle-free co-located joins.

The 100-TB join strategy the shuffle join can't give you: pay the
hash-exchange ONCE by persisting each table partitioned on
``hash(key) % num_buckets`` (``write_bucketed``), then join any two
tables bucketed with the SAME layout with ZERO data movement
(``colocated_join``): one Ray task per bucket reads exactly its own
``bucket=<b>/`` directory from each side (column-pruned parquet scan)
and matches locally.  Repeated joins against a bucketed fact table
never shuffle it again — the storage layout IS the co-partitioning.

No reference counterpart (gostatix has no relational layer,
SURVEY.md §2.6); the layout/manifest design follows the public
Hive/Spark bucketing idea re-expressed on Ray Data + parquet.

The bucket function is the SAME ``hash128(cast(key as string), seed
31) % nb`` used by ``stages/joins.py:hash_join`` and
``dedup.bucketed_groupby``, so layouts are mutually compatible; a
``_BUCKETS.json`` manifest pins (key, num_buckets, seed) and
``colocated_join`` refuses mismatched layouts instead of silently
returning wrong joins.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MANIFEST = "_BUCKETS.json"
_SEED = 31


def _bucket_column(kcol, num_buckets: int) -> pa.Array:
    from ..hashing import hash128_keyed

    h1, _ = hash128_keyed(pc.cast(kcol, pa.string()), _SEED)
    return pa.array((h1 % np.uint64(num_buckets)).astype(np.int64))


def write_bucketed(ds, out_dir: str, *, key: str, num_buckets: int = 64) -> str:
    """Persist ``ds`` as parquet Hive-partitioned on the key's hash
    bucket (one distributed pass, one ``bucket=<b>/`` directory per
    bucket) and write the layout manifest."""

    def _tag(batch: pa.Table) -> pa.Table:
        return batch.append_column("bucket", _bucket_column(batch[key], num_buckets))

    ds.map_batches(_tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    os.makedirs(out_dir, exist_ok=True)  # zero-row write creates nothing
    if not any(e.startswith("bucket=") for e in os.listdir(out_dir)):
        # empty layout: persist one 0-row bucket so colocated_join can
        # resolve the schema and return a typed empty result
        schema = ds.schema()
        if schema is None:
            raise ValueError(
                "write_bucketed: input is empty and Ray could not infer "
                "its map_batches schema over zero rows; an empty layout "
                "needs a known schema (read/project so it survives, or "
                "check ds.schema() is not None first)")
        from .joins import _arrow_schema

        import pyarrow.parquet as pq

        bdir = os.path.join(out_dir, "bucket=0")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(_arrow_schema(ds).empty_table(),
                       os.path.join(bdir, "empty.parquet"))
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"key": key, "num_buckets": num_buckets, "seed": _SEED,
                   "format": "gostatix_ray.bucketed.v1"}, f)
    return out_dir


def read_layout(dir_: str) -> dict:
    with open(os.path.join(dir_, _MANIFEST)) as f:
        return json.load(f)


def _read_bucket(dir_: str, b: int, columns: list[str]) -> pa.Table | None:
    import pyarrow.parquet as pq

    path = os.path.join(dir_, f"bucket={b}")
    if not os.path.isdir(path):
        return None
    return pq.read_table(path, columns=columns)


def _match(lt: pa.Table, rt: pa.Table, *, lkey: str, rkey: str, out_key: str,
           left_cols: dict, right_cols: dict, how: str) -> pa.Table:
    """Local equi-join of two bucket tables — same factorize + stable
    sort + searchsorted range expansion as joins.py:_HashJoinBucketMatch
    (exact m×n duplicate-key multiplicity), minus the tagged union."""
    import pandas as pd

    kl_raw = lt[lkey].to_numpy(zero_copy_only=False)
    kr_raw = pc.cast(rt[rkey], lt.schema.field(lkey).type).to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(np.concatenate([kl_raw, kr_raw]))
    kl, kr = codes[: len(kl_raw)].copy(), codes[len(kl_raw):].copy()
    # SQL NULL-never-matches: factorize codes every null -1, which would
    # equi-join NULL to NULL; give each side a distinct unmatched code
    kl[kl == -1] = -2
    kr[kr == -1] = -3
    order = np.argsort(kr, kind="stable")
    kr_s = kr[order]
    lo = np.searchsorted(kr_s, kl, side="left")
    hi = np.searchsorted(kr_s, kl, side="right")
    counts = hi - lo

    if how in ("semi", "anti"):
        keep = np.flatnonzero(counts > 0) if how == "semi" else np.flatnonzero(counts == 0)
        out = {out_key: lt[lkey].take(pa.array(keep))}
        for src, name in left_cols.items():
            out[name] = lt[src].take(pa.array(keep))
        return pa.table(out)

    total = int(counts.sum())
    rep = np.repeat(np.arange(len(kl), dtype=np.int64), counts)
    starts = np.repeat(lo, counts)
    csum = np.concatenate(([0], np.cumsum(counts)[:-1])) if len(counts) else np.empty(0, np.int64)
    offs = np.arange(total, dtype=np.int64) - np.repeat(csum, counts)
    left_rows = rep
    right_rows = order[starts + offs] if total else np.empty(0, np.int64)
    valid = None
    if how == "left":
        miss = np.flatnonzero(counts == 0)
        if len(miss):
            left_rows = np.concatenate((left_rows, miss))
            right_rows = np.concatenate((right_rows, np.zeros(len(miss), np.int64)))
            valid = np.concatenate((np.ones(total, bool), np.zeros(len(miss), bool)))

    out = {out_key: lt[lkey].take(pa.array(left_rows))}
    for src, name in left_cols.items():
        out[name] = lt[src].take(pa.array(left_rows))
    vmask = pa.array(valid) if valid is not None else None
    for src, name in right_cols.items():
        vals = rt[src].take(pa.array(right_rows)) if len(rt) else pa.nulls(
            len(right_rows), rt.schema.field(src).type)
        if vmask is not None:
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            vals = pc.if_else(vmask, vals, pa.scalar(None, type=vals.type))
        out[name] = vals
    return pa.table(out)


def colocated_join(left_dir: str, right_dir: str, *, left_cols: dict,
                   right_cols: dict, how: str = "inner", out_key: str | None = None):
    """Join two ``write_bucketed`` layouts with ZERO shuffle: one task
    per bucket, each reading only its own pair of bucket directories.

    ``left_cols`` / ``right_cols``: {source column -> output name}
    (the join key rides along under ``out_key``, default the left
    layout's key name).  Layouts must agree on (num_buckets, seed) —
    validated from the manifests, not assumed.
    """
    import ray.data as rd

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how must be inner|left|semi|anti, got {how!r}")
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"how={how!r} emits left columns only; right_cols must be empty")
    lman, rman = read_layout(left_dir), read_layout(right_dir)
    for field in ("num_buckets", "seed"):
        if lman[field] != rman[field]:
            raise ValueError(
                f"incompatible bucket layouts: {field} {lman[field]} != {rman[field]}")
    nb = int(lman["num_buckets"])
    lkey, rkey = lman["key"], rman["key"]
    out_key = out_key or lkey
    left_cols, right_cols = dict(left_cols), dict(right_cols)

    lcols = [lkey] + list(left_cols)
    rcols = [rkey] + list(right_cols)
    # right-side payload types, resolved ONCE from parquet metadata (a
    # bucket directory can be absent when no key hashed into it; left/
    # anti joins still need typed null columns for those buckets)
    import pyarrow.dataset as pads

    lschema = pads.dataset(left_dir, format="parquet",
                           partitioning="hive").schema
    rschema = pads.dataset(right_dir, format="parquet",
                           partitioning="hive").schema
    empty_right = pa.table(
        {c: pa.nulls(0, rschema.field(c).type) for c in rcols})
    empty_cols = {out_key: pa.nulls(0, lschema.field(lkey).type)}
    for src, name in left_cols.items():
        empty_cols[name] = pa.nulls(0, lschema.field(src).type)
    if how in ("inner", "left"):
        for src, name in right_cols.items():
            empty_cols[name] = pa.nulls(0, rschema.field(src).type)
    empty_out = pa.table(empty_cols)

    def _join_buckets(batch: pa.Table) -> pa.Table:
        outs = []
        for b in batch["bucket"].to_pylist():
            lt = _read_bucket(left_dir, int(b), lcols)
            if lt is None or lt.num_rows == 0:
                continue
            rt = _read_bucket(right_dir, int(b), rcols)
            if rt is None:
                if how in ("inner", "semi"):
                    continue
                rt = empty_right
            outs.append(_match(lt, rt, lkey=lkey, rkey=rkey, out_key=out_key,
                               left_cols=left_cols, right_cols=right_cols, how=how))
        if not outs:
            return empty_out
        return pa.concat_tables(outs)

    manifest = rd.range(nb, override_num_blocks=nb).map_batches(
        lambda b: pa.table({"bucket": b["id"]}), batch_format="pyarrow")
    return manifest.map_batches(_join_buckets, batch_format="pyarrow", batch_size=None)
