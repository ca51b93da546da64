"""Multi-level aggregation — GROUPING SETS / ROLLUP over a Dataset.

The reference has no relational layer (SURVEY.md §2.6); training-data
reporting pipelines constantly need "totals at every level" (per
(source, lang), per source, grand total) without re-scanning the
corpus once per level.  Scale shape: the CALLER pre-aggregates
map-side (one pandas/Arrow groupby per batch -> integer partial sums),
this stage materializes those partials ONCE (they are bounded by
#batches x #groups, not by input rows) and derives every grouping set
from the same materialized handle — the raw input is scanned exactly
once no matter how many levels are requested.  Each level is one small
distributed groupby over partials; levels union into a single Dataset.

Rolled-up key columns are filled with a caller-chosen SENTINEL (not
null) so results hash identically across engines — the SQL twin is
``GROUP BY ROLLUP(...)`` + ``COALESCE(key, sentinel)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .joins import _arrow_schema


def grouping_sets(partials, *, keys: list[str], value_cols: dict[str, str],
                  sets: list[list[str]], fill="ALL"):
    """Aggregate ``partials`` at every grouping set in ``sets``.

    ``partials``: Dataset of map-side pre-aggregated rows carrying
    ``keys`` + the integer partial columns in ``value_cols``
    ({source partial column -> output name}).  ``sets``: the grouping
    sets, each a subset of ``keys`` (order irrelevant; [] = grand
    total).  ``fill``: sentinel for rolled-up key columns — a scalar
    for all keys or a {key: value} dict; must be castable to the key's
    Arrow type.  Output schema: ``keys`` (original order) + output
    names, value columns int64.
    """
    from .reduce import small_group_agg

    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} has non-key columns {sorted(unknown)}")
    fills = fill if isinstance(fill, dict) else {k: fill for k in keys}
    schema = _arrow_schema(partials)
    key_types = {k: schema.field(k).type for k in keys}

    # one scan of the upstream pipeline, shared by every level
    partials = partials.materialize()
    # each level's group count is a rollup of the (small) partial key
    # space -> streaming combiner, never a per-level sort all-to-all
    sums = {src: (src, "sum") for src in value_cols}

    levels = []
    for s in sets:
        if s:
            agg = small_group_agg(partials, list(s), sums)
        else:
            agg = small_group_agg(
                partials.map_batches(
                    lambda b: b.append_column("__gt", pa.array([0] * b.num_rows, pa.int8())),
                    batch_format="pyarrow",
                ),
                "__gt",
                sums,
            )
        present = set(s)

        def _pad(b: pa.Table, present=present) -> pa.Table:
            out = {}
            for k in keys:
                if k in present:
                    out[k] = b[k]
                else:
                    out[k] = pa.nulls(b.num_rows, key_types[k]).fill_null(
                        pa.scalar(fills[k], type=key_types[k])
                    )
            for src, name in value_cols.items():
                out[name] = pc.cast(b[src], pa.int64())
            return pa.table(out)

        levels.append(agg.map_batches(_pad, batch_format="pyarrow"))
    out = levels[0]
    if len(levels) > 1:
        out = out.union(*levels[1:])
    return out


def rollup(partials, *, keys: list[str], value_cols: dict[str, str], fill="ALL"):
    """``GROUP BY ROLLUP(keys...)``: every key prefix plus the grand
    total — len(keys)+1 grouping sets from one scan of the input."""
    sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return grouping_sets(partials, keys=keys, value_cols=value_cols,
                         sets=sets, fill=fill)


def cube(partials, *, keys: list[str], value_cols: dict[str, str], fill="ALL"):
    """``GROUP BY CUBE(keys...)``: every subset of ``keys`` — 2^k
    grouping sets from the same single scan (the materialized partials
    are shared across all levels, like :func:`rollup`)."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets(partials, keys=keys, value_cols=value_cols,
                         sets=sets, fill=fill)
