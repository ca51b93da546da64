"""Hash joins — broadcast (BIG ⨝ SMALL) and shuffle (BIG ⨝ BIG).

The reference has no relational operators (SURVEY.md §2.6); the engine
supplies them Ray-Data-natively.  ``broadcast_join`` handles the
BIG ⨝ SMALL case without any shuffle: the small side is ``ray.put``
once and every task attaches columns with Arrow kernels
(``pc.index_in`` + ``pc.take``) — zero Python per row.  ``hash_join``
is the BIG ⨝ BIG case: both sides are hash-CO-PARTITIONED on the key
with ONE coarse-bucket shuffle each (each table crosses the wire
exactly once, pre-projected to the carried columns), and every bucket
is matched with a vectorized searchsorted expansion — zero per-row
Python, true multiplicity semantics (m×n rows for duplicate keys).
Prune the big probe side with a bloom semi-join (stages/membership.py)
first when the build side is selective.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _BroadcastJoin:
    """Task callable; small-side table resolves lazily once per worker."""

    def __init__(self, small_ref, key: str, small_key: str, columns: list[str], how: str):
        self._ref = small_ref
        self._key, self._small_key = key, small_key
        self._columns, self._how = columns, how
        self._small = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._small is None:
            import ray

            self._small = ray.get(self._ref) if not isinstance(self._ref, pa.Table) else self._ref
        small = self._small
        keys = batch[self._key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        skeys = small[self._small_key]
        if isinstance(skeys, pa.ChunkedArray):
            skeys = skeys.combine_chunks()
        idx = pc.index_in(keys.cast(skeys.type), value_set=skeys)
        if self._how == "inner":
            keep = idx.is_valid()
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        for col in self._columns:
            batch = batch.append_column(col, pc.take(small[col], idx))
        return batch


def broadcast_join(ds, small: pa.Table, *, key: str, small_key: str,
                   columns: list[str], how: str = "inner", concurrency=None):
    """Attach ``columns`` of the small table to ds rows by key.

    ``how``: "inner" drops non-matching rows; "left" keeps them with
    nulls.  Duplicate keys on the small side resolve to the FIRST
    occurrence (``pc.index_in`` semantics — deterministic).  The small
    table ships to the object store ONCE (ray.put) and each worker
    resolves it once — never re-pickled per batch.
    """
    import ray

    kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoin(ref, key, small_key, columns, how),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **kwargs,
    )


class _IntervalJoin:
    """Task callable; interval table resolves lazily once per worker."""

    def __init__(self, ref, value_col: str, lo_col: str, hi_col: str, columns: list[str]):
        self._ref = ref
        self._value_col, self._lo, self._hi = value_col, lo_col, hi_col
        self._columns = columns
        self._small = None

    def _build_segments(self, lo, hi):
        """Elementary-segment index: CSR of interval ids active per
        segment between consecutive sorted endpoints.  Exact for
        ARBITRARY overlapping/nested intervals; built ONCE per worker
        with pure numpy (no per-interval Python)."""
        import numpy as np

        E = np.unique(np.concatenate([lo, hi]))
        s0 = np.searchsorted(E, lo)
        s1 = np.searchsorted(E, hi)
        spans = np.maximum(s1 - s0, 0)          # empty/degenerate -> 0
        total = int(spans.sum())
        starts = np.cumsum(spans) - spans
        pos = np.arange(total, dtype=np.int64)
        seg_of_pair = np.repeat(s0, spans) + (pos - np.repeat(starts, spans))
        int_of_pair = np.repeat(np.arange(len(lo), dtype=np.int64), spans)
        order = np.argsort(seg_of_pair, kind="stable")  # intervals stay in id order per segment
        seg_sorted = seg_of_pair[order]
        self._seg_iv = int_of_pair[order]
        nseg = max(len(E) - 1, 0)
        self._seg_ptr = np.concatenate(
            [[0], np.cumsum(np.bincount(seg_sorted, minlength=nseg))]
        ).astype(np.int64)
        self._endpoints = E

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._small is None:
            import ray

            self._small = ray.get(self._ref) if not isinstance(self._ref, pa.Table) else self._ref
        small = self._small
        import numpy as np

        v = batch[self._value_col].to_numpy(zero_copy_only=False)
        lo = small[self._lo].to_numpy(zero_copy_only=False)
        hi = small[self._hi].to_numpy(zero_copy_only=False)

        # sorted-endpoint elementary-segment path (round-3 verdict #9,
        # sole path since round 5 — the old per-interval mask loop for
        # small tables did the same work in N Python iterations):
        # O(log N) per row + an output-linear gather. Exact for
        # arbitrary overlapping/nested intervals; output grouped by
        # INPUT ROW (a set of (row x interval) matches either way).
        if not hasattr(self, "_seg_ptr"):
            self._build_segments(lo, hi)
        E, ptr, seg_iv = self._endpoints, self._seg_ptr, self._seg_iv
        s = np.searchsorted(E, v, side="right") - 1
        valid = (s >= 0) & (s < len(E) - 1)
        s_val = np.where(valid, s, 0)
        cnt = np.where(valid, ptr[s_val + 1] - ptr[s_val], 0)
        total = int(cnt.sum())
        row_rep = np.repeat(np.arange(len(v), dtype=np.int64), cnt)
        base = np.repeat(ptr[s_val], cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        iv = seg_iv[base + within]
        out = batch.take(pa.array(row_rep))
        iv_arr = pa.array(iv)
        for col in self._columns:
            out = out.append_column(col, pc.take(small[col], iv_arr))
        return out


def interval_join(ds, intervals: pa.Table, *, value_col: str,
                  lo_col: str = "lo", hi_col: str = "hi",
                  columns: list[str], concurrency=None):
    """Range join of ds rows into a SMALL broadcast interval table:
    emit (row × interval) for every interval with lo <= value < hi
    (overlapping intervals emit one output row each — true join
    semantics, not binning).

    The interval table ships once (``ray.put``).  A sorted-endpoint
    elementary-segment index (built once per worker, pure numpy)
    answers each row in O(log N) + an output-linear gather — exact for
    arbitrary overlapping/nested intervals, with zero per-interval
    Python at any interval count.  If the interval table itself stops
    fitting a broadcast, co-partition both sides on a coarse range key
    instead.
    """
    import ray

    kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    ref = ray.put(intervals)
    return ds.map_batches(
        _IntervalJoin(ref, value_col, lo_col, hi_col, columns),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **kwargs,
    )


def _arrow_schema(ds) -> pa.Schema:
    """ds.schema() as a pyarrow Schema.  Pandas-block datasets report a
    PandasBlockSchema; map its numpy dtypes across (object -> string —
    pass Arrow-backed data for binary payloads)."""
    schema = ds.schema()
    if schema is None:
        # Ray cannot infer a map_batches output schema over a zero-row
        # dataset (it never runs the UDF; the blocks are 0-column
        # placeholders), so the join's output schema is unknowable
        raise ValueError(
            "join input has no schema: the dataset is empty AND at "
            "least one map_batches output schema could not be inferred "
            "(Ray never runs UDFs over zero rows). If this side can "
            "legitimately be empty, check ds.schema() is not None "
            "before joining, or read/project so the schema survives "
            "(a bare read_parquet keeps its schema even at zero rows)")
    base = schema.base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(base.names, base.types):
        try:
            at = pa.from_numpy_dtype(typ)
        except (pa.ArrowNotImplementedError, TypeError):
            at = pa.string()
        fields.append(pa.field(name, at))
    return pa.schema(fields)


class _HashJoinBucketMatch:
    """pyarrow map_groups callable: equi-join one co-partitioned bucket.

    Arrow in/out keeps every payload column its ORIGINAL type (the
    tagged union carries typed nulls for the other side — same pattern
    as stages/asof.py).  Matching is one factorize + one stable sort +
    searchsorted range expansion: O(B log B) per bucket, no per-row
    Python, exact m×n duplicate-key multiplicity.
    """

    def __init__(self, key, out_key, left_cols, right_cols, how):
        self._key, self._out_key = key, out_key
        self._left_cols = left_cols  # {src: out_name}
        self._right_cols = right_cols  # {src: out_name}
        self._how = how

    def __call__(self, table: pa.Table) -> pa.Table:
        import pandas as pd

        side = table["__side"].to_numpy(zero_copy_only=False)
        k = table[self._key].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(k)
        lidx = np.flatnonzero(side == 1)
        ridx = np.flatnonzero(side == 0)
        kl, kr = codes[lidx].copy(), codes[ridx].copy()
        # SQL NULL-never-matches: factorize codes every null -1, which
        # would equi-join NULL keys; distinct per-side unmatched codes
        # make them flow as misses (left/outer keep them unmatched,
        # inner/semi drop, anti keeps — NOT EXISTS semantics)
        kl[kl == -1] = -2
        kr[kr == -1] = -3
        order = np.argsort(kr, kind="stable")
        kr_s = kr[order]
        lo = np.searchsorted(kr_s, kl, side="left")
        hi = np.searchsorted(kr_s, kl, side="right")
        counts = hi - lo
        if self._how == "outer":
            # right rows whose key never appears on the left (the
            # symmetric complement of the left-miss rows below)
            order_l = np.argsort(kl, kind="stable")
            kl_s = kl[order_l]
            rlo = np.searchsorted(kl_s, kr, side="left")
            rhi = np.searchsorted(kl_s, kr, side="right")
            right_only = ridx[rhi == rlo]
        if self._how in ("semi", "anti"):
            # existence check only: emit matching (semi) / unmatched
            # (anti) LEFT rows once each, no expansion, no right payload
            keep = lidx[counts > 0] if self._how == "semi" else lidx[counts == 0]
            out = {self._out_key: table[self._key].take(pa.array(keep))}
            for src, name in self._left_cols.items():
                out[name] = table[src].take(pa.array(keep))
            return pa.table(out)
        total = int(counts.sum())
        rep = np.repeat(np.arange(len(kl), dtype=np.int64), counts)
        starts = np.repeat(lo, counts)
        csum = np.concatenate(([0], np.cumsum(counts)[:-1])) if len(counts) else np.empty(0, np.int64)
        offs = np.arange(total, dtype=np.int64) - np.repeat(csum, counts)
        left_rows = lidx[rep]
        right_rows = ridx[order[starts + offs]] if total else np.empty(0, np.int64)
        rvalid = lvalid = None
        if self._how in ("left", "outer"):
            miss = np.flatnonzero(counts == 0)
            if len(miss):
                left_rows = np.concatenate((left_rows, lidx[miss]))
                right_rows = np.concatenate((right_rows, np.zeros(len(miss), np.int64)))
                rvalid = np.concatenate((np.ones(total, bool), np.zeros(len(miss), bool)))
        if self._how == "outer" and len(right_only):
            # right-only segment: key + right payload from the right
            # row, left payload typed-null — mirrors the left-miss rows
            n_prev = len(left_rows)
            key_rows = np.concatenate((left_rows, right_only))
            right_rows = np.concatenate((right_rows, right_only))
            left_rows = np.concatenate((left_rows, np.zeros(len(right_only), np.int64)))
            lvalid = np.concatenate((np.ones(n_prev, bool), np.zeros(len(right_only), bool)))
            if rvalid is not None:
                rvalid = np.concatenate((rvalid, np.ones(len(right_only), bool)))
        else:
            key_rows = left_rows

        def _masked(vals, valid):
            if valid is None:
                return vals
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            return pc.if_else(pa.array(valid), vals, pa.scalar(None, type=vals.type))

        out: dict = {self._out_key: table[self._key].take(pa.array(key_rows))}
        for src, name in self._left_cols.items():
            out[name] = _masked(table[src].take(pa.array(left_rows)), lvalid)
        for src, name in self._right_cols.items():
            out[name] = _masked(table[src].take(pa.array(right_rows)), rvalid)
        return pa.table(out)


def detect_hot_keys(ds, key: str, *, k: int = 32, min_frac: float = 0.01) -> list:
    """Heavy-hitter keys of ``ds[key]`` via the Top-K sketch (one map-side
    partial per block, one tiny merge — the shuffle moves sketch states,
    never keys).  Returns keys whose estimated frequency exceeds
    ``min_frac`` of the rows: the candidates worth salting in
    :func:`hash_join`.  CMS overestimate-only semantics make this
    conservative — a false positive merely salts a cold key (harmless)."""
    import pyarrow.compute as pc

    from ..kernels import topk as topk_kernel
    from .build import SketchRequest, build_partials
    from .merge import collect_final, full_throttle_dataset, merge_partials_streaming

    req = SketchRequest(
        "hot", "topk", topk_kernel.TopKSpec(k=k, error_rate=0.0005, accuracy=0.01),
        # NULL keys never join and would crash the value_counts path
        on=lambda b, c=key: pc.drop_null(pc.cast(b[c], pa.string())),
    )
    partials = build_partials(full_throttle_dataset(ds), [req], concurrency=None)
    merged = merge_partials_streaming(partials, final="single")
    from .merge import final_state

    final = collect_final(merged)
    state = final_state(final, req)  # empty input -> fresh (no hot keys)
    total = max(int(state.cms.all_sum), 1)
    return [elem for elem, cnt in topk_kernel.values(state) if cnt / total >= min_frac]


_SALT_MIX = np.uint64(0x9E3779B97F4A7C15)


def hash_join(
    left,
    right,
    *,
    key: str,
    right_key: str | None = None,
    left_cols: dict,
    right_cols: dict,
    how: str = "inner",
    num_buckets: int = 64,
    hot_keys=None,
    n_salts: int = 8,
):
    """Distributed BIG ⨝ BIG equi-join (inner / left / outer / semi /
    anti) of two Datasets.  ``outer`` is FULL OUTER: unmatched rows of
    BOTH sides survive with typed-null payload from the missing side
    (the key column is always populated — it exists on whichever side
    the row came from).

    ``left_cols`` / ``right_cols``: {source column -> output name};
    output-name collisions are the caller's to avoid.  The join key is
    emitted once under the LEFT name; a differently-named right key is
    given via ``right_key`` and cast to the left key's type.  NULL keys
    follow SQL semantics: they never match (inner/semi drop them, left/
    outer/anti keep them unmatched).  Scale shape: each side shuffles
    once, pre-projected to
    key + carried columns; skewed keys stay inside one vectorized bucket
    call — raise ``num_buckets`` (or bloom-prune the probe side) for hot
    keys.  Duplicate keys produce the full m×n cross product per key —
    true join semantics, partition-independent output SET (row order
    follows bucket scheduling).

    ``hot_keys`` + ``n_salts``: SKETCH-GUIDED SKEW MITIGATION.  Pass the
    output of :func:`detect_hot_keys` (Top-K heavy hitters, string form)
    and each hot key's work spreads across ``n_salts`` buckets: hot
    BUILD rows replicate once per salt (bounded ×n_salts on the hot
    subset only), hot PROBE rows scatter round-robin, and the bucket
    hash mixes the salt.  Join output is identical to the unsalted path
    (each probe row still sees the full match set via the replicas);
    not supported for ``outer``.
    """
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"how must be inner|left|outer|semi|anti, got {how!r}")
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"how={how!r} emits left columns only; right_cols must be empty")
    if hot_keys and how == "outer":
        raise ValueError("salted hash_join does not support outer (right-only rows "
                         "would emit once per salt); use inner/left/semi/anti")
    if hot_keys and n_salts < 2:
        raise ValueError("n_salts must be >= 2 when hot_keys are given")
    hot_arr = pa.array([str(h) for h in hot_keys], pa.string()) if hot_keys else None
    from ..hashing import hash128_keyed

    rkey = right_key or key
    left_cols, right_cols = dict(left_cols), dict(right_cols)
    if key in left_cols or rkey in right_cols:
        raise ValueError("hash_join: the key rides along automatically; do not list it")
    nb = np.uint64(num_buckets)
    lschema, rschema = _arrow_schema(left), _arrow_schema(right)
    key_type = lschema.field(key).type
    payload: dict = {}
    for src in left_cols:
        payload[src] = lschema.field(src).type
    for src in right_cols:
        if src in payload:
            raise ValueError(f"hash_join: column {src!r} carried from both sides; rename one")
        payload[src] = rschema.field(src).type

    def _tag(side_val: int, keep: list, src_key: str):
        def _fn(batch: pa.Table) -> pa.Table:
            kcol = batch[src_key]
            take_idx = None  # build-side replication indices (salted hot keys)
            if side_val == 0:
                kcol = pc.cast(kcol, key_type)
                if how in ("semi", "anti"):
                    # existence joins only need each probe key once per
                    # block — dedup before the shuffle
                    kcol = pc.unique(
                        kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol
                    )
            n = len(kcol)
            kstr = pc.cast(kcol, pa.string())
            salts = None
            if hot_arr is not None and len(hot_arr):
                hot_mask = pc.is_in(kstr, value_set=hot_arr).to_numpy(zero_copy_only=False)
                if side_val == 0:
                    # replicate each hot BUILD row once per salt so every
                    # (hot key, salt) bucket holds the full match set
                    counts = np.where(hot_mask, n_salts, 1).astype(np.int64)
                    take_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
                    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
                    salts = (np.arange(len(take_idx), dtype=np.int64)
                             - np.repeat(starts, counts)).astype(np.uint64)
                    kcol = kcol.take(pa.array(take_idx))
                    kstr = kstr.take(pa.array(take_idx))
                    n = len(kcol)
                else:
                    # spread hot PROBE rows across the salts round-robin
                    salts = np.where(hot_mask,
                                     np.arange(n, dtype=np.int64) % n_salts,
                                     0).astype(np.uint64)
            h1, _ = hash128_keyed(kstr, 31)
            bucket_h = h1 if salts is None else h1 + salts * _SALT_MIX
            ncols = {key: kcol, "__side": pa.array(np.full(n, side_val, dtype=np.int8))}
            for src, typ in payload.items():
                if src in keep:
                    col = batch[src]
                    ncols[src] = col.take(pa.array(take_idx)) if take_idx is not None else col
                else:
                    ncols[src] = pa.nulls(n, type=typ)
            ncols["__bucket"] = pa.array((bucket_h % nb).astype(np.int64))
            return pa.Table.from_pydict(ncols)

        return _fn

    tagged = left.map_batches(
        _tag(1, list(left_cols), key), batch_format="pyarrow"
    ).union(right.map_batches(_tag(0, list(right_cols), rkey), batch_format="pyarrow"))
    match = _HashJoinBucketMatch(key, key, left_cols, right_cols, how)
    # plain-function wrapper: map_groups reads fn.__name__ for its label
    return tagged.groupby("__bucket").map_groups(lambda t: match(t), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sketch-guided join planning
# ---------------------------------------------------------------------------


def join_profile(ds, key: str, *, k: int = 32, m: int = 1 << 12,
                 freq_eps: float | None = 0.0005, concurrency=None,
                 cast_to: pa.DataType | None = None) -> dict:
    """ONE cheap pass over ``ds[key]`` ->
    ``{rows, rows_total, distinct, hot, cms}``.

    The sketch library serving the query planner: a single projected
    scan of the key column builds a Top-K (heavy hitters + exact
    JOINABLE row count via its CMS ``all_sum``; ``rows_total``
    additionally counts null-key rows — the honest materialization
    gate), a standard-mode HLL (distinct-key estimate, ±1.04/sqrt(m))
    and — unless ``freq_eps`` is None — a standalone CMS frequency
    sketch in the same actor pass; the shuffle moves a few tiny sketch
    states, never keys.  ``hot`` is
    ``[(key_str, frac)]`` for the k heaviest keys (CMS overestimates
    only — conservative).  ``cms`` is the frequency-vector state whose
    INNER PRODUCT with another side's profile estimates the join output
    cardinality Σ_x f_L(x)·f_R(x) (Cormode & Muthukrishnan 2005 §4.2 —
    see :func:`estimate_join_size`).  The reference exposes these
    sketches as a library (`top_k.go:95-134`, `hyperloglog.go:67-76`,
    `count_min_sketch.go:76-92`); here they drive physical join
    selection in :func:`auto_join`.

    ``cast_to``: normalize keys to this Arrow type before the string
    cast — REQUIRED when comparing two sides' profiles whose key
    columns differ in type (the join matches after casting the right
    side to the left's type, so cross-side statistics must sketch the
    same representation: '1' and '1.00' are different sketch keys).
    """
    from ..kernels import cms as cms_kernel
    from ..kernels import hll as hll_kernel
    from ..kernels import topk as topk_kernel
    from .build import SketchRequest, build_partials
    from .merge import collect_final, full_throttle_dataset, merge_partials_streaming

    def _proj(b, c=key, t=cast_to):
        col = b[c] if t is None else pc.cast(b[c], t)
        # NULL keys never join — drop them from the sketches (so
        # ``rows`` counts joinable rows; a null distinct entry would
        # also crash the Top-K value_counts path)
        return pc.drop_null(pc.cast(col, pa.string()))

    def _const(b):
        # constant projection: counts EVERY row (incl. null keys) so
        # rows_total can gate broadcast materialization honestly
        return pa.array(np.zeros(b.num_rows, dtype=np.int64)).cast(pa.string())

    reqs = [
        SketchRequest(
            "jp_hot", "topk",
            topk_kernel.TopKSpec(k=k, error_rate=0.0005, accuracy=0.01), on=_proj,
        ),
        SketchRequest("jp_distinct", "hll", hll_kernel.HLLSpec(m=m), on=_proj),
        SketchRequest(
            "jp_total", "topk",
            topk_kernel.TopKSpec(k=1, error_rate=0.01, accuracy=0.01), on=_const,
        ),
    ]
    if freq_eps is not None:
        reqs.append(SketchRequest(
            "jp_freq", "cms", cms_kernel.CMSSpec.from_error_rate(freq_eps, 0.01),
            on=_proj,
        ))
    # group-free funnel: throttle off per-op reservation, unbounded task
    # dispatch (concurrency=None), ONE final combine task (no sort)
    partials = build_partials(full_throttle_dataset(ds), reqs, concurrency=concurrency)
    merged = merge_partials_streaming(partials, final="single")
    from .merge import final_blob, final_state

    final = collect_final(merged)
    # empty input -> fresh states (profile of a zero-row side: 0 rows,
    # 0 distinct, no hot keys — a valid plan input, not a crash)
    tk = final_state(final, reqs[0])
    hstate = final_state(final, reqs[1])
    rows = int(tk.cms.all_sum)  # JOINABLE (non-null-key) rows
    total = max(rows, 1)
    hot = [(elem, cnt / total) for elem, cnt in topk_kernel.values(tk)]
    return {
        "rows": rows,
        "rows_total": int(final_state(final, reqs[2]).cms.all_sum),
        "distinct": float(hll_kernel.count(hstate)),
        "hot": hot,
        "cms": final_blob(final, reqs[3]) if freq_eps is not None else None,
        # provenance, so auto_join can validate cached profiles
        "key": key,
        "cast_to": str(cast_to) if cast_to is not None else None,
    }


def estimate_join_size(left_profile: dict, right_profile: dict) -> int:
    """Estimated inner-join output cardinality from two
    :func:`join_profile` results: the CMS inner product
    Σ_x f_L(x)·f_R(x) — overestimate-only, error ≤ ε·|L|·|R| with prob
    1-δ (Cormode & Muthukrishnan 2005 §4.2).  The classic sketch-driven
    planner statistic: whether a join explodes (many-to-many) or
    contracts is known BEFORE any shuffle is scheduled."""
    from ..kernels import cms as cms_kernel

    lc, rc = left_profile.get("cms"), right_profile.get("cms")
    if lc is None or rc is None:
        raise ValueError("estimate_join_size needs profiles built with freq_eps set")
    return cms_kernel.inner_product(cms_kernel.from_bytes(lc), cms_kernel.from_bytes(rc))


def _build_key_bloom(ds, key: str, spec, cast_to: pa.DataType | None = None) -> bytes:
    """One projected pass over ``ds[key]`` -> merged Bloom state bytes
    (the join runtime filter).  ``cast_to`` MUST be the probe side's key
    type when the sides differ: the probe's ``contains`` casts its
    column through ``pa.string()`` (``to_padded_bytes``), so the filter
    must be built from the same representation or true matches hash
    differently and get pruned (silent row loss)."""
    from .build import SketchRequest, build_partials
    from .merge import collect_final, full_throttle_dataset, merge_partials_streaming

    def _proj(b, c=key, t=cast_to):
        col = b[c] if t is None else pc.cast(b[c], t)
        # NULL build keys never match — keep them out of the filter
        return pc.drop_null(pc.cast(col, pa.string()))

    from .merge import final_blob

    req = SketchRequest("jp_bloom", "bloom", spec, on=_proj)
    partials = build_partials(full_throttle_dataset(ds), [req], concurrency=None)
    return final_blob(
        collect_final(merge_partials_streaming(partials, final="single")), req)


class _BroadcastMultiJoin:
    """Task callable: TRUE m×n broadcast equi-join of one probe batch
    against the broadcast build table, with :func:`hash_join`'s exact
    output contract (inner/left/semi/anti, SQL NULL-never-matches,
    duplicate-key multiplicity).  Differs from :class:`_BroadcastJoin`,
    which is dimension-join (first-match) semantics.

    The build table resolves lazily ONCE per worker (ray.get of the
    broadcast ref — pickled-instance stateless dispatch, no actor
    pool), and its key codes are factorized + sorted once; each probe
    batch is one ``index_in`` + two ``searchsorted`` calls.
    """

    def __init__(self, ref, key, right_key, left_cols, right_cols, how, key_type):
        self._ref = ref
        self._key, self._rkey = key, right_key
        self._left_cols, self._right_cols = left_cols, right_cols
        self._how, self._key_type = how, key_type
        self._prep = None

    def _prepare(self):
        small = self._ref
        if not isinstance(small, pa.Table):
            import ray

            small = ray.get(small)
        skeys = small[self._rkey]
        if isinstance(skeys, pa.ChunkedArray):
            skeys = skeys.combine_chunks()
        skeys = skeys.cast(self._key_type)
        valid = pc.is_valid(skeys)
        if not pc.all(valid).as_py():
            # NULL build keys never match in inner/left/semi/anti —
            # drop them up front (outer is routed to the shuffle path)
            small = small.filter(valid)
            skeys = skeys.filter(valid)
        uniq = pc.unique(skeys)
        codes = pc.index_in(skeys, value_set=uniq)
        r_codes = codes.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(r_codes, kind="stable")
        self._prep = (small, uniq, r_codes[order], order)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._prep is None:
            self._prepare()
        small, uniq, r_codes_s, order = self._prep
        keys = batch[self._key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = pc.index_in(keys, value_set=uniq)
        # null = probe key absent from the build side (or NULL) -> a
        # code below every build code, i.e. guaranteed miss
        kl = codes.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(r_codes_s, kl, side="left")
        hi = np.searchsorted(r_codes_s, kl, side="right")
        counts = hi - lo
        if self._how in ("semi", "anti"):
            keep = np.flatnonzero(counts > 0 if self._how == "semi" else counts == 0)
            out = {self._key: keys.take(pa.array(keep))}
            for src, name in self._left_cols.items():
                out[name] = batch[src].take(pa.array(keep))
            return pa.table(out)
        total = int(counts.sum())
        n = len(kl)
        rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        starts = np.repeat(lo, counts)
        csum = (np.concatenate(([0], np.cumsum(counts)[:-1]))
                if n else np.empty(0, np.int64))
        offs = np.arange(total, dtype=np.int64) - np.repeat(csum, counts)
        left_rows = rep
        right_rows = order[starts + offs] if total else np.empty(0, np.int64)
        rvalid = None
        if self._how == "left":
            miss = np.flatnonzero(counts == 0)
            if len(miss):
                left_rows = np.concatenate((left_rows, miss))
                right_rows = np.concatenate((right_rows, np.zeros(len(miss), np.int64)))
                rvalid = np.concatenate((np.ones(total, bool), np.zeros(len(miss), bool)))
        out = {self._key: keys.take(pa.array(left_rows))}
        for src, name in self._left_cols.items():
            out[name] = batch[src].take(pa.array(left_rows))
        for src, name in self._right_cols.items():
            col = small[src]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = col.take(pa.array(right_rows)) if len(small) else pa.nulls(
                len(right_rows), type=col.type)
            if rvalid is not None:
                vals = pc.if_else(pa.array(rvalid), vals, pa.scalar(None, type=vals.type))
            out[name] = vals
        return pa.table(out)


def broadcast_hash_join(left, right_table: pa.Table, *, key: str,
                        right_key: str | None = None, left_cols: dict,
                        right_cols: dict, how: str = "inner"):
    """BIG ⨝ SMALL with :func:`hash_join`'s exact semantics and ZERO
    shuffle: the small side ships to the object store once and every
    probe task joins against it in place.  Same column contract as
    ``hash_join`` (``{src -> out_name}``, key emitted once under the
    left name); ``outer`` is unsupported (right-only rows need global
    knowledge — use the shuffle path)."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how must be inner|left|semi|anti, got {how!r}")
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"how={how!r} emits left columns only; right_cols must be empty")
    import ray

    rkey = right_key or key
    if key in left_cols or rkey in right_cols:
        # same guard as hash_join — the planner must not make this
        # error plan-dependent
        raise ValueError("broadcast_hash_join: the key rides along automatically; do not list it")
    key_type = _arrow_schema(left).field(key).type
    need = [rkey] + list(right_cols)
    ref = ray.put(right_table.select(need))
    return left.map_batches(
        _BroadcastMultiJoin(ref, key, rkey, dict(left_cols), dict(right_cols), how, key_type),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def auto_join(
    left,
    right,
    *,
    key: str,
    right_key: str | None = None,
    left_cols: dict,
    right_cols: dict,
    how: str = "inner",
    broadcast_threshold: int = 200_000,
    skew_frac: float = 0.02,
    n_salts: int = 8,
    num_buckets: int | None = None,
    profile_k: int = 32,
    bloom_prune: bool = True,
    bloom_ratio: float = 0.5,
    bloom_max_distinct: int = 8_000_000,
    bloom_min_probe_rows: int = 8_000_000,
    left_profile: dict | None = None,
    right_profile: dict | None = None,
    explain: bool = False,
):
    """SKETCH-GUIDED JOIN PLANNER: profile the key columns with the
    engine's own sketches, then dispatch the cheapest physical join.

    Decision procedure (each profile is one projected scan of a key
    column, moving only two sketch states):

    1. Profile the RIGHT side (:func:`join_profile`: exact row count
       from the Top-K CMS ``all_sum``, HLL distinct estimate, heavy
       hitters).  If it holds ≤ ``broadcast_threshold`` rows (and
       ``how`` != outer), materialize it and run
       :func:`broadcast_hash_join` — zero shuffle.
    2. Otherwise profile the LEFT side too.  Keys whose frequency on
       EITHER side reaches ``max(skew_frac, 4/num_buckets)`` — i.e.
       they would overload a shuffle bucket; a uniform small key domain
       is not skew — become ``hot_keys`` for the salted shuffle join
       (hot build rows replicate ×``n_salts``, hot probe rows
       scatter); with no hot keys it is a plain :func:`hash_join`.
       ``num_buckets`` defaults from the profiled row counts
       (~250k rows/bucket, clamped to [16, 256]).
    3. BLOOM RUNTIME FILTER (shuffle path, ``inner``/``semi`` only —
       the joins where a probe row without a build-side key cannot
       reach the output): when the build side's HLL distinct estimate
       is both ≤ ``bloom_ratio`` × the probe side's (most probe keys
       can't match) and ≤ ``bloom_max_distinct`` (the filter stays
       broadcastable — ~1.2 bytes/key at 1% FPP), build a Bloom over
       the build keys (one extra key-only scan) and prune the probe
       side BEFORE its shuffle.  False positives flow through and are
       dropped by the exact match — output unchanged; the win is probe
       bytes that never cross the wire.  ``left``/``anti``/``outer``
       never prune (unmatched probe rows ARE output), and probes under
       ``bloom_min_probe_rows`` skip it — measured single-node
       (BASELINE.md): the prune loses at a 1M-row probe (filter build >
       in-memory shuffle saved), is noise-neutral at 4M, and wins 1.9×
       at 64M (8.7 s vs 16.8 s — the unpruned 64M shuffle also risks
       object-store spill blowups the prune avoids entirely); on a real
       network the crossover is lower, so lower the floor there.

    All three physical plans produce the identical output SET (tested);
    ``outer`` always takes the unsalted shuffle path.  At 100 TB the
    profile pass is the cheap insurance that keeps a mis-sized
    broadcast or an unsalted zipf key from dominating the job.  With
    ``explain=True`` returns ``(dataset, plan_dict)``.
    """
    rkey = right_key or key
    # profile the right side in the LEFT key's representation — the join
    # casts right->left before matching, so cross-side statistics (hot
    # keys, CMS inner product, the Bloom filter) must sketch post-cast
    # key strings or mixed-type keys silently stop matching
    key_type = _arrow_schema(left).field(key).type
    rkey_type = _arrow_schema(right).field(rkey).type
    norm = key_type if rkey_type != key_type else None
    # callers joining the same table repeatedly can pass cached
    # join_profile() results to skip the profile scans; validated
    # against the cast this join needs (a profile sketched in the wrong
    # representation silently breaks hot-key/bloom/inner-product stats)
    want_cast = str(norm) if norm is not None else None
    if right_profile is not None and right_profile.get("cast_to") != want_cast:
        raise ValueError(
            f"auto_join: right_profile was built with cast_to="
            f"{right_profile.get('cast_to')!r} but this join needs {want_cast!r} "
            f"(rebuild with join_profile(right, {rkey!r}, cast_to=<left key type>))")
    if right_profile is not None and right_profile.get("key") != rkey:
        raise ValueError(
            f"auto_join: right_profile was built over column "
            f"{right_profile.get('key')!r} but this join keys on {rkey!r} "
            f"(rebuild with join_profile(right, {rkey!r}, ...))")
    rprof = right_profile or join_profile(right, rkey, k=profile_k, cast_to=norm)
    plan = {"right_rows": rprof["rows"], "right_rows_total": rprof["rows_total"],
            "right_distinct": rprof["distinct"]}
    # gate on TOTAL rows (incl. null keys): broadcast materializes the
    # whole table before nulls are filtered
    if how != "outer" and rprof["rows_total"] <= broadcast_threshold:
        import ray

        need = [rkey] + list(right_cols)
        refs = right.select_columns(need).to_arrow_refs()
        tbls = [t for t in ray.get(refs) if t.num_rows] if refs else []
        if tbls:
            tbl = pa.concat_tables(tbls)
        else:
            rschema = _arrow_schema(right)
            tbl = pa.table({c: pa.nulls(0, type=rschema.field(c).type) for c in need})
        plan["strategy"] = "broadcast"
        out = broadcast_hash_join(
            left, tbl, key=key, right_key=rkey,
            left_cols=left_cols, right_cols=right_cols, how=how,
        )
    else:
        if left_profile is not None and left_profile.get("cast_to") is not None:
            raise ValueError(
                "auto_join: left_profile must be built without cast_to "
                "(the left side IS the join's key representation)")
        if left_profile is not None and left_profile.get("key") != key:
            raise ValueError(
                f"auto_join: left_profile was built over column "
                f"{left_profile.get('key')!r} but this join keys on {key!r} "
                f"(rebuild with join_profile(left, {key!r}))")
        lprof = left_profile or join_profile(left, key, k=profile_k)
        plan["left_rows"] = lprof["rows"]
        if lprof.get("cms") is not None and rprof.get("cms") is not None:
            # CMS inner product = estimated inner-join output rows —
            # surfaced so callers can veto an exploding many-to-many
            # join before any shuffle is scheduled
            plan["est_output_rows"] = estimate_join_size(lprof, rprof)
        if num_buckets is None:
            num_buckets = int(min(256, max(16, (lprof["rows"] + rprof["rows"]) // 250_000 + 1)))
        # a key is hot only if it would OVERLOAD a bucket: its share of
        # either side exceeds 4x the average bucket's (and the caller's
        # skew_frac floor) — a uniform small key domain is NOT skew
        hot_threshold = max(skew_frac, 4.0 / num_buckets)
        hot = sorted({h for h, f in lprof["hot"] + rprof["hot"] if f >= hot_threshold})
        plan.update(hot_keys=hot, num_buckets=num_buckets)
        plan["bloom_prune"] = None
        if (
            bloom_prune
            and how in ("inner", "semi")
            and lprof["rows_total"] >= bloom_min_probe_rows
            and rprof["distinct"] <= bloom_max_distinct
            and rprof["distinct"] < bloom_ratio * max(lprof["distinct"], 1.0)
        ):
            import ray

            from ..kernels.bloom import BloomSpec
            from .membership import MembershipFilter

            n_items = max(1024, int(rprof["distinct"] * 1.3))
            state = _build_key_bloom(
                right, rkey, BloomSpec.from_params(n_items, 0.01), cast_to=norm)
            # batch_size=None: whole-block batches AND read->filter
            # fusion (the default 1024 would re-batch a multi-million
            # row probe into thousands of tiny batches and force an
            # extra object-store hop)
            left = left.map_batches(
                MembershipFilter(ray.put(state), "bloom", key),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
            plan["bloom_prune"] = {"num_items": n_items}
        use_salt = bool(hot) and how != "outer"
        plan["strategy"] = "salted" if use_salt else "shuffle"
        out = hash_join(
            left, right, key=key, right_key=right_key,
            left_cols=left_cols, right_cols=right_cols, how=how,
            num_buckets=num_buckets,
            hot_keys=hot if use_salt else None,
            n_salts=n_salts,
        )
    return (out, plan) if explain else out
