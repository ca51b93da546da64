"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — the exactness baseline: the (small) query
  matrix is broadcast once (``ray.put``); every batch computes a numpy
  matmul against it and emits its local top-k per query; a final tiny
  ``groupby(query_id)`` reduces local top-ks to the global top-k.  At
  100 TB this streams: per-batch state is O(n_queries * k).
* ``ivf_topk`` — the scale path: a k-means codebook trained on a small
  sample (driver-side, seeded), vectors assigned to their nearest
  centroid at index-build time (one pass), queries probed only against
  the ``nprobe`` nearest centroid partitions — an inverted-file (IVF)
  index expressed as a partitioned Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]


class _BatchTopK:
    def __init__(self, queries_ref, id_col: str, emb_col: str, k: int):
        # store the REF; resolve lazily per worker (zero-copy plasma get)
        self._qref = queries_ref
        self._q = None
        self.id_col, self.emb_col, self.k = id_col, emb_col, k

    @property
    def q(self):
        if self._q is None:
            import ray

            raw = self._qref if isinstance(self._qref, np.ndarray) else ray.get(self._qref)
            self._q = _normalize(np.asarray(raw, dtype=np.float64))  # (nq, dim)
        return self._q

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if batch.num_rows == 0:  # empty upstream block: typed empty out
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                self.id_col: batch[self.id_col],
                "cosine": pa.array([], pa.float64()),
            })
        emb = _normalize(np.stack(batch[self.emb_col].to_numpy(zero_copy_only=False)).astype(np.float64))
        sims = self.q @ emb.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            # deterministic local prune (cosine desc, id asc): argpartition
            # would drop TIED candidates at the k boundary arbitrarily,
            # making the global result depend on block boundaries
            top = np.lexsort((ids, -sims[qi]))[:k]
            rows_q.extend([qi] * k)
            rows_v.extend(ids[top])
            rows_s.extend(sims[qi, top])
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int64()),
                self.id_col: pa.array(rows_v),
                "cosine": pa.array(rows_s, pa.float64()),
            }
        )



def _finalize_topk(local, *, k: int, score_col: str, id_col: str):
    """Tiny global per-query top-k reduce as ONE task.

    The survivors are bounded at k x nq x #blocks rows (map-side prune),
    so a single-task funnel beats Ray's sort-based groupby here: no
    ~0.7s all-to-all fixed cost, and no empty sort partitions (which
    re-emerge as schema-less RefBundles and warn) when the partition
    count exceeds the handful of distinct query_ids.  Same pattern as
    rank.global_topn; at ~10^6 blocks switch to a 2-level funnel.
    """
    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", score_col, id_col],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)

    return local.repartition(1).map_batches(_topk, batch_format="pandas",
                                            batch_size=None)

def brute_force_topk(ds, queries: np.ndarray, *, id_col="vec_id", emb_col="embedding", k=10, concurrency=None):
    """Exact cosine top-k of each query row against the dataset.

    Returns Dataset[query_id, vec_id, cosine] with exactly k rows per query.
    Ties at the k-boundary break by (cosine desc, vec_id asc) — stable.
    """
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    # stateless-task dispatch (pickled instance): warm-worker reuse; an
    # actor pool sized near num_cpus can starve upstream stages
    local = ds.map_batches(
        _BatchTopK(qref, id_col, emb_col, k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    return _finalize_topk(local, k=k, score_col="cosine", id_col=id_col)


def threshold_search(ds, queries: np.ndarray, *, id_col="vec_id", emb_col="embedding",
                     threshold: float, concurrency=None, include_score: bool = True):
    """All (query_id, vec_id) with cosine >= threshold — embarrassingly
    parallel (no final reduce at all): each batch emits its own hits.
    ``include_score=False`` drops the cosine column inside the UDF
    (cheaper than a trailing projection op)."""
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    qref = ray.put(_normalize(np.asarray(queries, dtype=np.float64)))

    class _Thresh:
        def __init__(self):
            self.q = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.q is None:
                self.q = ray.get(qref)
            if batch.num_rows == 0:
                out = {"query_id": pa.array([], pa.int64()), id_col: batch[id_col]}
                if include_score:
                    out["cosine"] = pa.array([], pa.float64())
                return pa.table(out)
            emb = _normalize(np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            sims = self.q @ emb.T
            qi, vi = np.where(sims >= threshold)
            out = {
                "query_id": pa.array(qi.astype(np.int64)),
                id_col: pa.array(ids[vi]),
            }
            if include_score:
                out["cosine"] = pa.array(sims[qi, vi], pa.float64())
            return pa.table(out)

    return ds.map_batches(_Thresh(), batch_format="pyarrow", concurrency=concurrency)


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant
# ---------------------------------------------------------------------------

def train_codebook(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample (the small side)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = sample[mask].mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_partition(ds, codebook: np.ndarray, *, emb_col="embedding", concurrency=None):
    """Assign each vector to its nearest centroid (adds ``centroid`` col)."""
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    # normalized like every other IVF path: probe selection and gating
    # must share one geometry (cosine), or recall silently degrades for
    # non-unit codebooks
    cref = ray.put(_normalize(np.asarray(codebook, dtype=np.float64)))

    class _Assign:
        def __init__(self):
            self.cent = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.cent is None:
                self.cent = ray.get(cref)
            if batch.num_rows == 0:
                return batch.append_column("centroid", pa.array([], pa.int64()))
            emb = _normalize(np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64))
            assign = np.argmax(emb @ self.cent.T, axis=1)
            return batch.append_column("centroid", pa.array(assign.astype(np.int64)))

    return ds.map_batches(_Assign(), batch_format="pyarrow", concurrency=concurrency)


def ivf_write_partitioned(ds, codebook: np.ndarray, out_dir: str, *,
                          emb_col="embedding", concurrency=None) -> str:
    """Build the READ-LEVEL IVF index: write the vector table as
    Hive-partitioned parquet, one directory per centroid
    (``centroid=<c>/``), in one distributed pass.  A probe then serves
    from ``read_parquet`` over only its ``nprobe`` directories, so
    unprobed partitions never leave storage — the 100-TB ANN shape end
    to end."""
    assigned = ivf_partition(ds, codebook, emb_col=emb_col, concurrency=concurrency)
    # strip pandas schema metadata before writing: files carrying it make
    # hash(schema) raise inside Ray's read-side schema dedup on every probe
    assigned = assigned.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )
    assigned.write_parquet(out_dir, partition_cols=["centroid"])
    return out_dir


def ivf_topk_partitioned(index_dir: str, queries: np.ndarray, codebook: np.ndarray, *,
                         id_col="vec_id", emb_col="embedding", k=10, nprobe=4,
                         concurrency=None):
    """ANN top-k over an :func:`ivf_write_partitioned` index, reading
    ONLY the union of the queries' ``nprobe`` probed centroid
    directories (storage-level pruning; per-query masking inside the
    scan stays exact w.r.t. each query's own probe list).

    Returns (result Dataset, probed centroid list)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.datasource.partitioning import Partitioning, PathPartitionFilter

    q = _normalize(np.asarray(queries, dtype=np.float64))
    cb = _normalize(np.asarray(codebook, dtype=np.float64))
    probe = np.argsort(-(q @ cb.T), axis=1)[:, :nprobe]
    probed = sorted({int(c) for c in probe.ravel()})
    probed_set = {str(c) for c in probed}
    # path-level pruning: unprobed centroid=<c>/ directories are filtered
    # OUT of the file listing before any byte is read
    flt = PathPartitionFilter.of(lambda kv: kv.get("centroid") in probed_set, style="hive")
    ds = rd.read_parquet(index_dir, partition_filter=flt, partitioning=Partitioning("hive"))

    def _cast(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("centroid")
        return batch.set_column(idx, "centroid", pc.cast(batch["centroid"], pa.int64()))

    ds = ds.map_batches(_cast, batch_format="pyarrow")
    out = ivf_topk(ds, queries, codebook, id_col=id_col, emb_col=emb_col,
                   k=k, nprobe=nprobe, concurrency=concurrency, centroid_col="centroid")
    return out, probed


def ivf_topk(ds, queries: np.ndarray, codebook: np.ndarray, *, id_col="vec_id", emb_col="embedding",
             k=10, nprobe=4, concurrency=None, centroid_col: str | None = None):
    """ANN top-k probing only the nprobe nearest centroid partitions.

    COMPUTE-pruned (round-1 verdict fix): each batch first drops every
    vector whose centroid no query probes (a uint8 table lookup), so the
    scoring matmul touches only ~nprobe/n_centroids of the data — not
    score-all-then-mask.  Pass ``centroid_col`` to reuse a precomputed
    assignment (``ivf_partition``) and skip the assignment matmul too —
    at scale the centroid column lives in the parquet layout and whole
    partitions prune at the read.  Recall < 1 by design (a true neighbor
    can live in an unprobed partition); tests measure recall vs brute
    force.
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    cb = _normalize(np.asarray(codebook, dtype=np.float64))
    probe = np.argsort(-(q @ cb.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    allowed = np.zeros((len(q), len(cb)), dtype=bool)
    for qi in range(len(q)):
        allowed[qi, probe[qi]] = True
    bref = ray.put((q, cb, allowed, allowed.any(axis=0)))

    class _IVFLocal:
        def __init__(self):
            self.q = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.q is None:
                self.q, self.cb, self.allowed, self.any_probed = ray.get(bref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            if centroid_col is not None and centroid_col in batch.column_names:
                cent = batch[centroid_col].to_numpy(zero_copy_only=False)
                keep = self.any_probed[cent]
                emb = None
            else:
                emb = _normalize(np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64))
                cent = np.argmax(emb @ self.cb.T, axis=1)
                keep = self.any_probed[cent]
            if not keep.any():
                return  # generator UDF: yield nothing, emit no empty block
            if emb is None:
                emb = _normalize(
                    np.stack(batch[emb_col].to_numpy(zero_copy_only=False)[keep]).astype(np.float64)
                )
            else:
                emb = emb[keep]
            ids, cent = ids[keep], cent[keep]
            sims = self.q @ emb.T  # (nq, n_kept) — pruned matmul
            sims = np.where(self.allowed[:, cent], sims, -np.inf)
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows_q, rows_v, rows_s = [], [], []
            for qi in range(sims.shape[0]):
                sel = top[qi][np.isfinite(sims[qi, top[qi]])]
                rows_q.extend([qi] * len(sel))
                rows_v.extend(ids[sel])
                rows_s.extend(sims[qi, sel])
            if not rows_q:
                return  # all candidates -inf masked: emit no empty block
            yield pa.table(
                {
                    "query_id": pa.array(rows_q, pa.int64()),
                    id_col: pa.array(np.asarray(rows_v, dtype=ids.dtype)),
                    "cosine": pa.array(rows_s, pa.float64()),
                }
            )

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    local = ds.map_batches(_IVFLocal(), batch_format="pyarrow", concurrency=concurrency)

    return _finalize_topk(local, k=k, score_col="cosine", id_col=id_col)

# ---------------------------------------------------------------------------
# distributed k-means (full-corpus Lloyd's — corpus clustering / codebook
# training at scale; train_codebook above is the driver-side-sample variant)
# ---------------------------------------------------------------------------

def kmeans_fit(ds, *, emb_col: str = "embedding", k: int = 8, iters: int = 5,
               concurrency=None):
    """Distributed spherical k-means over the FULL vector table.

    Lloyd's iterations, each one streaming pass: centroids broadcast
    once per iteration (``ray.put``), every block emits at most k
    partial rows (cluster, count, sum-vector bytes, partial inertia),
    and the k × blocks partials — k·dim doubles, tiny at any corpus
    size — are reduced on the driver in a DETERMINISTIC order (sorted
    by cluster, count, payload) so the fit is bit-reproducible for any
    block scheduling.  Empty clusters keep their previous centroid.
    Spherical (unit-normalized, cosine geometry) to match the ANN
    stages; inertia = Σ (1 - cosine-to-nearest).

    Pass a MATERIALIZED (or cheap-to-recompute projected) dataset:
    every iteration re-consumes ``ds``.

    Returns ``(codebook (k, dim) ndarray, inertia float)``.
    """
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)

    # deterministic init on a bounded STREAMING prefix (limit() pulls
    # only leading blocks — never a full-table driver read):
    # farthest-first traversal (k-means++-shaped, fully deterministic)
    # — random init routinely lands two seeds in one tight cluster and
    # Lloyd cannot escape that local minimum
    boot = ds.limit(max(64 * k, 256)).to_pandas()
    if emb_col not in boot.columns or len(boot) == 0:
        raise ValueError(
            f"kmeans_fit: input has zero rows (or no {emb_col!r} "
            "column) — cannot seed k centroids from an empty corpus")
    sample = _normalize(np.stack(boot[emb_col].to_numpy()).astype(np.float64))
    mean_dir = _normalize(sample.mean(axis=0, keepdims=True))[0]
    seeds = [int(np.argmin(sample @ mean_dir))]
    best = sample @ sample[seeds[0]]
    for _ in range(1, min(k, len(sample))):
        nxt = int(np.argmin(best))
        seeds.append(nxt)
        best = np.maximum(best, sample @ sample[nxt])
    cent = sample[seeds].copy()
    for _ in range(3):  # local polish on the boot sample
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = sample[mask].mean(axis=0)
        cent = _normalize(cent)
    k_eff, dim = cent.shape

    inertia = float("nan")
    for _ in range(iters):
        cref = ray.put(cent)

        class _Partial:
            def __init__(self):
                self.cent = None

            def __call__(self, batch: pa.Table) -> pa.Table:
                if self.cent is None:
                    self.cent = ray.get(cref)
                if batch.num_rows == 0:
                    return pa.table({
                        "cluster": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "vecsum": pa.array([], pa.binary()),
                        "inertia": pa.array([], pa.float64()),
                    })
                emb = _normalize(np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64))
                sims = emb @ self.cent.T
                assign = np.argmax(sims, axis=1)
                best = sims[np.arange(len(emb)), assign]
                sums = np.zeros((len(self.cent), emb.shape[1]), dtype=np.float64)
                np.add.at(sums, assign, emb)
                counts = np.bincount(assign, minlength=len(self.cent)).astype(np.int64)
                inert = np.zeros(len(self.cent), dtype=np.float64)
                np.add.at(inert, assign, 1.0 - best)
                present = np.flatnonzero(counts)
                return pa.table({
                    "cluster": pa.array(present.astype(np.int64)),
                    "n": pa.array(counts[present]),
                    "vecsum": pa.array([sums[c].tobytes() for c in present], pa.binary()),
                    "inertia": pa.array(inert[present]),
                })

        parts = ds.map_batches(_Partial(), batch_format="pyarrow", concurrency=concurrency)
        rows = parts.to_pandas()
        # deterministic reduce order — independent of block arrival
        rows = rows.sort_values(["cluster", "n", "vecsum"], kind="stable")
        new_cent = cent.copy()
        inertia = 0.0
        for c, grp in rows.groupby("cluster", sort=True):
            total = np.zeros(dim, dtype=np.float64)
            for blob in grp["vecsum"]:
                total += np.frombuffer(blob, dtype=np.float64)
            n = int(grp["n"].sum())
            if n:
                new_cent[int(c)] = total / n
            inertia += float(grp["inertia"].sum())
        cent = _normalize(new_cent)
    return cent, inertia


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-domain ANN scale path
# ---------------------------------------------------------------------------

def pq_train(sample: np.ndarray, *, m_subspaces: int = 8, n_codes: int = 256,
             iters: int = 12, seed: int = 11) -> np.ndarray:
    """Train PQ codebooks (Jégou, Douze, Schmid, "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011) on a driver-side sample.

    Vectors are unit-normalized (cosine geometry, matching every other
    ANN stage here), split into ``m_subspaces`` contiguous subvectors,
    and each subspace gets an independent L2 k-means codebook.  Returns
    ``(m, n_codes, dim/m)`` float64.  Deterministic: seeded init,
    fixed iteration count, ties broken by argmin order.
    """
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    n, dim = sample.shape
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    dsub = dim // m_subspaces
    if n_codes > 256:
        raise ValueError("n_codes must be <= 256 (one byte per subspace code)")
    n_codes = min(n_codes, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m_subspaces, n_codes, dsub), dtype=np.float64)
    for mi in range(m_subspaces):
        sub = sample[:, mi * dsub:(mi + 1) * dsub]
        cent = sub[rng.choice(n, size=n_codes, replace=False)].copy()
        for _ in range(iters):
            d = -2.0 * (sub @ cent.T) + (cent * cent).sum(axis=1)[None, :]
            assign = np.argmin(d, axis=1)
            for c in range(n_codes):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        books[mi] = cent
    return books


class _PQEncode:
    """Task callable: unit-normalize, quantize each subvector to its
    nearest codebook entry.  Codebooks resolve once per worker."""

    def __init__(self, books_ref, id_col: str, emb_col: str):
        self._ref, self._books = books_ref, None
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._books is None:
            import ray

            self._books = ray.get(self._ref) if not isinstance(self._ref, np.ndarray) else self._ref
        books = self._books
        m, n_codes, dsub = books.shape
        if batch.num_rows == 0:  # ivfpq's gate routinely empties blocks
            from .dedup import rows_to_binary

            return pa.table({
                self.id_col: batch[self.id_col],
                "pq_code": rows_to_binary(np.empty((0, m), dtype=np.uint8)),
            })
        emb = _normalize(np.stack(batch[self.emb_col].to_numpy(zero_copy_only=False)).astype(np.float64))
        codes = np.empty((len(emb), m), dtype=np.uint8)
        for mi in range(m):
            sub = emb[:, mi * dsub:(mi + 1) * dsub]
            d = -2.0 * (sub @ books[mi].T) + (books[mi] * books[mi]).sum(axis=1)[None, :]
            codes[:, mi] = np.argmin(d, axis=1)
        from .dedup import rows_to_binary

        return pa.table({
            self.id_col: batch[self.id_col],
            "pq_code": rows_to_binary(codes),
        })


def pq_encode(ds, codebooks: np.ndarray, *, id_col="vec_id", emb_col="embedding",
              concurrency=None):
    """Dataset[id, embedding] -> Dataset[id, pq_code] (m bytes per vector
    for 256-entry codebooks — a 32x compression of float64x64 that is
    what makes 100 TB of embeddings searchable from worker RAM)."""
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    bref = ray.put(np.asarray(codebooks, dtype=np.float64))
    return ds.map_batches(_PQEncode(bref, id_col, emb_col),
                          batch_format="pyarrow", concurrency=concurrency)


class _PQScore:
    """ADC (asymmetric distance computation): per-query lookup tables
    q_sub @ codebook_m.T, then approx cosine = sum_m LUT[m, code_m] —
    one uint8 gather + sum per vector, no float reconstruction."""

    def __init__(self, qref, books_ref, id_col: str, k: int):
        self._qref, self._bref = qref, books_ref
        self._luts = None
        self.id_col, self.k = id_col, k

    def _tables(self):
        if self._luts is None:
            import ray

            q = _normalize(np.asarray(ray.get(self._qref), dtype=np.float64))
            books = ray.get(self._bref)
            m, n_codes, dsub = books.shape
            luts = np.empty((len(q), m, n_codes), dtype=np.float64)
            for mi in range(m):
                luts[:, mi, :] = q[:, mi * dsub:(mi + 1) * dsub] @ books[mi].T
            self._luts = luts
        return self._luts

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import binary_to_rows

        luts = self._tables()
        m = luts.shape[1]
        codes = binary_to_rows(batch["pq_code"].to_numpy(zero_copy_only=False), m, np.uint8)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        nq = luts.shape[0]
        rows_q, rows_v, rows_s = [], [], []
        midx = np.arange(m)
        for qi in range(nq):
            scores = luts[qi][midx[None, :], codes].sum(axis=1)
            k = min(self.k, len(scores))
            top = np.argpartition(-scores, k - 1)[:k]
            rows_q.extend([qi] * k)
            rows_v.extend(ids[top])
            rows_s.extend(scores[top])
        return pa.table({
            "query_id": pa.array(rows_q, pa.int64()),
            self.id_col: pa.array(rows_v),
            "pq_cosine": pa.array(rows_s, pa.float64()),
        })


def pq_topk(codes_ds, queries: np.ndarray, codebooks: np.ndarray, *,
            id_col="vec_id", k=10, concurrency=None):
    """Approximate cosine top-k in the COMPRESSED domain: per-block ADC
    scan + local top-k, one tiny per-query global reduce.  Same output
    shape as brute_force_topk with a ``pq_cosine`` score column; recall
    vs the exact scan is bound-tested in tests/test_ann.py."""
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    bref = ray.put(np.asarray(codebooks, dtype=np.float64))
    local = codes_ds.map_batches(
        _PQScore(qref, bref, id_col, k),
        batch_format="pyarrow", concurrency=concurrency,
    )

    return _finalize_topk(local, k=k, score_col="pq_cosine", id_col=id_col)


def ivfpq_topk(ds, queries: np.ndarray, codebook: np.ndarray, pq_books: np.ndarray, *,
               id_col="vec_id", emb_col="embedding", k=10, nprobe=2, concurrency=None):
    """IVF + PQ composed (the IVFADC shape of Jégou et al. 2011, without
    residual encoding): the coarse codebook routes each vector to a
    centroid partition; only the ``nprobe`` partitions nearest to any
    query are PQ-ENCODED and ADC-scanned — unprobed vectors are dropped
    by a cheap batch filter before any encoding work, and the scan reads
    one byte per subspace instead of the float vector.  At storage scale
    pair this with ivf_write_partitioned so unprobed partitions never
    leave disk (see test_ivf_partitioned_index_prunes_at_read)."""
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    cent = _normalize(np.asarray(codebook, dtype=np.float64))  # cosine, like ivf_topk
    sims = q @ cent.T
    probe = set()
    for qi in range(len(q)):
        probe.update(np.argsort(-sims[qi])[:nprobe].tolist())
    probed = sorted(int(c) for c in probe)
    cref = ray.put(cent)
    probe_arr = np.array(probed, dtype=np.int64)

    class _Gate:
        def __init__(self):
            self.cent = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.cent is None:
                self.cent = ray.get(cref)
            if batch.num_rows == 0:
                return batch
            emb = _normalize(np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64))
            assign = np.argmax(emb @ self.cent.T, axis=1)
            return batch.filter(pa.array(np.isin(assign, probe_arr)))

    gated = ds.map_batches(_Gate(), batch_format="pyarrow", concurrency=concurrency)
    codes = pq_encode(gated, pq_books, id_col=id_col, emb_col=emb_col,
                      concurrency=concurrency)
    return pq_topk(codes, queries, pq_books, id_col=id_col, k=k,
                   concurrency=concurrency)
