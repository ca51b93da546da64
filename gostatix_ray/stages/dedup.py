"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (ray_guide "Exact dedup" / "Near-dup"):
* exact: content-hash column in a vectorized ``map_batches``, then
  ``groupby(hash)`` keep-first — the shuffle moves only (hash, id) pairs
  when ``project=True``;
* MinHash-LSH: shingle -> minhash signature per doc (vectorized: one
  (n_docs, num_perm) matrix per batch) -> explode to
  (band_id, band_hash, doc_id) rows -> ``groupby(band)`` -> candidate
  pairs -> signature-Jaccard filter.  Only signatures shuffle, never
  text;
* SimHash: 64-bit fingerprint; band tables catch small hamming radii;
* embedding near-dup: random-hyperplane LSH buckets, exact cosine
  within buckets.

All hashing is seeded/deterministic => reruns and retries agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import SEED_MINHASH, SEED_SIMHASH, hash128

_MERSENNE = np.uint64((1 << 61) - 1)


def bucketed_groupby(ds, key_cols: list[str], fn, *, num_buckets: int = 64):
    """groupby with per-BLOCK (not per-group) Python dispatch.

    ``groupby(keys).map_groups`` pays a Python call per group — ruinous
    when groups are tiny and numerous (LSH buckets, content hashes).
    Instead: bucket = hash(keys) % num_buckets, ONE shuffle on the coarse
    bucket, and ``fn`` receives a DataFrame holding *all* rows of a
    bucket (complete key-groups, many at once) to process with
    vectorized pandas.
    """
    import pyarrow.compute as pc

    from ..hashing import hash128

    def _bucket(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch[key_cols[0]], pa.string())
        for c in key_cols[1:]:
            key = pc.binary_join_element_wise(key, pc.cast(batch[c], pa.string()), "\x1f")
        h1, _ = hash128(key, 31)
        return batch.append_column("__bucket", pa.array((h1 % np.uint64(num_buckets)).astype(np.int64)))

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: fn(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


def add_content_hash(ds, text_col: str = "text", out_col: str = "content_hash", hex: bool = False):
    """Append the 128-bit content hash as TWO uint64 columns
    ``{out_col}_1`` / ``{out_col}_2`` (the shuffle key is multi-column;
    no per-row hex formatting in the hot path).  ``hex=True`` adds a
    32-char hex presentation column ``out_col`` (vectorized)."""

    def _h(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h1, h2 = hash128(col, 0)
        batch = batch.append_column(f"{out_col}_1", pa.array(h1))
        batch = batch.append_column(f"{out_col}_2", pa.array(h2))
        if hex:
            from ..hashing import hex128

            batch = batch.append_column(out_col, pa.array(hex128(h1, h2)))
        return batch

    return ds.map_batches(_h, batch_format="pyarrow")


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", keep: str = "min"):
    """One survivor per distinct text: the min (or max) id.

    128-bit content hash => collision probability ~n^2/2^129; the hash
    columns (not the text) are the shuffle key, so the wide op moves tiny
    (uint64, uint64, id) rows when the caller pre-projects
    [id_col, text_col].
    """
    hashed = add_content_hash(ds, text_col)

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        agg = "min" if keep == "min" else "max"
        out = df.groupby(["content_hash_1", "content_hash_2"], as_index=False, sort=False)[id_col].agg(agg)
        return out[[id_col]]

    return bucketed_groupby(
        hashed.select_columns([id_col, "content_hash_1", "content_hash_2"]),
        ["content_hash_1", "content_hash_2"],
        _keep,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE) - 1, num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE) - 1, num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(texts: pa.Array, shingle: int) -> tuple[np.ndarray, np.ndarray]:
    """Word-shingle 64-bit hashes; returns (flat hashes, per-doc lengths)."""
    toks = pc.split_pattern(texts, pattern=" ")
    flat = pc.list_flatten(toks)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    th, _ = hash128(flat, SEED_MINHASH)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    # shingle hash = FNV-style mix of `shingle` consecutive token hashes,
    # computed globally on the flat array; windows crossing a doc boundary
    # are masked out (no per-doc Python loop)
    n_docs = len(lengths)
    sh_counts = np.maximum(lengths - shingle + 1, 1)
    out = np.empty(int(sh_counts.sum()), dtype=np.uint64)
    out_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(sh_counts, out=out_off[1:])
    N = th.size
    FNV = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        if N >= shingle:
            acc = th[: N - shingle + 1].copy()
            for j in range(1, shingle):
                acc = acc * FNV ^ th[j : N - shingle + 1 + j]
        else:
            acc = np.empty(0, np.uint64)
        doc_idx = np.repeat(np.arange(n_docs), lengths)
        long_docs = lengths >= shingle
        if acc.size:
            valid = doc_idx[: N - shingle + 1] == doc_idx[shingle - 1 :]
            acc_valid = acc[valid]
            # scatter the valid windows into their per-doc output slots
            dst = np.concatenate(
                [np.arange(out_off[i], out_off[i] + sh_counts[i]) for i in np.flatnonzero(long_docs)]
            ) if long_docs.any() else np.empty(0, np.int64)
            out[dst] = acc_valid
        # short docs (len < shingle): mix whatever tokens exist
        for i in np.flatnonzero(~long_docs):
            seg = th[offsets[i] : offsets[i + 1]]
            mixed = np.uint64(0) if seg.size == 0 else seg[0]
            for j in range(1, seg.size):
                mixed = mixed * FNV ^ seg[j]
            out[out_off[i]] = mixed
    return out, sh_counts


def minhash_signatures_batch(texts: pa.Array, num_perm: int, shingle: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signature matrix.

    Fully vectorized: universal-hash all shingles against all
    permutations at once ((n_shingles, num_perm) matrix), then segment-min
    per doc with ``np.minimum.reduceat``.  Docs are processed in chunks
    so the intermediate matrix stays ~32 MB regardless of batch size.
    """
    sh, counts = _shingle_hashes(texts, shingle)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    n_docs = len(counts)
    sigs = np.empty((n_docs, num_perm), dtype=np.uint64)
    target = max(1, (4 << 20) // num_perm)  # shingles per chunk
    start_doc = 0
    with np.errstate(over="ignore"):
        while start_doc < n_docs:
            end_doc = start_doc
            while end_doc < n_docs and (offsets[end_doc + 1] - offsets[start_doc]) < target:
                end_doc += 1
            end_doc = max(end_doc, start_doc + 1)
            seg = sh[offsets[start_doc] : offsets[end_doc]]
            vals = (a[None, :] * seg[:, None] + b[None, :]) % _MERSENNE
            local_off = (offsets[start_doc : end_doc] - offsets[start_doc]).astype(np.int64)
            sigs[start_doc:end_doc] = np.minimum.reduceat(vals, local_off, axis=0)
            start_doc = end_doc
    return sigs


class MinHashBands:
    """Actor: text -> exploded (band, band_hash, id, signature) rows."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int, shingle: int):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.shingle = num_perm, bands, shingle
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm, SEED_MINHASH)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sigs = minhash_signatures_batch(col, self.num_perm, self.shingle, self.a, self.b)
        n = len(col)
        band_hashes = np.empty((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for bi in range(self.bands):
                seg = sigs[:, bi * self.rows_per_band : (bi + 1) * self.rows_per_band]
                acc = np.full(n, np.uint64(1469598103934665603))
                for j in range(self.rows_per_band):
                    acc = (acc ^ seg[:, j]) * np.uint64(1099511628211)
                band_hashes[:, bi] = acc
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(band_hashes.T.ravel().astype(np.uint64)),
                self.id_col: pa.array(np.tile(ids, self.bands)),
                "sig": pa.array(list(np.tile(sigs, (self.bands, 1)))),
            }
        )


def minhash_candidate_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle: int = 3,
    threshold: float = 0.5,
    concurrency=None,
):
    """Near-duplicate candidate pairs with signature-estimated Jaccard.

    Returns Dataset[id_a, id_b, est_jaccard] (id_a < id_b, deduped).
    The ``groupby(band, band_hash)`` shuffle carries only ids +
    signatures.  Collision probability of a pair with Jaccard j is
    1-(1-j^r)^b (r=num_perm/bands) — thresholds derive from (b, r).
    """
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    exploded = ds.map_batches(
        MinHashBands,
        fn_constructor_args=(text_col, id_col, num_perm, bands, shingle),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "est_jaccard": pd.Series([], dtype="float64")})

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over MANY (band, band_hash) groups at once
        sizes = df.groupby(["band", "band_hash"])[id_col].transform("size")
        df = df[sizes > 1]
        if df.empty:
            return empty
        frames = []
        for _, g in df.groupby(["band", "band_hash"], sort=False):
            g = g.sort_values(id_col, kind="stable").drop_duplicates(subset=[id_col])
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            sigs = np.stack(g["sig"].to_numpy())
            # full pairwise signature-agreement matrix, vectorized
            ia, ib = np.triu_indices(len(ids), k=1)
            eq = (sigs[ia] == sigs[ib]).mean(axis=1)
            keep = eq >= threshold
            if keep.any():
                frames.append(
                    pd.DataFrame(
                        {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "est_jaccard": eq[keep]}
                    )
                )
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    pairs = bucketed_groupby(exploded, ["band", "band_hash"], _pairs)

    def _dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["id_a", "id_b"])

    pairs = pairs.materialize()  # candidate set is small; avoid re-execution
    if pairs.count() == 0:
        return pairs
    return bucketed_groupby(pairs, ["id_a", "id_b"], _dedupe)


def exact_jaccard_pairs(table: pa.Table, pairs: pd.DataFrame, text_col="text", id_col="doc_id", shingle=3) -> pd.DataFrame:
    """Exact n-gram Jaccard verification for candidate pairs (test oracle)."""
    texts = dict(zip(table[id_col].to_pylist(), table[text_col].to_pylist()))

    def shingles(t: str) -> set:
        ws = t.split(" ")
        if len(ws) < shingle:
            return {tuple(ws)}
        return {tuple(ws[i : i + shingle]) for i in range(len(ws) - shingle + 1)}

    jac = []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        jac.append(len(sa & sb) / max(1, len(sa | sb)))
    out = pairs.copy()
    out["jaccard"] = jac
    return out


def duplicate_clusters(pairs, *, max_rounds: int = 8):
    """Connected components over candidate near-dup pairs: Dataset[id_a,
    id_b] -> Dataset[doc_id, cluster_id] (cluster_id = min member id).

    Distributed min-label propagation (ray_guide "Near-dup"): each round
    every node adopts the minimum label among itself and its neighbors
    (one groupby per round); converges in <= graph-diameter rounds,
    which for near-dup clusters (small, dense) is a handful.  The edge
    set streams through groupbys; only the *label table* (candidate
    nodes — typically a tiny fraction of the corpus) is broadcast per
    round (``ray.put``).  If candidates ever rival the corpus, swap the
    broadcast for a bucketed hash join on node id.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = pairs.select_columns(["id_a", "id_b"]).materialize()
    if edges.count() == 0:
        return rd.from_items([])

    def _sym(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [batch["id_a"].combine_chunks() if isinstance(batch["id_a"], pa.ChunkedArray) else batch["id_a"],
                     batch["id_b"].combine_chunks() if isinstance(batch["id_b"], pa.ChunkedArray) else batch["id_b"]]
                ),
                "peer": pa.concat_arrays(
                    [batch["id_b"].combine_chunks() if isinstance(batch["id_b"], pa.ChunkedArray) else batch["id_b"],
                     batch["id_a"].combine_chunks() if isinstance(batch["id_a"], pa.ChunkedArray) else batch["id_a"]]
                ),
            }
        )

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()
    # labels start as each node's own id
    labels = sym.groupby("node").aggregate(Min("peer", alias_name="nbr_min")).map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "label": pa.compute.min_element_wise(b["node"], b["nbr_min"]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(max_rounds):
        # join labels onto edges (small label table broadcast via driver map)
        lab = dict(zip(labels.to_pandas()["node"], labels.to_pandas()["label"]))
        import ray

        lab_ref = ray.put(lab)

        def _prop(batch: pa.Table) -> pa.Table:
            m = ray.get(lab_ref)
            node = batch["node"].to_numpy(zero_copy_only=False)
            peer = batch["peer"].to_numpy(zero_copy_only=False)
            peer_label = np.array([m[p] for p in peer])
            return pa.table({"node": pa.array(node), "cand": pa.array(peer_label)})

        new_labels = (
            sym.map_batches(_prop, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("cand", alias_name="nbr_min"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "label": pa.compute.min_element_wise(
                            pa.array([ray.get(lab_ref)[n] for n in b["node"].to_pylist()]),
                            b["nbr_min"],
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        old = labels.to_pandas().sort_values("node").reset_index(drop=True)
        new = new_labels.to_pandas().sort_values("node").reset_index(drop=True)
        labels = new_labels
        if old["label"].equals(new["label"]):
            break
    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "cluster_id": b["label"]}), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHash:
    """64-bit simhash per doc + band columns for radius-limited search."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", bands: int = 4):
        self.text_col, self.id_col, self.bands = text_col, id_col, bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, pattern=" ")
        flat = pc.list_flatten(toks)
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        th, _ = hash128(flat, SEED_SIMHASH)
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        bits = bits * 2 - 1  # +-1 votes
        doc_votes = np.add.reduceat(bits, offsets[:-1], axis=0) if len(flat) else np.zeros((len(lengths), 64))
        doc_votes[lengths == 0] = -1
        sim = (doc_votes > 0).astype(np.uint64)
        fp = np.zeros(len(lengths), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(64):
                fp |= sim[:, j] << np.uint64(j)
        from ..hashing import hex64

        cols = {
            self.id_col: batch[self.id_col],
            "simhash": pa.array(hex64(fp)),
        }
        for bi in range(self.bands):
            part = (fp >> np.uint64(bi * (64 // self.bands))) & np.uint64((1 << (64 // self.bands)) - 1)
            cols[f"band_{bi}"] = pa.array(part.astype(np.int64))
        return pa.table(cols)


def simhash_candidate_pairs(ds, *, text_col="text", id_col="doc_id", bands: int = 4,
                            max_hamming: int | None = None, concurrency=None):
    """Docs agreeing on any simhash band => candidate near-dup pairs.

    4 bands of 16 bits catch all pairs with hamming distance <= 3.  One
    explode (band_id, band_val) + ONE groupby — same shuffle shape as
    MinHash-LSH.  Optional ``max_hamming`` filters pairs exactly.
    """
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    fps = ds.map_batches(
        SimHash,
        fn_constructor_args=(text_col, id_col, bands),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def _explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = batch["simhash"].to_pylist()
        cols = {"band": [], "band_val": [], id_col: [], "simhash": []}
        for bi in range(bands):
            vals = batch[f"band_{bi}"].to_numpy(zero_copy_only=False)
            cols["band"].append(np.full(n, bi, dtype=np.int32))
            cols["band_val"].append(vals)
            cols[id_col].append(ids)
            cols["simhash"].append(sims)
        return pa.table(
            {
                "band": pa.array(np.concatenate(cols["band"])),
                "band_val": pa.array(np.concatenate(cols["band_val"])),
                id_col: pa.array(np.concatenate(cols[id_col])),
                "simhash": pa.array(sum(cols["simhash"], [])),
            }
        )

    exploded = fps.map_batches(_explode, batch_format="pyarrow")

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "hamming": pd.Series([], dtype="int64")})

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["band", "band_val"])[id_col].transform("size")
        df = df[sizes > 1]
        if df.empty:
            return empty
        out = []
        for _, g in df.groupby(["band", "band_val"], sort=False):
            g = g.sort_values(id_col, kind="stable").drop_duplicates(subset=[id_col])
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            sims = g["simhash"].to_numpy()
            ia, ib = np.triu_indices(len(ids), k=1)
            ham = np.array([hamming64(sims[x], sims[y]) for x, y in zip(ia, ib)])
            keep = ham <= (max_hamming if max_hamming is not None else 64)
            if keep.any():
                out.append(pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]}))
        return pd.concat(out, ignore_index=True) if out else empty

    pairs = bucketed_groupby(exploded, ["band", "band_val"], _pairs)

    def _dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["id_a", "id_b"])

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return pairs
    return bucketed_groupby(pairs, ["id_a", "id_b"], _dedupe)


def hamming64(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

class HyperplaneLSH:
    """Random-hyperplane bucket per embedding (seeded, deterministic)."""

    def __init__(self, emb_col: str, id_col: str, nbits: int, dim: int, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits))
        self.emb_col, self.id_col = emb_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch[self.emb_col].to_numpy(zero_copy_only=False))
        proj = emb @ self.planes > 0
        bucket = np.zeros(len(emb), dtype=np.int64)
        for j in range(proj.shape[1]):
            bucket |= proj[:, j].astype(np.int64) << j
        norms = np.linalg.norm(emb, axis=1)
        normed = emb / np.maximum(norms, 1e-12)[:, None]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "bucket": pa.array(bucket),
                "normed": pa.array(list(normed.astype(np.float32))),
            }
        )


def embedding_near_dup_pairs(
    ds, *, emb_col="embedding", id_col="vec_id", dim: int, threshold=0.95, nbits=8, concurrency=None
):
    """Cosine-similar pairs via hyperplane-LSH buckets + exact in-bucket check.

    A pair at cosine c collides in one bucket with prob (1-theta/pi)^nbits
    (theta=arccos c); near-dups (c>=0.95) collide with high probability;
    recall can be raised by multiple tables (union of runs with different
    seeds).
    """
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    bucketed = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_args=(emb_col, id_col, nbits, dim),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        df = df.sort_values(id_col, kind="stable")
        ids = df[id_col].to_numpy()
        m = np.stack(df["normed"].to_numpy()).astype(np.float64)
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cosine": sims[ia[keep], ib[keep]]})

    return bucketed.groupby("bucket").map_groups(_pairs, batch_format="pandas")
