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


def add_content_hash(ds, text_col: str = "text", out_col: str = "content_hash"):
    def _h(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h1, h2 = hash128(col, 0)
        hexes = np.char.add(
            np.vectorize(lambda x: format(x, "016x"))(h1.astype(object)),
            np.vectorize(lambda x: format(x, "016x"))(h2.astype(object)),
        )
        return batch.append_column(out_col, pa.array(hexes.astype(str)))

    return ds.map_batches(_h, batch_format="pyarrow")


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", keep: str = "min"):
    """One survivor per distinct text: the min (or max) id.

    128-bit content hash => collision probability ~n^2/2^129; the hash
    column (not the text) is the shuffle key, so the wide op moves tiny
    rows when the caller pre-projects [id_col, text_col].
    """
    hashed = add_content_hash(ds, text_col)

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        row = df.loc[[df[id_col].idxmin() if keep == "min" else df[id_col].idxmax()]]
        return row

    return (
        hashed.select_columns([id_col, "content_hash"])
        .groupby("content_hash")
        .map_groups(_keep, batch_format="pandas")
        .select_columns([id_col])
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
    # shingle hash = combined hash of `shingle` consecutive token hashes
    sh_counts = np.maximum(lengths - shingle + 1, 1)
    out = np.empty(int(sh_counts.sum()), dtype=np.uint64)
    pos = 0
    with np.errstate(over="ignore"):
        for i in range(len(lengths)):
            seg = th[offsets[i] : offsets[i + 1]]
            if seg.size == 0:
                out[pos] = 0
                pos += 1
                continue
            if seg.size < shingle:
                mixed = seg[0]
                for j in range(1, seg.size):
                    mixed = mixed * np.uint64(1099511628211) ^ seg[j]
                out[pos] = mixed
                pos += 1
                continue
            acc = seg[: seg.size - shingle + 1].copy()
            for j in range(1, shingle):
                acc = acc * np.uint64(1099511628211) ^ seg[j : seg.size - shingle + 1 + j]
            out[pos : pos + acc.size] = acc
            pos += acc.size
    return out, sh_counts


def minhash_signatures_batch(texts: pa.Array, num_perm: int, shingle: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signature matrix (vectorized)."""
    sh, counts = _shingle_hashes(texts, shingle)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    sigs = np.empty((len(counts), num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(len(counts)):
            seg = sh[offsets[i] : offsets[i + 1]]
            # universal hashing family: (a*x + b) mod p, mins per permutation
            vals = (a[None, :] * seg[:, None] + b[None, :]) % _MERSENNE
            sigs[i] = vals.min(axis=0)
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

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        df = df.sort_values(id_col, kind="stable").drop_duplicates(subset=[id_col])
        ids = df[id_col].to_numpy()
        sigs = np.stack(df["sig"].to_numpy())
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            hit = np.where(eq >= threshold)[0]
            for h in hit:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + h])
                out_j.append(float(eq[h]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": out_j})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(_pairs, batch_format="pandas")

    def _dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    pairs = pairs.materialize()  # candidate set is small; avoid re-execution
    if pairs.count() == 0:
        return pairs
    return pairs.groupby(["id_a", "id_b"]).map_groups(_dedupe, batch_format="pandas")


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
        cols = {
            self.id_col: batch[self.id_col],
            "simhash": pa.array([format(int(x), "016x") for x in fp]),
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

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        if len(df) < 2:
            return empty
        df = df.sort_values(id_col, kind="stable").drop_duplicates(subset=[id_col])
        if len(df) < 2:
            return empty
        ids = df[id_col].to_numpy()
        sims = df["simhash"].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = np.array([hamming64(sims[x], sims[y]) for x, y in zip(ia, ib)])
        keep = ham <= (max_hamming if max_hamming is not None else 64)
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]})

    pairs = exploded.groupby(["band", "band_val"]).map_groups(_pairs, batch_format="pandas")

    def _dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return pairs
    return pairs.groupby(["id_a", "id_b"]).map_groups(_dedupe, batch_format="pandas")


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
