"""Similarity search: brute-force exactness + IVF recall."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gostatix_ray.stages.ann import brute_force_topk, ivf_topk, train_codebook


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    m = rng.standard_normal((400, 32))
    ds = rd.from_items([{"vec_id": i, "embedding": list(map(float, v))} for i, v in enumerate(m)])
    return ds, m


def _exact_topk(m, q, k):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = qn @ mn.T
    return [set(np.argsort(-sims[i])[:k]) for i in range(len(q))]


def test_brute_force_matches_numpy(emb):
    ds, m = emb
    q = m[:3]
    out = brute_force_topk(ds, q, k=10, concurrency=2).to_pandas()
    expected = _exact_topk(m, q, 10)
    for qi in range(3):
        got = set(out[out["query_id"] == qi]["vec_id"])
        assert got == expected[qi]
        # self-similarity 1.0 leads each result
        top = out[out["query_id"] == qi].sort_values("cosine", ascending=False).iloc[0]
        assert top["vec_id"] == qi and top["cosine"] == pytest.approx(1.0)


def test_ivf_recall(emb):
    ds, m = emb
    q = m[:5]
    cb = train_codebook(m[:200], n_centroids=8)
    out = ivf_topk(ds, q, cb, k=10, nprobe=4, concurrency=2).to_pandas()
    expected = _exact_topk(m, q, 10)
    recalls = []
    for qi in range(5):
        got = set(out[out["query_id"] == qi]["vec_id"])
        recalls.append(len(got & expected[qi]) / 10)
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 partitions on random data


def test_codebook_deterministic():
    rng = np.random.default_rng(2)
    s = rng.standard_normal((100, 16))
    assert np.array_equal(train_codebook(s, 4), train_codebook(s, 4))


def test_ann_query_prep_never_reads_full_table():
    """Grep gate (round-2 verdict): query/codebook prep must stream —
    column-pruned id scan + predicate fetch, bounded iter_batches sample —
    never a whole-table pq.read_table on the driver."""
    import inspect

    from gostatix_ray.pipelines import catalog

    src = inspect.getsource(catalog._queries_matrix)
    assert "iter_batches" in src and "filters=" in src
    assert "sort_by(\"vec_id\").slice" not in src
    assert "iter_batches" in inspect.getsource(catalog._sample_embeddings)
    assert "read_table" not in inspect.getsource(catalog.q_ann_ivf_cosine)


def test_ivf_partitioned_index_prunes_at_read(ray_session, tmp_path):
    """Read-level IVF: the probe's read plan must touch ONLY the probed
    centroid directories (unprobed partitions never leave storage), and
    results must equal the in-memory IVF probe with the same params."""
    import os

    import ray.data as rd
    from ray.data.datasource.partitioning import Partitioning, PathPartitionFilter

    from gostatix_ray.stages.ann import (
        ivf_topk,
        ivf_topk_partitioned,
        ivf_write_partitioned,
        train_codebook,
    )

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((2000, 16))
    ds = rd.from_items(
        [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(2000)],
        override_num_blocks=4,
    )
    cb = train_codebook(emb[:256], 8)
    out_dir = str(tmp_path / "ivf_index")
    ivf_write_partitioned(ds, cb, out_dir)
    n_centroid_dirs = len([d for d in os.listdir(out_dir) if d.startswith("centroid=")])
    assert n_centroid_dirs == 8

    q = emb[:3]
    res, probed = ivf_topk_partitioned(out_dir, q, cb, k=5, nprobe=2)
    assert len(probed) < 8  # pruning is real for this seed
    # the same path-filtered read the probe uses must list only probed dirs
    flt = PathPartitionFilter.of(
        lambda kv: kv["centroid"] in {str(c) for c in probed}, style="hive"
    )
    pruned = rd.read_parquet(out_dir, partition_filter=flt, partitioning=Partitioning("hive"))
    all_files = rd.read_parquet(out_dir, partitioning=Partitioning("hive")).input_files()
    touched = pruned.input_files()
    assert 0 < len(touched) < len(all_files)
    assert all(any(f"centroid={c}/" in f for c in probed) for f in touched)

    full = ivf_topk(ds, q, cb, k=5, nprobe=2).to_pandas()
    a = res.to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    b = full.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_kmeans_fit_recovers_separated_clusters(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.ann import ivf_partition, kmeans_fit

    rng = np.random.default_rng(3)
    # 3 well-separated direction clusters on the sphere, dim 16
    centers = np.zeros((3, 16))
    centers[0, 0] = 1.0
    centers[1, 5] = 1.0
    centers[2, 11] = 1.0
    sizes = [120, 80, 100]
    vecs, labels = [], []
    for c, sz in enumerate(sizes):
        pts = centers[c] + 0.05 * rng.standard_normal((sz, 16))
        vecs.append(pts)
        labels += [c] * sz
    emb = np.concatenate(vecs)
    perm = rng.permutation(len(emb))
    tbl = pa.table({
        "vec_id": np.arange(len(emb), dtype=np.int64),
        "embedding": [emb[i].astype(np.float64) for i in perm],
    })
    ds = rd.from_arrow(tbl).repartition(4).materialize()
    cb, inertia = kmeans_fit(ds, k=3, iters=5, concurrency=2)
    assert cb.shape == (3, 16)
    assert inertia < 10.0  # tight clusters -> tiny 1-cos residual
    got = ivf_partition(ds, cb, concurrency=2).to_pandas()
    # each fitted cluster is pure: one true center dominates
    true = np.array(labels)[perm]
    for c in range(3):
        members = true[got.sort_values("vec_id").reset_index(drop=True)["centroid"] == c]
        assert len(members) in sizes
        assert (members == members[0]).all()


def test_kmeans_fit_deterministic_same_partitioning(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.ann import kmeans_fit

    rng = np.random.default_rng(9)
    emb = rng.standard_normal((200, 8))
    tbl = pa.table({"vec_id": np.arange(200, dtype=np.int64),
                    "embedding": [e for e in emb]})
    ds = rd.from_arrow(tbl).repartition(3).materialize()
    cb1, i1 = kmeans_fit(ds, k=4, iters=3, concurrency=2)
    cb2, i2 = kmeans_fit(ds, k=4, iters=3, concurrency=2)
    assert np.array_equal(cb1, cb2)
    assert i1 == i2


def test_pq_lossless_when_vectors_are_centroids(ray_session):
    """If every subvector is a codebook entry, ADC scores == exact cosine
    and PQ top-k == brute-force top-k."""
    import ray.data as rd

    from gostatix_ray.stages.ann import (
        _normalize, brute_force_topk, pq_encode, pq_topk, pq_train,
    )

    rng = np.random.default_rng(3)
    # vectors built from 4 possible UNIT subvectors per subspace: every
    # row norm is exactly sqrt(m), so normalization rescales all rows
    # identically and each subspace still has only 4 distinct values —
    # a 64-entry codebook represents them exactly
    m, dsub = 4, 8
    basis = _normalize(rng.normal(size=(m * 4, dsub))).reshape(m, 4, dsub)
    picks = rng.integers(0, 4, size=(300, m))
    vecs = np.concatenate([basis[mi, picks[:, mi]] for mi in range(m)], axis=1)
    vecs = _normalize(vecs)
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(vecs)})
    ds = rd.from_pandas(df).repartition(4)
    books = pq_train(vecs, m_subspaces=m, n_codes=64, iters=20)
    q = vecs[:3]
    codes = pq_encode(ds, books, concurrency=2)
    got = pq_topk(codes, q, books, k=5, concurrency=2).to_pandas()
    want = brute_force_topk(ds, q, k=5, concurrency=2).to_pandas()
    for qi in range(3):
        g = got[got["query_id"] == qi].sort_values("pq_cosine", ascending=False)
        w = want[want["query_id"] == qi].sort_values("cosine", ascending=False)
        assert set(g["vec_id"]) == set(w["vec_id"]), qi
        np.testing.assert_allclose(np.sort(g["pq_cosine"]), np.sort(w["cosine"]), atol=1e-7)


def test_pq_recall_on_real_embeddings(ray_session):
    """Recall@10 of the compressed-domain scan vs the exact scan."""
    import ray.data as rd

    from gostatix_ray.stages.ann import brute_force_topk, pq_encode, pq_topk, pq_train

    import pyarrow.parquet as pq_mod

    t = pq_mod.read_table("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    ds = rd.from_arrow(t).repartition(4)
    books = pq_train(vecs, m_subspaces=16, n_codes=256)
    q = vecs[:3]
    codes = pq_encode(ds, books, concurrency=2)
    approx = pq_topk(codes, q, books, k=10, concurrency=2).to_pandas()
    exact = brute_force_topk(ds, q, k=10, concurrency=2).to_pandas()
    recalls = []
    for qi in range(3):
        a = set(approx.loc[approx["query_id"] == qi, "vec_id"])
        e = set(exact.loc[exact["query_id"] == qi, "vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.6, recalls  # m=16 x 256 codes, small corpus


def test_pq_encode_deterministic(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.ann import pq_encode, pq_train

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(200, 32))
    df = pd.DataFrame({"vec_id": np.arange(200), "embedding": list(vecs.astype(np.float32))})
    books = pq_train(vecs, m_subspaces=4, n_codes=32)
    outs = []
    for parts in (2, 7):
        ds = rd.from_pandas(df).repartition(parts)
        o = pq_encode(ds, books, concurrency=2).to_pandas().sort_values("vec_id")
        outs.append(list(o["pq_code"]))
    assert outs[0] == outs[1]
    with pytest.raises(ValueError):
        pq_train(vecs, m_subspaces=5, n_codes=16)  # 32 % 5 != 0
    with pytest.raises(ValueError):
        pq_train(vecs, m_subspaces=4, n_codes=512)  # > one byte


def test_ivfpq_recall(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.ann import (
        brute_force_topk, ivfpq_topk, pq_train, train_codebook,
    )

    import pyarrow.parquet as pq_mod

    t = pq_mod.read_table("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    ds = rd.from_arrow(t).repartition(4)
    cb = train_codebook(vecs[:256], n_centroids=8)
    books = pq_train(vecs, m_subspaces=16, n_codes=256)
    q = vecs[:3]
    approx = ivfpq_topk(ds, q, cb, books, k=10, nprobe=4, concurrency=2).to_pandas()
    exact = brute_force_topk(ds, q, k=10, concurrency=2).to_pandas()
    recalls = []
    for qi in range(3):
        a = set(approx.loc[approx["query_id"] == qi, "vec_id"])
        e = set(exact.loc[exact["query_id"] == qi, "vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.5, recalls  # coarse routing loss + PQ loss
