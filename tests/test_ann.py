"""Similarity search: brute-force exactness + IVF recall."""

import numpy as np
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
