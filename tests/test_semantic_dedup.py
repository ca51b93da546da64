"""Semantic dedup: exact leader prune (oracle-shaped) and the SemDeDup
cluster-bucketed scale path (stages/dedup.py tail).

No reference counterpart (kwertop/gostatix has no embedding ops);
semantics follow Abbas et al. 2023 (SemDeDup) with the deterministic
smaller-id leader keep rule shared by both variants.
"""
import numpy as np
import pandas as pd
import pytest


def _corpus(n_clusters=4, per=30, dim=16, dup_frac=0.4, seed=7):
    """Clustered unit vectors with planted near-duplicates."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for c in range(n_clusters):
        base = centers[c] + 0.25 * rng.standard_normal((per, dim))
        k = int(per * dup_frac)
        base[per - k:] = base[:k] + 1e-3 * rng.standard_normal((k, dim))
        rows.append(base)
    m = np.vstack(rows)
    ids = rng.permutation(len(m)) * 7 + 3  # non-contiguous, shuffled ids
    return pd.DataFrame({
        "vec_id": ids.astype(np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in m],
    })


def _ref_exact_survivors(df, threshold):
    """Numpy reference of the leader prune: drop i iff any j with
    id_j < id_i has cosine(i, j) >= threshold (f64 of f32 units —
    the arithmetic both stages use)."""
    ids = df["vec_id"].to_numpy()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    v = (m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]
         ).astype(np.float32).astype(np.float64)
    order = np.argsort(ids, kind="stable")
    ids, v = ids[order], v[order]
    sims = v @ v.T
    earlier = np.tril(np.ones_like(sims, dtype=bool), -1)
    dropped = (np.where(earlier, sims, -1.0) >= threshold).any(axis=1)
    return set(ids[~dropped].tolist())


def test_exact_leader_prune_matches_numpy(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.dedup import semantic_dedup_exact

    df = _corpus()
    want = _ref_exact_survivors(df, 0.98)
    out = semantic_dedup_exact(
        rd.from_pandas(df).repartition(6),
        id_col="vec_id", emb_col="embedding", threshold=0.98,
    ).to_pandas()
    assert set(out["vec_id"].tolist()) == want
    assert len(want) < len(df)  # the planted dups actually pruned
    assert set(out.columns) == {"vec_id", "embedding"}  # passthrough filter


def test_semdedup_superset_and_precision(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.dedup import semantic_dedup, semantic_dedup_exact

    df = _corpus(n_clusters=5, per=40, seed=11)
    tau = 0.98
    exact = set(semantic_dedup_exact(
        rd.from_pandas(df).repartition(4), id_col="vec_id",
        emb_col="embedding", threshold=tau,
    ).to_pandas()["vec_id"].tolist())
    sem = set(semantic_dedup(
        rd.from_pandas(df).repartition(4), id_col="vec_id",
        emb_col="embedding", dim=16, n_clusters=5, threshold=tau,
    ).to_pandas()["vec_id"].tolist())
    # clustering can only MISS cross-cluster pairs -> fewer drops
    assert sem >= exact
    # precision: every drop is a true >= tau pair with a smaller id
    ids = df["vec_id"].to_numpy()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    v = (m / np.linalg.norm(m, axis=1)[:, None]).astype(np.float32).astype(np.float64)
    pos = {int(i): k for k, i in enumerate(ids)}
    for dropped in set(ids.tolist()) - sem:
        sims = v[pos[dropped]] @ v.T
        assert ((ids < dropped) & (sims >= tau)).any()
    # with tight per-cluster dups the scale path catches most of them
    n_drop_exact, n_drop_sem = len(df) - len(exact), len(df) - len(sem)
    assert n_drop_exact > 0 and n_drop_sem >= 0.8 * n_drop_exact


def test_semdedup_deterministic_across_partitioning(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.dedup import semantic_dedup

    df = _corpus(seed=3)
    outs = []
    for parts in (2, 9):
        out = semantic_dedup(
            rd.from_pandas(df).repartition(parts), id_col="vec_id",
            emb_col="embedding", dim=16, n_clusters=4, threshold=0.98,
        ).to_pandas()
        outs.append(sorted(out["vec_id"].tolist()))
    assert outs[0] == outs[1]


def test_exact_no_dups_keeps_everything(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.dedup import semantic_dedup_exact

    rng = np.random.default_rng(0)
    m = rng.standard_normal((50, 8))
    df = pd.DataFrame({
        "vec_id": np.arange(50, dtype=np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in m],
    })
    out = semantic_dedup_exact(
        rd.from_pandas(df).repartition(3), id_col="vec_id",
        emb_col="embedding", threshold=0.9999,
    ).to_pandas()
    assert sorted(out["vec_id"].tolist()) == list(range(50))
