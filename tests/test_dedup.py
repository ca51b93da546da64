"""Dedup family: exact, minhash-LSH, simhash, embedding near-dup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gostatix_ray.stages import dedup


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    base = [
        # long doc: one-word edits stay within small simhash hamming distance
        "the quick brown fox jumps over the lazy dog while the sun sets slowly "
        "behind the old red barn and the farmer watches from the wooden porch "
        "with a warm cup of coffee in his steady hands",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "sphinx of black quartz judge my vow",
    ]
    rows = []
    i = 0
    for b in base:
        for rep in range(3):  # 3 exact copies of each
            rows.append({"doc_id": i, "text": b})
            i += 1
    # near-dup: one-word change of base[0]
    rows.append({"doc_id": i, "text": base[0].replace("lazy dog", "lazy cat")})
    near_id = i
    return rd.from_items(rows), near_id


def test_exact_dedup(docs_ds):
    ds, near_id = docs_ds
    survivors = sorted(dedup.exact_dedup(ds, "text", "doc_id").to_pandas()["doc_id"])
    # one survivor (the min id) per distinct text: 4 bases + the near-dup
    assert survivors == [0, 3, 6, 9, near_id]


def test_minhash_finds_near_duplicate(docs_ds):
    ds, near_id = docs_ds
    pairs = dedup.minhash_candidate_pairs(
        ds, text_col="text", id_col="doc_id", num_perm=64, bands=16, shingle=2,
        threshold=0.3, concurrency=2,
    ).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # exact copies of base[0] are near-dups of the one-word variant
    assert (0, near_id) in got
    # exact copies collide with certainty
    assert (0, 1) in got and (3, 4) in got
    # unrelated bases don't pair
    assert (0, 3) not in got


def test_minhash_estimate_close_to_exact_jaccard(docs_ds):
    ds, near_id = docs_ds
    pairs = dedup.minhash_candidate_pairs(
        ds, text_col="text", id_col="doc_id", num_perm=128, bands=32, shingle=2,
        threshold=0.3, concurrency=2,
    ).to_pandas()
    table = pa.Table.from_pandas(ds.to_pandas())
    verified = dedup.exact_jaccard_pairs(table, pairs, shingle=2)
    err = (verified["est_jaccard"] - verified["jaccard"]).abs()
    assert (err < 0.25).all()  # 128 perms => std ~ sqrt(j(1-j)/128) ~ 0.04


def test_simhash_buckets_catch_near_dup(docs_ds):
    ds, near_id = docs_ds
    pairs = dedup.simhash_candidate_pairs(ds, text_col="text", id_col="doc_id", concurrency=2).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got  # identical docs share all bands
    assert (0, near_id) in got  # 1-word change: small hamming distance
    ham = dict(zip(zip(pairs["id_a"], pairs["id_b"]), pairs["hamming"]))
    assert ham[(0, 1)] == 0  # identical docs: hamming 0


def test_hamming():
    assert dedup.hamming64("0" * 16, "0" * 15 + "f") == 4


def test_embedding_near_dup(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 32))
    rows = [{"vec_id": i, "embedding": list(map(float, v))} for i, v in enumerate(base)]
    # vec 20 = tiny perturbation of vec 0 => cosine ~ 1
    rows.append({"vec_id": 20, "embedding": list(map(float, base[0] + 0.01 * rng.standard_normal(32)))})
    ds = rd.from_items(rows)
    pairs = dedup.embedding_near_dup_pairs(
        ds, emb_col="embedding", id_col="vec_id", dim=32, threshold=0.95, nbits=4, concurrency=2
    ).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 20) in got
    assert all(c >= 0.95 for c in pairs["cosine"])


def test_duplicate_clusters(ray_session):
    import ray.data as rd

    # two chains: 1-2, 2-3 (cluster 1) and 10-11 (cluster 10); 20-21-22 via 20-22
    pairs = rd.from_items(
        [
            {"id_a": 1, "id_b": 2},
            {"id_a": 2, "id_b": 3},
            {"id_a": 10, "id_b": 11},
            {"id_a": 21, "id_b": 22},
            {"id_a": 20, "id_b": 22},
        ]
    )
    out = dedup.duplicate_clusters(pairs).to_pandas().sort_values("doc_id")
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_duplicate_clusters_many_blocks(ray_session):
    """Candidate set spanning many blocks: chains of length 4 across 300
    clusters (graph diameter forces >1 propagation round; input is
    repartitioned so no single block holds a whole component)."""
    import ray.data as rd

    rows = []
    for c in range(300):
        base = c * 10
        rows += [
            {"id_a": base + 1, "id_b": base + 2},
            {"id_a": base + 2, "id_b": base + 3},
            {"id_a": base + 3, "id_b": base + 4},
        ]
    pairs = rd.from_items(rows).repartition(16)
    out = dedup.duplicate_clusters(pairs).to_pandas()
    assert len(out) == 1200
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    for c in range(300):
        base = c * 10
        for m in (1, 2, 3, 4):
            assert got[base + m] == base + 1, (c, m)


def test_near_dup_pairs_verified_exact(docs_ds):
    """Verified pairs carry EXACT n-gram Jaccard (checked against the
    driver-side set oracle) and only >= threshold survives."""
    ds, near_id = docs_ds
    out = dedup.near_dup_pairs_verified(
        ds, text_col="text", id_col="doc_id", num_perm=64, bands=16, shingle=2,
        threshold=0.5, concurrency=2,
    ).to_pandas()
    table = pa.Table.from_pandas(ds.to_pandas())
    want = dedup.exact_jaccard_pairs(table, out[["id_a", "id_b"]], shingle=2)
    assert np.allclose(out["jaccard"].to_numpy(), want["jaccard"].to_numpy())
    assert (out["jaccard"] >= 0.5).all()
    got = {tuple(sorted((a, b))) for a, b in zip(out["id_a"], out["id_b"])}
    assert (0, 1) in got  # exact copies: jaccard 1.0
    assert (0, near_id) in got  # one-word edit of a 38-shingle doc


def test_embedding_near_dup_recall_multi_table(ray_session):
    """Planted near-dups must be recalled at >=0.95 with auto-sized nbits
    and multiple tables (round-1 verdict done-criterion)."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    n_base, dim = 400, 32
    base = rng.standard_normal((n_base, dim))
    rows = [{"vec_id": i, "embedding": list(map(float, v))} for i, v in enumerate(base)]
    planted = []
    for j in range(40):  # 40 planted near-dups of the first 40 vectors
        vid = n_base + j
        rows.append({"vec_id": vid, "embedding": list(map(float, base[j] + 0.02 * rng.standard_normal(dim)))})
        planted.append((j, vid))
    ds = rd.from_items(rows)
    pairs = dedup.embedding_near_dup_pairs(
        ds, emb_col="embedding", id_col="vec_id", dim=dim, threshold=0.95,
        nbits=None, n_tables=4, concurrency=2,
    ).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    recall = sum(1 for p in planted if p in got) / len(planted)
    assert recall >= 0.95, recall
    assert (pairs["cosine"] >= 0.95).all()


def test_duplicate_clusters_paths_agree(ray_session):
    """Single-task union-find fast path == iterative distributed path,
    including a long chain (deep diameter) and multiple components."""
    import ray.data as rd

    rng = np.random.default_rng(31)
    # chain 0-1-2-...-40 (diameter 40) + random clique + isolated pair
    chain = [{"id_a": i, "id_b": i + 1} for i in range(8)]
    clique = [{"id_a": 100 + a, "id_b": 100 + b}
              for a in range(6) for b in range(a + 1, 6)]
    extra = [{"id_a": 500, "id_b": 501}]
    pairs = rd.from_items(chain + clique + extra).repartition(5)
    fast = dedup.duplicate_clusters(pairs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    slow = dedup.duplicate_clusters(pairs, small_graph_edges=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
    assert set(fast.loc[fast["doc_id"] <= 8, "cluster_id"]) == {0}
    assert set(fast.loc[(fast["doc_id"] >= 100) & (fast["doc_id"] < 200), "cluster_id"]) == {100}
    assert set(fast.loc[fast["doc_id"] >= 500, "cluster_id"]) == {500}


def test_pair_feature_join_paths_agree(docs_ds, monkeypatch):
    """The shuffle-free small-pair fast path and the bucketed 2-exchange
    path of join_pairs_with_features produce the same near-dup output
    (the bucketed path only fires above _PAIR_JOIN_FAST_MAX in prod, so
    force it here to keep it covered)."""
    ds, _ = docs_ds

    def run():
        return (
            dedup.near_dup_pairs_verified(
                ds, text_col="text", id_col="doc_id",
                num_perm=64, bands=16, shingle=3, threshold=0.5, concurrency=2,
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    fast = run()
    monkeypatch.setattr(dedup, "_PAIR_JOIN_FAST_MAX", 0)
    bucketed = run()
    pd.testing.assert_frame_equal(fast, bucketed)
    assert len(fast) > 0  # the exact copies guarantee jaccard-1 pairs


# ---------------------------------------------------------------------------
# exact substring (word n-gram) dedup
# ---------------------------------------------------------------------------

def _substring_corpus():
    # doc 0 and 1 share a verbatim 5-gram run; doc 2 is unrelated;
    # doc 3 is a short doc (< n tokens); doc 4 repeats doc 0 verbatim
    return [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog today"},
        {"doc_id": 1, "text": "once more the quick brown fox jumps over the hill"},
        {"doc_id": 2, "text": "completely different words in this unrelated document here now"},
        {"doc_id": 3, "text": "tiny doc"},
        {"doc_id": 4, "text": "the quick brown fox jumps over the lazy dog today"},
    ]


def test_substring_dup_pairs_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from gostatix_ray.stages.dedup import substring_dup_pairs

    rows = _substring_corpus()
    df = pd.DataFrame(rows)
    n = 5
    exp = duckdb.sql(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM df), "
        f"gr AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{n-1}], ' ') AS g "
        f"FROM toks, UNNEST(range(1, greatest(len(t) - {n-1}, 1) + 1)) AS u(i)), "
        "ok AS (SELECT g FROM gr GROUP BY g HAVING count(*) BETWEEN 2 AND 64) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared_grams "
        "FROM gr a JOIN gr b ON a.g = b.g AND a.doc_id < b.doc_id "
        "WHERE a.g IN (SELECT g FROM ok) GROUP BY 1, 2 ORDER BY 1, 2"
    ).df().reset_index(drop=True)
    for parts in (1, 3):
        got = (
            substring_dup_pairs(rd.from_items(rows).repartition(parts),
                                n=n, num_buckets=8)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        assert list(got["id_a"]) == list(exp["id_a"])
        assert list(got["id_b"]) == list(exp["id_b"])
        assert list(got["shared_grams"]) == list(exp["shared_grams"])
    # sanity on content: verbatim twin (0,4) shares every gram; (0,1)
    # shares the overlapping run; unrelated doc 2 pairs with nobody
    gp = {(a, b): s for a, b, s in got.itertuples(index=False)}
    assert (0, 4) in gp and gp[(0, 4)] == 6  # 10 tokens -> 6 distinct 5-grams
    assert (0, 1) in gp
    assert not any(2 in p for p in gp)


def test_substring_dup_pairs_max_df_cap(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.dedup import substring_dup_pairs

    # one boilerplate 4-gram shared by 10 docs: with max_df=4 the gram
    # is dropped entirely (no pairs); without the cap it pairs all 45
    rows = [{"doc_id": i, "text": f"unique{i} common legal footer text"} for i in range(10)]
    ds = rd.from_items(rows).repartition(2)
    capped = substring_dup_pairs(ds, n=4, max_df=4, num_buckets=8).to_pandas()
    assert len(capped) == 0
    full = substring_dup_pairs(ds, n=4, max_df=64, num_buckets=8).to_pandas()
    assert len(full) == 45 and set(full["shared_grams"]) == {1}


def test_substring_dup_spans_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from gostatix_ray.stages.dedup import substring_dup_spans

    rows = _substring_corpus()
    df = pd.DataFrame(rows)
    n = 5
    exp = duckdb.sql(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM df), "
        f"gr AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{n-1}], ' ') AS g "
        f"FROM toks, UNNEST(range(1, greatest(len(t) - {n-1}, 1) + 1)) AS u(i)), "
        "freq AS (SELECT g, count(*) AS df FROM gr GROUP BY g) "
        "SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "CAST(sum(CASE WHEN freq.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams "
        "FROM gr JOIN freq ON gr.g = freq.g GROUP BY gr.doc_id ORDER BY gr.doc_id"
    ).df().reset_index(drop=True)
    got = (
        substring_dup_spans(rd.from_items(rows).repartition(3), n=n, num_buckets=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["n_grams"]) == list(exp["n_grams"])
    assert list(got["n_dup_grams"]) == list(exp["n_dup_grams"])
    # verbatim twin docs 0/4 are 100% duplicated; short doc 3 is unique
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "dup_frac"] == 1.0 and by_id.loc[4, "dup_frac"] == 1.0
    assert by_id.loc[3, "dup_frac"] == 0.0


def test_substring_contamination_vs_duckdb(ray_session):
    """Cross-corpus contamination: per-new-doc counts of grams present
    anywhere in the reference corpus, bit-exact vs a DuckDB gram
    semi-join, partition-count independent, clamped short docs."""
    import duckdb
    import ray.data as rd

    from gostatix_ray.stages.dedup import substring_contamination

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(40)]
    new_rows, ref_rows = [], []
    for i in range(30):
        toks = [vocab[j] for j in rng.integers(0, 40, 12)]
        new_rows.append({"doc_id": i, "text": " ".join(toks)})
    for i in range(20):
        toks = [vocab[j] for j in rng.integers(0, 40, 12)]
        ref_rows.append({"doc_id": 1000 + i, "text": " ".join(toks)})
    # plant verbatim inclusions: new docs 0-4 embed ref doc windows
    for i in range(5):
        new_rows[i]["text"] = ref_rows[i]["text"] + " " + new_rows[i]["text"]
    new_rows.append({"doc_id": 98, "text": "tiny"})                # < n tokens, unique
    new_rows.append({"doc_id": 99, "text": ref_rows[0]["text"][:9]})  # short, matches nothing (clamped gram)
    ndf, rdf = pd.DataFrame(new_rows), pd.DataFrame(ref_rows)
    n = 5
    exp = duckdb.sql(
        "WITH ntoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM ndf), "
        f"ngr AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{n-1}], ' ') AS g "
        f"FROM ntoks, UNNEST(range(1, greatest(len(t) - {n-1}, 1) + 1)) AS u(i)), "
        "rtoks AS (SELECT string_split(text, ' ') AS t FROM rdf), "
        f"rgr AS (SELECT DISTINCT array_to_string(t[i:i+{n-1}], ' ') AS g "
        f"FROM rtoks, UNNEST(range(1, greatest(len(t) - {n-1}, 1) + 1)) AS u(i)) "
        "SELECT ngr.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "CAST(sum(CASE WHEN rgr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_grams "
        "FROM ngr LEFT JOIN rgr ON ngr.g = rgr.g GROUP BY ngr.doc_id ORDER BY ngr.doc_id"
    ).df().reset_index(drop=True)
    for parts in (1, 4):
        got = (
            substring_contamination(
                rd.from_items(new_rows).repartition(parts),
                rd.from_items(ref_rows).repartition(parts),
                n=n, num_buckets=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(got["doc_id"]) == list(exp["doc_id"])
        assert list(got["n_grams"]) == list(exp["n_grams"])
        assert list(got["n_ref_grams"]) == list(exp["n_ref_grams"])
    by_id = got.set_index("doc_id")
    # planted inclusions contaminate; the clamped short docs don't
    assert (by_id.loc[[0, 1, 2, 3, 4], "n_ref_grams"] > 0).all()
    assert by_id.loc[98, "n_ref_grams"] == 0 and by_id.loc[98, "n_grams"] == 1


def test_corpus_diff_statuses_and_partition_independence(ray_session):
    import pandas as pd
    import ray.data as rd

    from gostatix_ray.stages.dedup import corpus_diff

    old = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a", "b", "c", "d", "e"],
    })
    new = pd.DataFrame({
        "doc_id": [2, 3, 4, 6],          # 1,5 removed; 6 added
        "text": ["b", "C!", "d", "f"],   # 3 changed; 2,4 unchanged
    })
    want = {1: "removed", 2: "unchanged", 3: "changed", 4: "unchanged",
            5: "removed", 6: "added"}
    for parts in (1, 7):
        out = corpus_diff(
            rd.from_pandas(old).repartition(parts),
            rd.from_pandas(new).repartition(parts),
            id_col="doc_id", text_col="text", num_buckets=4,
        ).to_pandas()
        got = dict(zip(out["doc_id"], out["status"]))
        assert got == want


def test_exact_dedup_keep_best_canonical_selection(ray_session):
    import pandas as pd
    import ray.data as rd

    from gostatix_ray.stages.dedup import exact_dedup_keep_best

    df = pd.DataFrame({
        "doc_id": [10, 11, 12, 20, 21, 30, 40, 41],
        "text":   ["x", "x", "x", "y", "y", "z", "w", "w"],
        "rank":   [5,   2,   2,   7,   7,   1,   3,   3],
        "src":    ["s5", "s2", "s2b", "s7", "s7", "s1", "s3", "s3"],
    })
    for parts in (1, 5):
        out = exact_dedup_keep_best(
            rd.from_pandas(df).repartition(parts),
            order_by=[("rank", "asc")], text_col="text", id_col="doc_id",
            keep_cols=("src",), num_buckets=4,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        # x: min rank 2, tie by min doc_id -> 11; y: tie -> 20; z -> 30; w -> 40
        assert list(out["doc_id"]) == [11, 20, 30, 40]
        assert list(out["src"]) == ["s2", "s7", "s1", "s3"]
    # desc order flips the x survivor to the rank-5 copy
    out = exact_dedup_keep_best(
        rd.from_pandas(df), order_by=[("rank", "desc")],
        text_col="text", id_col="doc_id", num_buckets=4,
    ).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [10, 20, 30, 40]
    with pytest.raises(ValueError):
        exact_dedup_keep_best(rd.from_pandas(df), order_by=[])
    with pytest.raises(ValueError):
        exact_dedup_keep_best(rd.from_pandas(df), order_by=[("rank", "down")])


def test_incremental_dedup_exact_and_bloom_paths(ray_session):
    import pandas as pd
    import ray.data as rd

    from gostatix_ray.stages.dedup import incremental_dedup

    old = pd.DataFrame({"doc_id": range(40),
                        "text": [f"doc {i}" for i in range(40)]})
    # new: 20 unseen + 15 re-crawls of old content under fresh ids
    new = pd.DataFrame({
        "doc_id": list(range(100, 120)) + list(range(200, 215)),
        "text": [f"fresh {i}" for i in range(20)]
                + [f"doc {i}" for i in range(15)],
    })
    want = list(range(100, 120))
    for kw in (dict(use_bloom=False),
               dict(use_bloom=True, bloom_items=4096, bloom_fpp=1e-6),
               # deliberately saturated bloom: ~every doc is a candidate,
               # exactness must come from the anti-join, not the filter
               dict(use_bloom=True, bloom_items=8, bloom_fpp=0.5)):
        for parts in (1, 6):
            out = incremental_dedup(
                rd.from_pandas(old).repartition(parts),
                rd.from_pandas(new).repartition(parts),
                num_buckets=4, **kw,
            ).to_pandas()
            assert sorted(out["doc_id"]) == want, kw
