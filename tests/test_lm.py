"""Corpus LM scoring (stages/lm.py): exact integer frequency stats vs
a DuckDB twin, add-one bigram perplexity vs a direct numpy reference,
and partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from gostatix_ray.stages.lm import lm_frequency_stats, lm_perplexity

DOCS = pd.DataFrame({
    "doc_id": np.arange(8, dtype=np.int64),
    "text": [
        "the cat sat on the mat",
        "the cat sat",
        "cat",                       # single token: zero bigrams
        "",                          # empty text -> one '' token
        "the the the the",           # heavy repetition
        "on the mat the cat sat",    # same tokens, shuffled order
        "completely novel words here",
        "the  cat",                  # double space -> '' token in the middle
    ],
})


def _twin_sql():
    return """
    WITH tok AS (SELECT doc_id,
      unnest(string_split(coalesce(text, ''), ' ')) AS g FROM documents),
    uc AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY g),
    bg AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
      i -> l[i] || chr(31) || l[i+1])) AS g
      FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS l
            FROM documents)),
    bc AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY g),
    du AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      CAST(sum(uc.n) AS BIGINT) AS sum_tok_count
      FROM tok t JOIN uc USING (g) GROUP BY t.doc_id),
    db AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      CAST(sum(bc.n) AS BIGINT) AS sum_bigram_count
      FROM bg b JOIN bc USING (g) GROUP BY b.doc_id)
    SELECT du.doc_id, du.n_tokens,
      CAST(COALESCE(db.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      du.sum_tok_count,
      CAST(COALESCE(db.sum_bigram_count, 0) AS BIGINT) AS sum_bigram_count,
      du.sum_tok_count * 1.0 / du.n_tokens AS mean_tok_count
    FROM du LEFT JOIN db USING (doc_id) ORDER BY doc_id
    """


def _run_freq(df, blocks=3):
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = lm_frequency_stats(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_frequency_stats_match_duckdb_twin():
    con = duckdb.connect()
    con.register("documents", DOCS)
    want = con.execute(_twin_sql()).df()
    got = _run_freq(DOCS)
    got = got[list(want.columns)]
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True)


def test_frequency_stats_partition_invariant():
    a = _run_freq(DOCS, blocks=1)
    b = _run_freq(DOCS, blocks=7)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_frequency_stats_hand_values():
    got = _run_freq(DOCS).set_index("doc_id")
    # 'cat' appears 5x in the corpus ('the  cat' contributes one 'cat')
    assert got.loc[2, "n_tokens"] == 1
    assert got.loc[2, "n_bigrams"] == 0
    assert got.loc[2, "sum_tok_count"] == 5
    assert got.loc[2, "sum_bigram_count"] == 0
    # empty doc: one '' token; '' occurs twice corpus-wide (doc 3 + doc 7)
    assert got.loc[3, "n_tokens"] == 1
    assert got.loc[3, "sum_tok_count"] == 2
    # repetition doc: 4 tokens 'the' (corpus count 9 + 4 = 13 each)
    the_count = sum(t.split(" ").count("the") for t in DOCS.text)
    assert got.loc[4, "sum_tok_count"] == 4 * the_count
    # 'the the' bigram occurs 3x corpus-wide, all inside doc 4
    assert got.loc[4, "sum_bigram_count"] == 3 * 3


def _ppl_reference(df):
    """Direct numpy add-one bigram model over the same corpus."""
    from collections import Counter

    uni, bi = Counter(), Counter()
    toks = {r.doc_id: r.text.split(" ") for r in df.itertuples()}
    for t in toks.values():
        uni.update(t)
        bi.update(zip(t[:-1], t[1:]))
    V = len(uni)
    out = {}
    for d, t in toks.items():
        pairs = list(zip(t[:-1], t[1:]))
        if not pairs:
            out[d] = (0, 0.0, 1.0)
            continue
        ll = -sum(np.log((bi[p] + 1.0) / (uni[p[0]] + V)) for p in pairs)
        out[d] = (len(pairs), ll / len(pairs), np.exp(ll / len(pairs)))
    return out


def test_perplexity_matches_reference():
    ds = ray.data.from_pandas(DOCS).repartition(3)
    got = lm_perplexity(ds).to_pandas().set_index("doc_id")
    want = _ppl_reference(DOCS)
    for d, (nb, ll, ppl) in want.items():
        assert got.loc[d, "n_bigrams"] == nb
        assert got.loc[d, "logloss_bi"] == pytest.approx(ll, rel=1e-12)
        assert got.loc[d, "ppl_bi"] == pytest.approx(ppl, rel=1e-12)
    # repetition doc is the most predictable; novel-words doc the least
    assert got.loc[4, "ppl_bi"] < got.loc[6, "ppl_bi"]


def test_shuffle_scoring_path_identical():
    """The broadcast-free two-shuffle path returns exactly the
    broadcast path's rows (same ints, same float division)."""
    a = _run_freq(DOCS, blocks=4)
    ds = ray.data.from_pandas(DOCS).repartition(4)
    from gostatix_ray.stages.lm import lm_frequency_stats as f

    b = f(ds, scoring="shuffle").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[list(a.columns)], check_exact=True)


def test_auto_falls_back_to_shuffle():
    ds = ray.data.from_pandas(DOCS).repartition(2)
    from gostatix_ray.stages.lm import lm_frequency_stats as f

    got = f(ds, max_broadcast_rows=3, scoring="auto").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _run_freq(DOCS)
    pd.testing.assert_frame_equal(want, got[list(want.columns)],
                                  check_exact=True)
    with pytest.raises(ValueError, match="broadcast budget"):
        f(ds, max_broadcast_rows=3, scoring="broadcast").to_pandas()
    with pytest.raises(ValueError, match="scoring"):
        f(ds, scoring="bogus")


def test_cross_corpus_reference_both_paths():
    """reference= scores docs against a separate corpus's counts;
    broadcast and shuffle paths agree byte-for-byte, and grams unseen
    in the reference contribute 0."""
    ref = pd.DataFrame({
        "doc_id": np.arange(100, 103, dtype=np.int64),
        "text": ["the cat sat", "the cat", "sat on the mat"]})
    ref_ds = ray.data.from_pandas(ref).repartition(2)
    ds = ray.data.from_pandas(DOCS).repartition(3)
    a = lm_frequency_stats(ds, reference=ref_ds, scoring="broadcast") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref_ds2 = ray.data.from_pandas(ref).repartition(2)
    ds2 = ray.data.from_pandas(DOCS).repartition(3)
    b = lm_frequency_stats(ds2, reference=ref_ds2, scoring="shuffle") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[list(a.columns)], check_exact=True)
    got = a.set_index("doc_id")
    # 'the' occurs 3x in ref; doc 4 = 'the the the the' -> 4*3
    assert got.loc[4, "sum_tok_count"] == 12
    # ref has no 'the the' bigram -> 0
    assert got.loc[4, "sum_bigram_count"] == 0
    # doc 6 shares no token with ref -> all-zero sums, full token count
    assert got.loc[6, "sum_tok_count"] == 0
    assert got.loc[6, "n_tokens"] == 4
    # every input doc present even when nothing matches
    assert set(got.index) == set(DOCS.doc_id)


def test_cross_corpus_perplexity_runs():
    ref = pd.DataFrame({
        "doc_id": np.arange(100, 102, dtype=np.int64),
        "text": ["the cat sat on the mat", "the cat sat"]})
    ds = ray.data.from_pandas(DOCS).repartition(2)
    out = lm_perplexity(ds, reference=ray.data.from_pandas(ref)) \
        .to_pandas().set_index("doc_id")
    # in-reference doc scores far more predictable than novel-words doc
    assert out.loc[0, "ppl_bi"] < out.loc[6, "ppl_bi"]
    assert (out["ppl_bi"] >= 1.0).all()


def test_top_collocations_hand_values():
    """min_count prunes, lift ranks, ties break on (w1, w2)."""
    from gostatix_ray.stages.lm import top_collocations

    # "a b" x3 (c(a)=3, c(b)=5), "c b" x2, "d d" never reaches min_count
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["a b", "a b", "a b", "c b", "c b", "b b d"],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    t = top_collocations(ds, min_count=2, k=10).to_pandas()
    # corpus: tokens a=3 b=7 c=2 d=1, N=13
    # bigrams: a b=3, c b=2, b b=1, b d=1 -> min_count=2 keeps a-b, c-b
    # lift(a,b) = 3*13/(3*7) = lift(c,b) = 2*13/(2*7) = 13/7: an exact
    # TIE -> broken by w1 asc, so 'a' ranks first
    assert list(t["w1"]) == ["a", "c"]
    assert list(t["c12"]) == [3, 2]
    assert t["lift"].iloc[0] == 3 * 1.0 * 13 / (3 * 1.0 * 7)
    assert t["lift"].iloc[1] == 2 * 1.0 * 13 / (2 * 1.0 * 7)


def test_top_collocations_partition_invariant():
    from gostatix_ray.stages.lm import top_collocations

    rng = np.random.default_rng(7)
    words = np.array(["red", "blue", "green", "hot", "dog", "ice", "cream"])
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 12)))
             for _ in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts})
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        outs.append(top_collocations(ds, min_count=3, k=25).to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_top_collocations_empty_and_sparse():
    from gostatix_ray.stages.lm import top_collocations

    df = pd.DataFrame({"doc_id": np.array([0], dtype=np.int64),
                       "text": ["every word only once"]})
    t = top_collocations(ray.data.from_pandas(df), min_count=2, k=10)
    assert t.num_rows == 0
    assert t.column_names == ["w1", "w2", "c12", "c1", "c2", "lift"]
