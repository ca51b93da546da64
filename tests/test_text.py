"""Text-analysis stages: token stats, quality, language id, fingerprints."""

import pyarrow as pa
import pytest

from gostatix_ray.stages.text_stats import Fingerprint, LangId, QualityScore, TokenStats


def _batch(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_stats_counts():
    out = TokenStats()(_batch(["a b c", "hello world", "single"]))
    assert out["n_tokens"].to_pylist() == [3, 2, 1]
    assert out["n_chars"].to_pylist() == [5, 11, 6]
    assert out["n_bpe_tokens"].to_pylist()[0] >= 3


def test_quality_score_ranges():
    out = QualityScore()(_batch([
        "the cat sat on the mat with a hat and a bat",
        "x x x x x x x x x x x x",
        "diverse tokens make for higher quality text generally speaking",
    ]))
    q = out["quality"].to_pylist()
    d = out["distinct_ratio"].to_pylist()
    assert d[1] < 0.2  # pure repetition
    assert d[2] > 0.9
    assert all(0 <= v <= 1.01 for v in q)
    s = out["stop_ratio"].to_pylist()
    assert s[0] > 0.3  # stopword-heavy english
    assert s[1] == 0.0


def test_langid_heuristic():
    out = LangId()(_batch([
        "the cat is in the house and it is warm",
        "el perro es un animal que vive en la casa",
        "zzzz qqqq xxxx",
    ]))
    preds = out["lang_pred"].to_pylist()
    assert preds[0] == "en"
    assert preds[1] == "es"
    assert preds[2] == "und"


def test_fingerprint_deterministic_and_shift_tolerant():
    f = Fingerprint(window=4)
    a = f(_batch(["alpha beta gamma delta epsilon zeta", "other text entirely"]))
    b = f(_batch(["alpha beta gamma delta epsilon zeta", "other text entirely"]))
    assert a["content_hash"].to_pylist() == b["content_hash"].to_pylist()
    assert a["rolling_fp"].to_pylist() == b["rolling_fp"].to_pylist()
    # identical docs share hashes; different docs don't
    assert a["content_hash"][0].as_py() != a["content_hash"][1].as_py()


def test_stage_runs_on_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": i, "text": f"doc number {i} with the tokens"} for i in range(100)])
    out = ds.map_batches(TokenStats(), batch_format="pyarrow", concurrency=2).to_pandas()
    assert len(out) == 100
    assert (out["n_tokens"] == 6).all()


def test_bpe_count_matches_python_regex():
    """The RE2 pattern given to Arrow must count the same non-overlapping
    matches as the Python/Unicode original, including CJK text."""
    import re

    import pyarrow as pa

    py = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+")
    texts = [
        "It's a test, isn't it? 42 times!",
        "hello   world",
        "我有一个想法 and some english",
        "", "x", "don't you'll we've",
        "punct!!! ... ??? -- ##",
    ]
    ts = TokenStats("text", "doc_id")
    out = ts(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    got = out["n_bpe_tokens"].to_pylist()
    want = [len(py.findall(t)) for t in texts]
    assert got == want, (got, want)


def test_repetition_stats_matches_bruteforce(ray_session):
    from collections import Counter

    import ray.data as rd

    from gostatix_ray.stages.text_stats import RepetitionStats

    texts = [
        "a b c a b a",          # dup-heavy
        "x",                     # single token
        "q w e r t y",           # all distinct
        "z z z z",               # one token repeated
        "m n m n m n m n",
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = (
        rd.from_arrow(tbl)
        .map_batches(RepetitionStats(), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        c = Counter(t.split(" "))
        n = sum(c.values())
        assert out["n_tokens"][i] == n
        assert out["n_distinct"][i] == len(c)
        assert out["max_token_count"][i] == max(c.values())
        assert out["dup_token_frac"][i] == 1.0 - len(c) / n
        assert out["top_token_frac"][i] == max(c.values()) / n


def test_token_doc_frequency_matches_bruteforce(ray_session):
    import ray.data as rd

    from gostatix_ray.stages.text_stats import token_doc_frequency

    texts = [
        "the cat sat",
        "the the dog",       # 'the' twice in one doc counts once
        "cat cat cat",
        "fish",
        "the fish swam home",
    ]
    expect: dict[str, int] = {}
    for t in texts:
        for tok in set(t.split(" ")):
            expect[tok] = expect.get(tok, 0) + 1
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    for nblocks in (1, 3):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = token_doc_frequency(ds).to_pandas()
        got = dict(zip(out["token"], out["df"]))
        assert got == expect


def test_tfidf_top_terms_matches_bruteforce(ray_session):
    from collections import Counter

    import ray.data as rd

    from gostatix_ray.stages.text_stats import TfIdfTopTerms

    texts = [
        "apple apple banana the the the",
        "banana cherry the",
        "apple cherry cherry date",
        "date date date the apple",
    ]
    df: dict[str, int] = {}
    for t in texts:
        for tok in set(t.split(" ")):
            df[tok] = df.get(tok, 0) + 1
    vocab = pa.table({"token": list(df), "df": [df[t] for t in df]})
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = (
        rd.from_arrow(tbl).repartition(2)
        .map_batches(TfIdfTopTerms(vocab, k=2), batch_format="pyarrow")
        .to_pandas()
    )
    for i, t in enumerate(texts):
        tf = Counter(t.split(" "))
        scored = sorted(
            ((tok, c * (1.0 / df[tok])) for tok, c in tf.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:2]
        got = out[out["doc_id"] == i].sort_values("rank")
        assert list(got["token"]) == [tok for tok, _ in scored], (i, scored, got)
        assert list(got["rank"]) == [1, 2]


def test_regex_scrub_masks_pii_shapes(ray_session):
    import pyarrow as pa

    from gostatix_ray.stages.text_stats import RegexScrub

    scrub = RegexScrub(r"[\w.]+@[\w.]+|\+?\d[\d -]{7,}\d", mask="<PII>")
    batch = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail me at jo.doe@example.com or call +1 555 123 4567 now",
                "no sensitive content here",
                "two mails: a@b.co c@d.org",
            ],
        }
    )
    out = scrub(batch)
    assert out["text"][0].as_py() == "mail me at <PII> or call <PII> now"
    assert out["n_masked"].to_pylist() == [2, 0, 2]
    assert out["text"][1].as_py() == "no sensitive content here"


def test_normalize_text_matches_duckdb_twin():
    """lowercase + collapse non-alnum runs + trim, bit-equal to the
    DuckDB twin (both utf8proc lower + RE2 replace)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    from gostatix_ray.stages.text_stats import normalize_text

    texts = ["Hello,  World!! 42", "", "  élan—café  ", "MiXeD\tCaSe\n",
             "a-b_c.d", "ALL CAPS", "123", "...", None]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": pd.array(texts, dtype="string")})
    ds = ray.data.from_pandas(df).repartition(3)
    got = normalize_text(ds).to_pandas().sort_values("doc_id")
    want = duckdb.sql(
        "SELECT doc_id, trim(regexp_replace(lower(coalesce(text, '')), "
        "'[^a-z0-9]+', ' ', 'g'), ' ') AS text FROM df ORDER BY doc_id"
    ).df()
    assert list(got["text"]) == list(want["text"])
    # idempotent: normalizing a normalized corpus is the identity
    ds2 = ray.data.from_pandas(got.reset_index(drop=True))
    again = normalize_text(ds2).to_pandas().sort_values("doc_id")
    assert list(again["text"]) == list(got["text"])
