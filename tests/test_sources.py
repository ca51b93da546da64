"""Corpus sources: JSONL/CSV/parquet readers normalized to the
canonical (doc_id, text, ...) schema (sources/corpus.py)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from gostatix_ray.sources.corpus import read_documents, to_parquet_corpus


def _write_fixtures(tmp_path):
    docs = [
        {"doc_id": 1, "text": "the quick brown fox", "lang": "en"},
        {"doc_id": 2, "text": "el zorro veloz", "lang": "es"},
        {"doc_id": 3, "text": "the lazy dog", "lang": "en"},
    ]
    jl = os.path.join(tmp_path, "docs.jsonl")
    with open(jl, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    cs = os.path.join(tmp_path, "docs.csv")
    with open(cs, "w") as f:
        f.write("doc_id,text,lang\n")
        for d in docs:
            f.write(f"{d['doc_id']},{d['text']},{d['lang']}\n")
    pqp = os.path.join(tmp_path, "docs.parquet")
    pq.write_table(pa.Table.from_pylist(docs), pqp)
    return docs, jl, cs, pqp


def test_read_documents_all_formats(ray_session, tmp_path):
    docs, jl, cs, pqp = _write_fixtures(str(tmp_path))
    want = {(d["doc_id"], d["text"], d["lang"]) for d in docs}
    for path, fmt in ((pqp, "parquet"), (jl, "jsonl"), (cs, "csv")):
        out = read_documents(path, format=fmt, keep_cols=["lang"]).to_pandas()
        got = set(zip(out["doc_id"], out["text"], out["lang"]))
        assert got == want, fmt
        assert list(out.columns) == ["doc_id", "text", "lang"]


def test_read_documents_content_hash_ids(ray_session, tmp_path):
    path = os.path.join(str(tmp_path), "noid.jsonl")
    with open(path, "w") as f:
        for t in ("alpha beta", "gamma delta", "alpha beta"):
            f.write(json.dumps({"text": t}) + "\n")
    out = read_documents(path, format="jsonl").to_pandas()
    assert len(out) == 3
    by_text = out.groupby("text")["doc_id"].nunique()
    assert by_text["alpha beta"] == 1  # identical text -> identical id
    assert out["doc_id"].dtype == "int64"
    # deterministic across reads
    out2 = read_documents(path, format="jsonl").to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_to_parquet_corpus_roundtrip(ray_session, tmp_path):
    docs, jl, _, _ = _write_fixtures(str(tmp_path))
    ds = read_documents(jl, format="jsonl", keep_cols=["lang"])
    out_dir = os.path.join(str(tmp_path), "corpus")
    to_parquet_corpus(ds, out_dir, partition_cols=["lang"])
    back = read_documents(out_dir, format="parquet", keep_cols=["lang"]).to_pandas()
    assert {(r.doc_id, r.text) for r in back.itertuples()} == {
        (d["doc_id"], d["text"]) for d in docs
    }
