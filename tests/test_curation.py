"""End-to-end corpus curation (pipelines/curation.py): planted quality
failures, exact dups, and near-dup clusters must each be pruned."""

import numpy as np

from gostatix_ray.pipelines.curation import curate_corpus, exact_dedup_with_text, quality_filter


def _mkdocs(ray_session):
    import ray.data as rd

    good = ("the quick brown fox jumps over the lazy dog while the sun sets slowly "
            "behind the old red barn and the farmer watches it for a while")
    rows = [
        {"doc_id": 0, "text": good},
        {"doc_id": 1, "text": good},  # exact dup of 0 -> dropped
        {"doc_id": 2, "text": good.replace("lazy dog", "lazy cat")},  # near-dup of 0 -> dropped
        {"doc_id": 3, "text": "zz zz zz zz"},  # low quality (repetitive, no stopwords)
        {"doc_id": 4, "text": "it is a fine day to walk in the park and see the birds "
                              "that sing from the tall green trees near the calm river"},
    ]
    return rd.from_items(rows)


def test_curate_corpus_end_to_end(ray_session):
    ds = _mkdocs(ray_session)
    out = curate_corpus(ds, min_quality=0.5, jaccard_threshold=0.5, concurrency=2).to_pandas()
    assert sorted(out["doc_id"]) == [0, 4]


def test_exact_dedup_with_text_returns_text(ray_session):
    ds = _mkdocs(ray_session)
    surv = exact_dedup_with_text(ds).to_pandas()
    assert 1 not in set(surv["doc_id"])  # dup dropped
    assert set(surv.columns) == {"doc_id", "text"}
    assert (surv.loc[surv["doc_id"] == 0, "text"].iloc[0]).startswith("the quick")


def test_quality_filter_drops_junk(ray_session):
    ds = _mkdocs(ray_session)
    kept = quality_filter(ds, min_quality=0.5).to_pandas()
    assert 3 not in set(kept["doc_id"])


def test_write_partitioned_resumable(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from gostatix_ray.pipelines.curation import write_partitioned_resumable

    ds = rd.from_items([{"doc_id": i, "text": f"doc {i}"} for i in range(200)])
    out = str(tmp_path / "sink")
    dirs = write_partitioned_resumable(ds, out, n_parts=4)
    assert len(dirs) == 4 and all(os.path.exists(os.path.join(d, "_SUCCESS")) for d in dirs)
    total = sum(pq.read_table(d).num_rows for d in dirs)
    assert total == 200
    # resume: poison one partition's marker, rerun -> only that one rewrites
    os.remove(os.path.join(dirs[2], "_SUCCESS"))
    mtimes = {d: os.path.getmtime(d) for d in dirs}
    write_partitioned_resumable(ds, out, n_parts=4)
    assert os.path.exists(os.path.join(dirs[2], "_SUCCESS"))
    for d in (dirs[0], dirs[1], dirs[3]):
        assert os.path.getmtime(d) == mtimes[d]  # untouched
    assert sum(pq.read_table(d).num_rows for d in dirs) == 200


def test_sink_is_single_pass(ray_session, tmp_path):
    """The resumable sink must execute its input dataset exactly ONCE
    (round-2 verdict: the old shape ran one filtered pass per partition)."""
    import ray
    import ray.data as rd

    from gostatix_ray.pipelines.curation import write_partitioned_resumable

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def incr(self):
            self.n += 1

        def get(self):
            return self.n

    c = Counter.remote()

    def _count(batch):
        ray.get(c.incr.remote())
        return batch

    ds = rd.from_items(
        [{"doc_id": i, "text": f"doc {i}"} for i in range(100)], override_num_blocks=4
    ).map_batches(_count, batch_format="pyarrow")
    write_partitioned_resumable(ds, str(tmp_path / "sink1"), n_parts=8)
    assert ray.get(c.get.remote()) == 4


def test_curate_corpus_many_clusters(ray_session):
    """Distributed anti-join prune with a cluster table big enough to span
    multiple blocks: 40 near-dup triples + 20 distinct docs."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(4000)]
    rows = []
    did = 0
    expected = []
    for g in range(40):
        base_words = list(rng.choice(vocab, 30, replace=False))
        base = " ".join(base_words)
        v1 = base_words.copy()
        v1[5] = "altered"
        v2 = base_words.copy()
        v2[20] = "changed"
        for v, txt in enumerate([base, " ".join(v1), " ".join(v2)]):
            rows.append({"doc_id": did + v, "text": txt})
        expected.append(did)  # min id of the cluster survives
        did += 3
    for g in range(20):
        rows.append({"doc_id": did, "text": " ".join(rng.choice(vocab, 30, replace=False))})
        expected.append(did)
        did += 1
    ds = rd.from_items(rows, override_num_blocks=8)
    out = curate_corpus(ds, min_quality=0.0, jaccard_threshold=0.5, concurrency=2).to_pandas()
    assert sorted(out["doc_id"]) == sorted(expected)


def test_curate_corpus_checkpoint_resume(ray_session, tmp_path):
    """Kill-and-resume (round-3 verdict #6): a rerun with the same
    checkpoint_dir must (a) produce identical curated output, (b) never
    re-execute upstream stages — proven by feeding the resume run a
    POISONED input dataset that raises if any task consumes it."""
    import pyarrow as pa

    ds = _mkdocs(ray_session)
    ckpt = str(tmp_path / "curate_ckpt")
    out1 = curate_corpus(ds, min_quality=0.5, jaccard_threshold=0.5,
                         concurrency=2, checkpoint_dir=ckpt).to_pandas()
    assert sorted(out1["doc_id"]) == [0, 4]

    def _boom(batch: pa.Table) -> pa.Table:
        raise RuntimeError("resume must not re-read the input")

    poisoned = _mkdocs(ray_session).map_batches(_boom, batch_format="pyarrow")
    out2 = curate_corpus(poisoned, min_quality=0.5, jaccard_threshold=0.5,
                         concurrency=2, checkpoint_dir=ckpt).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out1["doc_id"])


def test_curate_corpus_resume_after_partial_failure(ray_session, tmp_path):
    """Mid-pipeline kill: only the survivors stage completed; the resume
    run reuses it (input stays untouched) and finishes the rest."""
    import os

    import pyarrow as pa

    from gostatix_ray.state.lineage import checkpoint_dataset

    ds = _mkdocs(ray_session)
    ckpt = str(tmp_path / "curate_ckpt2")
    # simulate the crash: survivors checkpoint written, pairs never ran
    # (stamped with the same parameter spec curate_corpus will present —
    # an unstamped/mismatched marker is treated as stale and recomputed)
    checkpoint_dataset(
        lambda: exact_dedup_with_text(quality_filter(ds, min_quality=0.5)),
        os.path.join(ckpt, "survivors"),
        spec={"stage": "exact_dedup", "text_col": "text", "id_col": "doc_id",
              "min_quality": 0.5},
    )
    assert os.path.exists(os.path.join(ckpt, "survivors", "_SUCCESS"))
    assert not os.path.exists(os.path.join(ckpt, "pairs", "_SUCCESS"))

    def _boom(batch: pa.Table) -> pa.Table:
        raise RuntimeError("resume must not re-read the input")

    poisoned = _mkdocs(ray_session).map_batches(_boom, batch_format="pyarrow")
    out = curate_corpus(poisoned, min_quality=0.5, jaccard_threshold=0.5,
                        concurrency=2, checkpoint_dir=ckpt).to_pandas()
    assert sorted(out["doc_id"]) == [0, 4]
    assert os.path.exists(os.path.join(ckpt, "pairs", "_SUCCESS"))


def test_checkpoint_dataset_empty_stage(ray_session, tmp_path):
    import os

    import ray.data as rd

    from gostatix_ray.state.lineage import checkpoint_dataset

    d = str(tmp_path / "empty_stage")
    ds0, n = checkpoint_dataset(lambda: rd.range(10).filter(lambda r: False), d)
    assert ds0 is None and n == 0
    # resume path short-circuits identically without calling the factory
    def _bomb():
        raise AssertionError("factory must not run on resume")
    ds1, n1 = checkpoint_dataset(_bomb, d)
    assert ds1 is None and n1 == 0


def test_checkpoint_invalidated_on_parameter_change(ray_session, tmp_path):
    """A rerun with DIFFERENT parameters must recompute, not silently
    return the old-parameter checkpoint (round-4 review finding)."""
    ds = _mkdocs(ray_session)
    ckpt = str(tmp_path / "curate_ckpt_params")
    out1 = curate_corpus(ds, min_quality=0.5, jaccard_threshold=0.5,
                         concurrency=2, checkpoint_dir=ckpt).to_pandas()
    assert sorted(out1["doc_id"]) == [0, 4]
    # jaccard_threshold=0.99: the near-dup pair no longer qualifies, so
    # BOTH members survive — a stale-pair checkpoint would still prune
    out2 = curate_corpus(_mkdocs(ray_session), min_quality=0.5,
                         jaccard_threshold=0.99, concurrency=2,
                         checkpoint_dir=ckpt).to_pandas()
    fresh = curate_corpus(_mkdocs(ray_session), min_quality=0.5,
                          jaccard_threshold=0.99, concurrency=2).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(fresh["doc_id"])
    assert sorted(out2["doc_id"]) != sorted(out1["doc_id"])
