"""Distributed cuckoo: partitioned filter build / lookup / remove."""

import numpy as np
import pytest

from gostatix_ray.kernels import cuckoo
from gostatix_ray.stages.membership import (
    PartitionedCuckoo,
    build_partitioned_cuckoo,
    filter_by_partitioned_cuckoo,
)

SPEC = cuckoo.CuckooSpec(size=512, bucket_size=4, fp_length=8, retries=100)


def test_insert_lookup_remove_roundtrip():
    f = PartitionedCuckoo(SPEC, n_partitions=4)
    keys = [f"key-{i}" for i in range(500)]
    f.insert(keys)
    assert f.lookup(keys).all()
    assert not f.lookup([f"absent-{i}" for i in range(500)]).any()
    assert f.remove(keys[:100]).all()
    assert not f.lookup(keys[:100]).any()
    assert f.lookup(keys[100:]).all()
    f2 = PartitionedCuckoo.from_bytes(f.to_bytes())
    assert f2.lookup(keys[100:]).all()
    assert not f2.lookup(keys[:100]).any()


def test_build_over_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"tool": f"tool-{i % 200}"} for i in range(5000)])
    f = build_partitioned_cuckoo(ds, "tool", SPEC, n_partitions=4)
    assert f.lookup([f"tool-{i}" for i in range(200)]).all()
    assert not f.lookup([f"ghost-{i}" for i in range(200)]).any()

    # dataset-scale filtering through the broadcast filter
    probe = rd.from_items(
        [{"tool": f"tool-{i}"} for i in range(200)] + [{"tool": f"ghost-{i}"} for i in range(100)]
    )
    kept = filter_by_partitioned_cuckoo(probe, f, "tool", concurrency=2).count()
    assert kept == 200


def test_deterministic_build(ray_session):
    import ray.data as rd

    rows = [{"k": f"v{i}"} for i in range(300)]
    a = build_partitioned_cuckoo(rd.from_items(rows), "k", SPEC, n_partitions=3)
    b = build_partitioned_cuckoo(rd.from_items(rows), "k", SPEC, n_partitions=3)
    assert a.to_bytes() == b.to_bytes()  # sorted-key insert + seeded PRNG
