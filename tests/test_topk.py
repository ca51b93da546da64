"""Ported Top-K oracles (/root/reference/top_k_test.go) + distributed merge."""

import numpy as np
import pytest

from gostatix_ray.kernels import topk

# top_k_test.go:12-44 stream (single increments, given order)
FRUIT = (
    ["apple"] * 7 + ["banana"] * 4 + ["carrot"] * 3 + ["grape"] * 3
    + ["peach"] * 3 + ["plum"] * 3 + ["kiwi"] * 2 + ["mango"] * 2
    + ["pineapple"] * 2 + ["melon"] + ["orange"]
)
EXPECTED = [
    ("apple", 7), ("banana", 4), ("carrot", 3), ("grape", 3), ("peach", 3),
    ("plum", 3), ("kiwi", 2), ("mango", 2), ("pineapple", 2), ("melon", 1),
    ("orange", 1),
]


def test_fruit_ranking_k11():
    # top_k_test.go:46-58: count desc, element asc tie-break
    t = topk.new(topk.TopKSpec(k=11, error_rate=0.001, accuracy=0.999))
    topk.update(t, FRUIT)
    assert topk.values(t) == EXPECTED


def test_fruit_ranking_k3():
    t = topk.new(topk.TopKSpec(k=3))
    topk.update(t, FRUIT)
    assert topk.values(t) == EXPECTED[:3]


def test_single_increment_equals_batched():
    # top_k_test.go:60-90
    a = topk.new(topk.TopKSpec(k=11))
    for el in FRUIT:
        topk.update(a, [el])
    b = topk.new(topk.TopKSpec(k=11))
    els, cnts = np.unique(FRUIT, return_counts=True)
    topk.update(b, list(els), cnts)
    assert topk.values(a) == topk.values(b)


@pytest.mark.parametrize("nparts", [2, 3, 5])
def test_partitioned_merge_matches_single(nparts):
    # distributed semantics (SURVEY.md §1.3.7): split stream, build, merge
    single = topk.new(topk.TopKSpec(k=11))
    topk.update(single, FRUIT)
    parts = [topk.new(topk.TopKSpec(k=11)) for _ in range(nparts)]
    for i, el in enumerate(FRUIT):
        topk.update(parts[i % nparts], [el])
    merged = parts[0]
    for p in parts[1:]:
        merged = topk.merge(merged, p)
    assert topk.values(merged) == topk.values(single) == EXPECTED


def test_merge_order_independent():
    parts = [topk.new(topk.TopKSpec(k=5)) for _ in range(4)]
    for i, el in enumerate(FRUIT):
        topk.update(parts[i % 4], [el])
    ab = topk.merge(topk.merge(parts[0], parts[1]), topk.merge(parts[2], parts[3]))
    cd = topk.merge(parts[3], topk.merge(parts[2], topk.merge(parts[1], parts[0])))
    assert topk.to_bytes(ab) == topk.to_bytes(cd)


def test_roundtrip():
    t = topk.new(topk.TopKSpec(k=11))
    topk.update(t, FRUIT)
    t2 = topk.from_bytes(topk.to_bytes(t))
    assert topk.equals(t, t2)
    assert topk.values(t2) == EXPECTED
