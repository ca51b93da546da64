"""Named live-sketch actors: the Redis-role replacement (EP2)."""

import pytest

from gostatix_ray.kernels import bloom, cuckoo
from gostatix_ray.state.live import LiveSketch


def test_live_cuckoo_insert_remove(ray_session):
    live = LiveSketch("t-cuckoo", "cuckoo", cuckoo.CuckooSpec(size=128, bucket_size=4, fp_length=6, retries=50))
    try:
        live.update(["alice", "bob", "carol"])
        assert live.query("lookup_batch", ["alice", "bob", "ghost"]) == [True, True, False]
        assert live.remove(["bob"]) == [True]
        assert live.query("lookup_batch", ["bob"]) == [False]
        # a second handle attaches to the SAME state by name (EP2 FromKey analogue)
        other = LiveSketch("t-cuckoo")
        assert other.query("lookup_batch", ["alice"]) == [True]
    finally:
        live.drop()


def test_live_snapshot_broadcast(ray_session):
    live = LiveSketch("t-bloom", "bloom", bloom.BloomSpec.from_params(1000, 0.001))
    try:
        live.update(["k1", "k2"])
        blob = live.snapshot()
        state = bloom.from_bytes(blob)
        assert bloom.contains(state, ["k1", "k2"]).all()
        assert not bloom.contains(state, ["nope"]).any()
    finally:
        live.drop()


def test_remove_unsupported_kind(ray_session):
    live = LiveSketch("t-bloom2", "bloom", bloom.BloomSpec.from_params(100, 0.01))
    try:
        with pytest.raises(Exception):
            live.remove(["x"])
    finally:
        live.drop()
