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


def test_sharded_bloom_merge_byte_identical(ray_session):
    """Sharded writes + OR-merge == single-writer filter, bit for bit."""
    from gostatix_ray.state.live import ShardedLiveSketch

    spec = bloom.BloomSpec.from_params(5000, 0.001)
    keys = [f"user{i}" for i in range(500)]
    solo = LiveSketch("t-solo-bloom", "bloom", spec)
    shard = ShardedLiveSketch("t-shard-bloom", "bloom", spec, shards=4)
    try:
        solo.update(keys)
        assert shard.update(keys) == len(keys)
        a = bloom.from_bytes(solo.snapshot())
        b = bloom.from_bytes(shard.snapshot())
        assert bloom.equals(a, b)
    finally:
        solo.drop()
        shard.drop()


def test_sharded_concurrent_writers(ray_session):
    """Many independent Ray tasks attach BY NAME and write concurrently;
    the merged sketch equals one sequential single-writer build."""
    import ray

    from gostatix_ray.kernels import hll
    from gostatix_ray.state.live import ShardedLiveSketch

    spec = hll.HLLSpec(m=1 << 12)
    shard = ShardedLiveSketch("t-shard-hll", "hll", spec, shards=4)

    @ray.remote
    def writer(lo: int, hi: int) -> int:
        from gostatix_ray.state.live import ShardedLiveSketch as S

        s = S("t-shard-hll", "hll")
        return s.update([f"u{i}" for i in range(lo, hi)])

    try:
        total = sum(ray.get([writer.remote(i * 250, (i + 1) * 250) for i in range(4)]))
        assert total == 1000
        merged = hll.from_bytes(shard.snapshot())
        ref = hll.new(spec)
        hll.update(ref, [f"u{i}" for i in range(1000)])
        assert hll.equals(ref, merged)
    finally:
        shard.drop()


def test_sharded_cuckoo_routes_and_refuses_merge(ray_session):
    import pytest as _pytest

    from gostatix_ray.state.live import ShardedLiveSketch

    spec = cuckoo.CuckooSpec(size=256, bucket_size=4, fp_length=8, retries=50)
    s = ShardedLiveSketch("t-shard-cuckoo", "cuckoo", spec, shards=3)
    try:
        s.update(["a", "b", "c", "d"])
        assert s.lookup(["a", "b", "c", "d", "zz"]) == [True, True, True, True, False]
        assert s.remove(["b"]) == [True]
        assert s.lookup(["b"]) == [False]
        with _pytest.raises(NotImplementedError):
            s.snapshot()
        assert len(s.shard_snapshots()) == 3
        # attach-by-name discovers the shard count
        other = ShardedLiveSketch("t-shard-cuckoo", "cuckoo")
        assert other.n_shards == 3
        assert other.lookup(["a"]) == [True]
    finally:
        s.drop()


def test_sharded_attach_uses_stamped_count_and_fails_on_dead_shard(ray_session):
    """Attach reads the shard count stamped at creation; a dead middle
    shard is a hard error, never a silent truncation that would
    mis-route writes (round-4 review finding)."""
    import ray

    from gostatix_ray.state.live import ShardedLiveSketch

    spec = bloom.BloomSpec.from_params(2000, 0.001)
    shard = ShardedLiveSketch("t-shard-meta", "bloom", spec, shards=3)
    try:
        shard.update([f"k{i}" for i in range(50)])
        attached = ShardedLiveSketch("t-shard-meta", "bloom")
        assert attached.n_shards == 3
        # kill a MIDDLE shard: attach must now raise, not truncate to 1
        ray.kill(ray.get_actor("t-shard-meta::shard1", namespace="gostatix"))
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="shard 1 of 3 is gone"):
            ShardedLiveSketch("t-shard-meta", "bloom")
    finally:
        for i in (0, 2):
            try:
                ray.kill(ray.get_actor(f"t-shard-meta::shard{i}", namespace="gostatix"))
            except ValueError:
                pass
