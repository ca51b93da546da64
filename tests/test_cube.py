"""Sketch-cube tests: range-merge correctness, delta extension,
compaction byte-stability, persistence (pipelines/cube.py)."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from gostatix_ray.kernels import hll, topk
from gostatix_ray.pipelines.cube import (
    build_sketch_cube,
    compact_sketch_cube,
    cube_range_distinct,
    cube_range_state,
    cube_range_topk,
    extend_sketch_cube,
    read_cube,
)
from gostatix_ray.stages.build import SketchRequest

SF = "/root/testdata/sf0.001"
LO, HI = "2024-01-08", "2024-01-16"


def _requests():
    return [
        SketchRequest("users_hll", "hll", hll.HLLSpec(m=1 << 14),
                      on=lambda b: pc.cast(b["user_id"], pa.string())),
        SketchRequest("type_topk", "topk",
                      topk.TopKSpec(k=3, error_rate=0.0001, accuracy=0.01),
                      on="event_type"),
    ]


@pytest.fixture(scope="module")
def cube_dir(ray_session, tmp_path_factory):
    import ray

    out = str(tmp_path_factory.mktemp("cube") / "events_cube")
    ds = ray.data.read_parquet(os.path.join(SF, "events.parquet"),
                               columns=["user_id", "event_type", "ts"])
    build_sketch_cube(ds, _requests(), time_col="ts", unit="day", out_dir=out)
    return out


def _exact(lo, hi, col="user_id"):
    df = pd.read_parquet(os.path.join(SF, "events.parquet"),
                         columns=[col, "ts"])
    m = (df["ts"] >= np.datetime64(lo)) & (df["ts"] < np.datetime64(hi))
    return df.loc[m, col]


def test_cube_cells_and_schema(cube_dir):
    tbl = read_cube(cube_dir)
    assert set(tbl.column_names) >= {"sketch", "kind", "group_key", "state", "rows"}
    days = sorted(set(tbl.filter(pc.equal(tbl["sketch"], "users_hll"))["group_key"].to_pylist()))
    assert days[0].startswith("2024-01-01") and days[-1].startswith("2024-01-30")
    assert len(days) == 30  # one cell per day in the testdata span


def test_range_distinct_within_hll_bound(cube_dir):
    exact = _exact(LO, HI).nunique()
    est = cube_range_distinct(cube_dir, "users_hll", LO, HI)
    rel = 1.04 / np.sqrt(1 << 14)
    assert abs(est - exact) <= max(3 * rel * exact, 2), (est, exact)


def test_range_topk_matches_exact_heavy_hitter(cube_dir):
    counts = _exact(LO, HI, col="event_type").value_counts()
    top = cube_range_topk(cube_dir, "type_topk", LO, HI)
    assert top[0][0] == counts.index[0]


def test_open_range_equals_full_build(cube_dir, ray_session):
    """Merging ALL daily cells == one global HLL over the table (max-merge
    associativity => byte-identical registers)."""
    import ray

    _, merged, rows = cube_range_state(cube_dir, "users_hll")
    df = pd.read_parquet(os.path.join(SF, "events.parquet"), columns=["user_id"])
    direct = hll.new(hll.HLLSpec(m=1 << 14))
    hll.update(direct, pa.array(df["user_id"].astype(str)))
    assert rows == len(df)
    assert hll.equals(merged, direct)


def test_extend_then_range_equals_one_shot(cube_dir, ray_session, tmp_path):
    """Cube built over two halves (build + extend) answers every range
    byte-identically to the one-shot cube."""
    import ray

    split = "2024-01-15T12:00:00"  # mid-day: the Jan-15 cell spans BOTH deltas
    out = str(tmp_path / "cube2")
    ds = ray.data.read_parquet(os.path.join(SF, "events.parquet"),
                               columns=["user_id", "event_type", "ts"])
    cut = pa.scalar(np.datetime64(split, "us"), pa.timestamp("us"))

    def _before(b):
        return b.filter(pc.less(b["ts"], cut))

    def _after(b):
        return b.filter(pc.greater_equal(b["ts"], cut))

    build_sketch_cube(ds.map_batches(_before, batch_format="pyarrow"),
                      _requests(), time_col="ts", unit="day", out_dir=out)
    extend_sketch_cube(ds.map_batches(_after, batch_format="pyarrow"),
                       _requests(), time_col="ts", unit="day", out_dir=out)
    for lo, hi in [(LO, HI), (None, None), ("2024-01-14", "2024-01-16")]:
        a = cube_range_state(cube_dir, "users_hll", lo, hi)[1]
        b = cube_range_state(out, "users_hll", lo, hi)[1]
        assert hll.equals(a, b), (lo, hi)

    # compaction folds the delta rows and stays byte-identical
    n_before = read_cube(out).num_rows
    compact_sketch_cube(out)
    tbl = read_cube(out)
    assert tbl.num_rows < n_before
    gk = tbl.filter(pc.equal(tbl["sketch"], "users_hll"))["group_key"]
    assert len(set(gk.to_pylist())) == len(gk)  # one row per cell
    for lo, hi in [(LO, HI), (None, None)]:
        a = cube_range_state(cube_dir, "users_hll", lo, hi)[1]
        b = cube_range_state(out, "users_hll", lo, hi)[1]
        assert hll.equals(a, b)


def test_cube_reader_parity(cube_dir):
    """CubeReader (cached and uncached) returns byte-identical states to
    the per-call path, and repeated cached queries stay stable."""
    from gostatix_ray.pipelines.cube import CubeReader

    cached = CubeReader(cube_dir)
    uncached = CubeReader(cube_dir, cache_states=False)
    for lo, hi in [(LO, HI), (None, None), ("2024-01-14", "2024-01-16"), ("2024-01-03", "2024-01-04")]:
        ref = cube_range_state(cube_dir, "users_hll", lo, hi)
        for rd in (cached, uncached):
            got = rd.state("users_hll", lo, hi)
            assert hll.equals(got[1], ref[1]), (lo, hi)
            assert got[2] == ref[2]
        # second cached pass (cache hits) must not drift
        again = cached.state("users_hll", lo, hi)
        assert hll.equals(again[1], ref[1])
        t_ref = cube_range_topk(cube_dir, "type_topk", lo, hi)
        assert cached.topk("type_topk", lo, hi) == t_ref


def test_persisted_cube_needs_no_input(cube_dir, tmp_path):
    """A copied cube directory answers ranges with zero engine/input access."""
    dst = str(tmp_path / "copy")
    shutil.copytree(cube_dir, dst)
    est = cube_range_distinct(dst, "users_hll", LO, HI)
    assert est > 0


def test_extend_rejects_mismatched_unit_and_spec(cube_dir):
    from gostatix_ray.pipelines.cube import _validate_extend

    tbl = read_cube(cube_dir)
    with pytest.raises(ValueError, match="unit"):
        _validate_extend(tbl, _requests(), "hour")
    bad = [SketchRequest("users_hll", "hll", hll.HLLSpec(m=1 << 12),
                         on=lambda b: b["user_id"])]
    with pytest.raises(ValueError, match="spec"):
        _validate_extend(tbl, bad, "day")
    with pytest.raises(ValueError, match="kind"):
        _validate_extend(tbl, [SketchRequest("users_hll", "kmv", None, on="x")], "day")
    _validate_extend(tbl, _requests(), "day")  # matching requests pass


def test_interrupted_compact_swap_heals(cube_dir, tmp_path):
    """A crash between compaction's two renames (cube dir gone, .old
    present) is healed by the next read."""
    dst = str(tmp_path / "healme")
    shutil.copytree(cube_dir, dst)
    os.rename(dst, dst + ".old")  # simulate the crash window
    assert not os.path.isdir(dst)
    est = cube_range_distinct(dst, "users_hll", LO, HI)
    assert os.path.isdir(dst) and est > 0


def test_fingerprint_sensitivity(tmp_path):
    """Changed projection code or regenerated input invalidates the tag."""
    from gostatix_ray.pipelines.cube import cube_fingerprint

    d = tmp_path / "sf"
    d.mkdir()
    f = d / "events.parquet"
    f.write_bytes(b"x" * 10)
    r1 = [SketchRequest("u", "hll", hll.HLLSpec(m=16), on=lambda b: b["a"])]
    r2 = [SketchRequest("u", "hll", hll.HLLSpec(m=16), on=lambda b: b["b"])]
    t1 = cube_fingerprint(str(d), unit="day", requests=r1)
    assert cube_fingerprint(str(d), unit="day", requests=r1) == t1  # stable
    assert cube_fingerprint(str(d), unit="day", requests=r2) != t1  # lambda body matters
    f.write_bytes(b"y" * 11)  # regenerate input in place
    assert cube_fingerprint(str(d), unit="day", requests=r1) != t1


def test_group_by_reserved():
    with pytest.raises(ValueError):
        build_sketch_cube(None, [SketchRequest("x", "hll", hll.HLLSpec(m=16),
                                               on="c", group_by="g")],
                          out_dir="/tmp/never")


def test_catalog_cube_queries(ray_session):
    from gostatix_ray.pipelines.catalog import (
        q_cube_dau_range,
        q_distinct_users_day_range_exact,
    )

    exact = q_distinct_users_day_range_exact(SF)["distinct_users"].iloc[0]
    got = q_cube_dau_range(SF)
    assert exact == _exact(LO, HI).nunique()
    rel = 1.04 / np.sqrt(1 << 14)
    est = got["distinct_users_est"].iloc[0]
    assert abs(est - exact) <= max(3 * rel * exact, 2)


# ---------------------------------------------------------------------------
# two-dimensional (time x dim) cube
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cube2d_dir(ray_session, tmp_path_factory):
    import ray

    out = str(tmp_path_factory.mktemp("cube2d") / "events_cube2d")
    ds = ray.data.read_parquet(os.path.join(SF, "events.parquet"),
                               columns=["user_id", "event_type", "ts"])
    build_sketch_cube(ds, _requests(), time_col="ts", unit="day",
                      dim_col="event_type", out_dir=out)
    return out


def test_cube2d_cells_and_dim_filter(cube2d_dir):
    tbl = read_cube(cube2d_dir)
    cells = tbl.filter(pc.equal(tbl["sketch"], "users_hll"))["group_key"].to_pylist()
    assert all("\x1f" in c for c in cells)
    dims = sorted({c.split("\x1f", 1)[1] for c in cells})
    assert dims == ["click", "error", "purchase", "signup", "view"]
    # per-dim exact check against pandas
    df = pd.read_parquet(os.path.join(SF, "events.parquet"),
                         columns=["user_id", "event_type", "ts"])
    m = (df["ts"] >= np.datetime64(LO)) & (df["ts"] < np.datetime64(HI))
    for d in ("click", "purchase"):
        exact = df.loc[m & (df["event_type"] == d), "user_id"].nunique()
        est = cube_range_distinct(cube2d_dir, "users_hll", LO, HI, dim=d)
        rel = 1.04 / np.sqrt(1 << 14)
        assert abs(est - exact) <= max(3 * rel * exact, 2), (d, est, exact)


def test_cube2d_across_dims_equals_1d_cube(cube2d_dir, cube_dir):
    """Merging a time range ACROSS dims must give byte-identical HLL
    registers to the 1-D day cube over the same range (max-merge is
    commutative over any partitioning of the same rows)."""
    _, s2, rows2 = cube_range_state(cube2d_dir, "users_hll", LO, HI)
    _, s1, rows1 = cube_range_state(cube_dir, "users_hll", LO, HI)
    assert rows1 == rows2
    assert hll.to_bytes(s1) == hll.to_bytes(s2)


def test_cube2d_range_and_dim_missing_raises(cube2d_dir):
    with pytest.raises(KeyError):
        cube_range_distinct(cube2d_dir, "users_hll", LO, HI, dim="nosuchdim")


def test_cube_year_scale_8760_cells(ray_session, tmp_path):
    """The 100 TB pitch rests on the cube's CELL-COUNT axis: a year of
    hourly cells (8,760). Build a synthetic year at ~6 rows/hour, then
    assert (a) one cell per hour, (b) compaction is byte-stable at this
    cell count, (c) CubeReader answers a month range in milliseconds
    (generous noisy-host bound), (d) a week range's distinct estimate
    is within the HLL bound of exact."""
    import time

    import ray

    rng = np.random.default_rng(17)
    n = 8760 * 6
    ts = (np.datetime64("2024-01-01", "us")
          + (np.arange(n) * 600_000_000).astype("timedelta64[us]"))
    assert str(ts[-1]).startswith("2024-12-30")  # 365d span ends Dec 30 23:50 (2024 is leap)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 5000, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": ts,
    })
    out = str(tmp_path / "year_cube")
    reqs = [SketchRequest("users_hll", "hll", hll.HLLSpec(m=1 << 12),
                          on=lambda b: pc.cast(b["user_id"], pa.string()))]
    build_sketch_cube(ray.data.from_pandas(df).repartition(8), reqs,
                      time_col="ts", unit="hour", out_dir=out)
    tbl = read_cube(out)
    hours = tbl.filter(pc.equal(tbl["sketch"], "users_hll"))["group_key"].to_pylist()
    assert len(hours) == len(set(hours)) == 8760  # one cell per hour, full year

    compact_sketch_cube(out)
    a = read_cube(out)
    compact_sketch_cube(out)
    b = read_cube(out)
    # states/rows/checksums byte-stable under repeated compaction (the
    # fragment column is a lineage tag and re-hashes each fold by design)
    stable = [c for c in a.column_names if c != "fragment"]
    assert a.select(stable).equals(b.select(stable))

    from gostatix_ray.pipelines.cube import CubeReader

    r = CubeReader(out)
    exact_week = df.loc[(df["ts"] >= np.datetime64("2024-03-04"))
                        & (df["ts"] < np.datetime64("2024-03-11")), "user_id"].nunique()
    est = r.distinct("users_hll", "2024-03-04T00", "2024-03-11T00")
    rel = 1.04 / np.sqrt(1 << 12)
    assert abs(est - exact_week) <= max(4 * rel * exact_week, 3), (est, exact_week)
    # warmed-cache latency for a ~720-cell month range
    r.distinct("users_hll", "2024-06-01T00", "2024-07-01T00")
    t0 = time.perf_counter()
    for _ in range(5):
        r.distinct("users_hll", "2024-06-01T00", "2024-07-01T00")
    per_q = (time.perf_counter() - t0) / 5
    assert per_q < 0.5, f"month-range query took {per_q * 1e3:.0f} ms warm"
