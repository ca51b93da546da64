"""window_scan (distributed prefix scan) must be frame-identical to
window_over for the scan-decomposable columns, including under extreme
key skew and across many small input blocks (forcing partitions to
span block boundaries after the sort)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(n: int, n_users: int, seed: int, hot_frac: float = 0.0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    users = rng.integers(0, n_users, n)
    if hot_frac > 0:
        hot = rng.random(n) < hot_frac
        users[hot] = 0
    ts = np.datetime64("2024-01-01", "us") + rng.integers(0, 10**9, n).astype("timedelta64[us]")
    return pd.DataFrame({
        "user_id": np.char.add("u", users.astype(str)),
        "event_id": np.arange(n, dtype=np.int64),  # unique tiebreak
        "ts": ts,
        "cents": rng.integers(-50, 500, n).astype(np.int64),
    })


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["user_id", "event_id"]).reset_index(drop=True)[
        sorted(df.columns)]


@pytest.mark.parametrize("hot_frac,blocks", [(0.0, 3), (0.4, 16)])
def test_scan_matches_window_over(ray_session, hot_frac, blocks):
    import ray.data as rd

    from gostatix_ray.stages.window_fns import window_over
    from gostatix_ray.stages.window_scan import window_scan

    df = _events(20_000, 300, seed=int(hot_frac * 10) + blocks, hot_frac=hot_frac)
    kwargs = dict(part_col="user_id", order_col="ts", tiebreak="event_id",
                  sum_col="cents", running_name="running_cents",
                  gap_name="gap", gap_default=-1, seq_name="rn",
                  keep=["user_id", "event_id"])
    a = window_over(rd.from_pandas(df).repartition(blocks), **kwargs).to_pandas()
    b = window_scan(rd.from_pandas(df).repartition(blocks), **kwargs).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_scan_one_giant_partition_many_blocks(ray_session):
    """The design point: ONE partition larger than any block still
    computes exact running values (the hot key spans every block)."""
    import ray.data as rd

    from gostatix_ray.stages.window_scan import window_scan

    n = 30_000
    df = _events(n, 1, seed=9)  # every row in one partition
    out = window_scan(
        rd.from_pandas(df).repartition(24),
        part_col="user_id", order_col="ts", tiebreak="event_id",
        sum_col="cents", running_name="running_cents",
        gap_name="gap", seq_name="rn", keep=["event_id"],
    ).to_pandas().sort_values("rn").reset_index(drop=True)
    ref = df.sort_values(["ts", "event_id"]).reset_index(drop=True)
    assert (out["rn"].to_numpy() == np.arange(1, n + 1)).all()
    assert (out["running_cents"].to_numpy() == ref["cents"].cumsum().to_numpy()).all()
    ts = ref["ts"].astype("int64").to_numpy()
    expect_gap = np.concatenate(([-1], np.diff(ts)))
    assert (out["gap"].to_numpy() == expect_gap).all()


def test_scan_column_subsets(ray_session):
    """gap-only and sum-only configurations (internal __seq still drives
    the chain walk) stay exact."""
    import ray.data as rd

    from gostatix_ray.stages.window_fns import window_over
    from gostatix_ray.stages.window_scan import window_scan

    df = _events(8_000, 50, seed=3, hot_frac=0.3)
    base = dict(part_col="user_id", order_col="ts", tiebreak="event_id",
                keep=["user_id", "event_id"])
    for kw in (dict(sum_col=None, gap_name="gap", seq_name=None),
               dict(sum_col="cents", gap_name=None, seq_name=None),
               dict(sum_col=None, gap_name=None, seq_name="rn")):
        a = window_over(rd.from_pandas(df).repartition(8), **base, **kw).to_pandas()
        b = window_scan(rd.from_pandas(df).repartition(8), **base, **kw).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_scan_empty_blocks(ray_session):
    """More blocks than rows: empty blocks must flow through all three
    passes with the output schema intact."""
    import ray.data as rd

    from gostatix_ray.stages.window_scan import window_scan

    df = _events(5, 2, seed=1)
    out = window_scan(
        rd.from_pandas(df).repartition(16),
        part_col="user_id", order_col="ts", tiebreak="event_id",
        sum_col="cents", running_name="running_cents",
        gap_name="gap", seq_name="rn", keep=["user_id", "event_id"],
    ).to_pandas()
    assert len(out) == 5
    assert set(out.columns) == {"user_id", "event_id", "running_cents", "gap", "rn"}
