"""scripts/sketch_job.py — the `ray job submit` entry point, run as a
subprocess exactly as a job runtime would."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "sketch_job.py")


@pytest.fixture(scope="module")
def transcripts(tmp_path_factory):
    from gostatix_ray.sources.transcripts import generate_transcripts

    path = str(tmp_path_factory.mktemp("job") / "tx.parquet")
    generate_transcripts(path, 20_000, seed=3, num_files=4)
    return path


def _run(args: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, SCRIPT, *args],
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])

def test_job_cli_flagship_and_resume(transcripts, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    spec = json.dumps([
        {"name": "convs", "kind": "hll", "params": {"m": 16384}, "on": "conv_id"},
        {"name": "turns", "kind": "tdigest", "params": {"compression": 100.0},
         "on": "turn_idx"},
    ])
    res = _run(["--input", transcripts, "--output", out_dir,
                "--checkpoint", ckpt, "--spec", spec, "--num-cpus", "2"])
    est = res["sketches"]["convs|"]
    # HLL ±1.04/sqrt(2^14) ~ 0.8%: the 20k-turn table has ~20k/|avg conv| convs;
    # just bound against the exact distinct
    import duckdb

    true = duckdb.sql(
        f"select count(distinct conv_id) from read_parquet('{transcripts}/*.parquet')"
    ).fetchone()[0]
    assert abs(est - true) / true < 0.05
    assert os.path.exists(os.path.join(out_dir, "sketch=convs", "estimates.parquet"))

    # resume from the checkpoint: byte-identical estimate, build skipped
    res2 = _run(["--input", transcripts, "--checkpoint", ckpt,
                 "--spec", spec, "--num-cpus", "2"])
    assert res2["sketches"] == res["sketches"]
