import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract: tests own it)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory):
    """Deterministic synthetic transcript table (BASELINE.json input_hint shape)."""
    from gostatix_ray.sources.transcripts import generate_transcripts

    out = str(tmp_path_factory.mktemp("transcripts") / "transcripts.parquet")
    generate_transcripts(out, num_turns=20_000, seed=42)
    return out
