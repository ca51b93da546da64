"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in gostatix_ray) calls ray.init()/ray.shutdown().

* ``entry()`` — flagship multi-sketch pipeline over /root/testdata/sf0.001
  (events + documents + the canonical transcript table).
* ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data extras; 143 as of round 5); each
  takes ``sf_dir``.
* ``oracle_sql()`` — DuckDB twins for the exactly-checkable queries
  (114 of 143); the rest are estimate-valued sketch queries, rows-only
  by design (their error bounds are asserted in tests/).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: one-pass multi-sketch build + estimates."""
    import pandas as pd

    from gostatix_ray.pipelines import catalog

    sf = "/root/testdata/sf0.001"
    flagship = catalog.flagship_transcripts(num_turns=5_000, seed=42)
    users = catalog.q_hll_distinct_users(sf)
    out = pd.concat(
        [
            flagship,
            pd.DataFrame(
                {
                    "sketch": ["hll_distinct_users_events"],
                    "group_key": [""],
                    "kind": ["hll"],
                    "rows": [len(users)],
                    "headline_estimate": [float(users["distinct_users_est"].iloc[0])],
                }
            ),
        ],
        ignore_index=True,
    )
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from gostatix_ray.pipelines import catalog

    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    from gostatix_ray.pipelines import catalog

    return dict(catalog.ORACLE_SQL)
