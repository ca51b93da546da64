"""Driver-contract smoke: entry() / queries() / oracle_sql() shape."""

import pandas as pd
import pytest

import __ray_entry__ as entrymod


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)  # every oracle has a query
    assert len(oracles) >= 15
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_runs(ray_session):
    out = entrymod.entry()
    assert isinstance(out, pd.DataFrame)
    assert len(out) >= 1
    assert {"sketch", "kind", "rows", "headline_estimate"} <= set(out.columns)
