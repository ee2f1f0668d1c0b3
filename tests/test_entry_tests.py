"""Driver-contract smoke tests for __ray_entry__ (shape, not values —
value equality is the driver's DuckDB gate + tests/test_queries_tests)."""

import importlib.util
import os

import pytest


@pytest.fixture(scope="module")
def entry_mod():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__ray_entry__.py")
    spec = importlib.util.spec_from_file_location("__ray_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows_with_stable_schema(entry_mod):
    ds = entry_mod.entry()
    assert ds.count() > 0
    names = set(ds.schema().names)
    assert {"conv_id", "turn_idx", "role", "text", "tool", "ts"} <= names
    # second call: same schema (driver smoke-checks stability)
    assert set(entry_mod.entry().schema().names) == names


def test_queries_and_oracles_are_consistent(entry_mod):
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert len(qs) >= 30
    assert set(osql) <= set(qs)          # every oracle has a query
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
