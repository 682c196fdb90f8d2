"""Keystone test: every registered query with an oracle must hash-match
DuckDB at sf0.001 — a local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from proteus_spark import registry
from tests.oracle_utils import compare, duckdb_conn

registry._import_all()
ORACLED = [(n, s) for n, s in sorted(registry.QUERIES.items()) if s.oracle is not None]
ROWS_ONLY = [(n, s) for n, s in sorted(registry.QUERIES.items()) if s.oracle is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", [n for n, _ in ORACLED])
def test_oracle_match(spark, sf_dir, con, name):
    spec = registry.QUERIES[name]
    df = spec.fn(spark, sf_dir)
    problems = compare(df, con, spec.resolve_oracle())
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", [n for n, _ in ROWS_ONLY])
def test_rows_only_runs(spark, sf_dir, name):
    spec = registry.QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0


def test_priority_window_all_oracled():
    """The external driver verifies queries()' FIRST 50 entries and records
    a RED `err: no_oracle` row for any of them lacking an oracle (it does
    NOT fall back to rows-only — proven by CORRECTNESS_r03). Make that
    mistake structurally impossible: every PRIORITY window slot must name a
    registered query that carries an oracle."""
    window = list(registry._ordered())[:50]
    missing = [n for n in registry.PRIORITY[:50] if n not in registry.QUERIES]
    assert not missing, f"PRIORITY names unregistered queries: {missing}"
    unoracled = [n for n in window if registry.QUERIES[n].resolve_oracle() is None]
    assert not unoracled, f"oracle-less queries in the driver window: {unoracled}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10
