"""Randomized differential testing of the reference predicate subset.

The reference evaluates exactly: conjunctions of EQ / RANGE(lb incl, ub
excl) / ISNULL / ISNOTNULL atoms (queries.go:159-213). Fixed golden
queries pin a handful of points in that space; here hypothesis draws
random predicate trees and every draw must agree with DuckDB on the same
parquet — a sqllogictest-style oracle sweep over the whole subset,
including the deliberately-decided edges (unbounded RANGE requires
attribute presence; unordered bounds yield the empty set on both engines).

``derandomize=True`` keeps CI deterministic; the example corpus still
covers hit/miss values, open/closed/inverted bounds, and 1-3-atom
conjunctions.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from proteus_spark.operators import filters
from proteus_spark.registry import load
from tests.oracle_utils import compare, duckdb_conn

# column -> domain (deliberately extends past the data's range so draws
# cover both hits and misses)
INT_COLS = {"l_orderkey": (1, 7000), "l_linenumber": (1, 9), "l_suppkey": (1, 120)}
FLT_COLS = {"l_quantity": (0.5, 55.0), "l_discount": (0.0, 0.12), "l_tax": (0.0, 0.09)}
STR_COLS = {
    "l_returnflag": ["A", "N", "R", "Z"],
    "l_linestatus": ["O", "F", "X"],
}
PROJ = ["l_orderkey", "l_linenumber"]


def _sql_lit(v) -> str:
    return f"'{v}'" if isinstance(v, str) else repr(v)


@st.composite
def _value(draw, col):
    if col in INT_COLS:
        lo, hi = INT_COLS[col]
        return draw(st.integers(min_value=lo, max_value=hi))
    if col in FLT_COLS:
        lo, hi = FLT_COLS[col]
        return round(
            draw(
                st.floats(
                    min_value=lo, max_value=hi, allow_nan=False, allow_infinity=False
                )
            ),
            4,
        )
    return draw(st.sampled_from(STR_COLS[col]))


@st.composite
def _atom(draw):
    col = draw(st.sampled_from(sorted([*INT_COLS, *FLT_COLS, *STR_COLS])))
    kind = draw(st.sampled_from(["eq", "range", "isnull", "isnotnull"]))
    if kind == "eq":
        v = draw(_value(col))
        return filters.eq(col, v), f"{col} = {_sql_lit(v)}"
    if kind == "isnull":
        return filters.is_null(col), f"{col} IS NULL"
    if kind == "isnotnull":
        return filters.is_not_null(col), f"{col} IS NOT NULL"
    lb = draw(st.none() | _value(col))
    ub = draw(st.none() | _value(col))
    parts = []
    if lb is not None:
        parts.append(f"{col} >= {_sql_lit(lb)}")
    if ub is not None:
        parts.append(f"{col} < {_sql_lit(ub)}")
    if not parts:
        # unbounded RANGE still requires attribute presence (queries.go:167-209)
        parts = [f"{col} IS NOT NULL"]
    return filters.range_pred(col, lb, ub), " AND ".join(parts)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load(spark, sf_dir, "lineitem")


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(atoms=st.lists(_atom(), min_size=1, max_size=3))
def test_conjunction_matches_duckdb(lineitem, con, atoms):
    preds = [a[0] for a in atoms]
    where = " AND ".join(f"({a[1]})" for a in atoms)
    got = filters.apply_predicates(lineitem, preds).select(*PROJ)
    oracle = f"SELECT {', '.join(PROJ)} FROM lineitem WHERE {where}"
    problems = compare(got, con, oracle)
    assert not problems, f"WHERE {where}: {problems}"


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    by=st.sampled_from(sorted([*INT_COLS, *FLT_COLS, *STR_COLS])),
    desc=st.booleans(),
    k=st.integers(min_value=1, max_value=40),
)
def test_random_topk_matches_duckdb(lineitem, con, by, desc, k):
    """ORDER BY <random col> <dir> LIMIT <random k> — the reference's whole
    top-k grammar (sqlparse.go:223-265) — with the engine's deterministic
    tie-break, vs DuckDB's identical ordering."""
    from proteus_spark.operators import topk

    got = topk(lineitem, by=by, k=k, descending=desc, tiebreak=PROJ).select(*PROJ)
    direction = "DESC" if desc else "ASC"
    oracle = (
        f"SELECT {', '.join(PROJ)} FROM lineitem "
        f"ORDER BY {by} {direction}, l_orderkey ASC, l_linenumber ASC LIMIT {k}"
    )
    problems = compare(got, con, oracle)
    assert not problems, f"ORDER BY {by} {direction} LIMIT {k}: {problems}"
