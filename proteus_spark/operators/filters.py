"""Predicate operators with the reference's exact semantics.

The reference evaluates queries as a conjunction of attribute predicates
(``repeated AttributePredicate`` — implicit AND; reference:
internal/queries/queries.go:159-213):

- EQ        — encoded as a degenerate range lbound == ubound
              (internal/sqlparser/sqlparse.go:444-465)
- RANGE     — lower bound INCLUSIVE, upper bound EXCLUSIVE
              (internal/queries/queries.go:183-209)
- ISNULL / ISNOTNULL — "null" means the attribute is ABSENT from the
              object's attribute map (queries.go:167-174); maps to SQL NULL
              on a nullable column.

Deliberate deviations (documented per SURVEY §7.4):

- The reference compares floats with a 1e-6 tolerance
  (internal/libqpu/utils/utils.go:75-96). We use exact comparison in the
  engine (Catalyst semantics) and expose ``approx_eq`` for callers that want
  the reference's tolerance.
- The reference rejects OR / parentheses (sqlparse.go:340-353); we accept
  arbitrary boolean expressions — a strict superset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FLOAT_TOLERANCE = 1e-6  # reference: internal/libqpu/utils/utils.go:79-89


def eq(col: str, value) -> Column:
    """EQ predicate (lbound == ubound degenerate range; sqlparse.go:444-465)."""
    return F.col(col) == F.lit(value)


def approx_eq(col: str, value: float, tol: float = FLOAT_TOLERANCE) -> Column:
    """Reference float equality: |a-b| < 1e-6 (utils.go:79-89)."""
    return F.abs(F.col(col) - F.lit(value)) < F.lit(tol)


def range_pred(col: str, lbound=None, ubound=None) -> Column:
    """RANGE predicate: lbound inclusive, ubound exclusive
    (queries.go:183-209). Either bound may be open (None)."""
    conds = []
    if lbound is not None:
        conds.append(F.col(col) >= F.lit(lbound))
    if ubound is not None:
        conds.append(F.col(col) < F.lit(ubound))
    if not conds:
        # an unbounded RANGE still requires the attribute to be PRESENT:
        # the reference looks the attribute up before comparing and an
        # absent attribute fails every non-ISNULL predicate
        # (queries.go:167-209) — lit(True) would wrongly pass NULL rows
        return F.col(col).isNotNull()
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def is_null(col: str) -> Column:
    """ISNULL: attribute absent from the object map (queries.go:167-174)."""
    return F.col(col).isNull()


def is_not_null(col: str) -> Column:
    """ISNOTNULL (queries.go:159-166; pushed to scan in the reference at
    mysql/store.go:167-177 — Catalyst pushes ours to the parquet scan)."""
    return F.col(col).isNotNull()


def and_all(preds: list[Column]) -> Column:
    """Conjunction of predicates — the only combinator the reference supports
    (queries.go:160-211)."""
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def apply_predicates(df: DataFrame, preds: list[Column]) -> DataFrame:
    """The reference re-checks every record flowing to a client against the
    query predicate (apiprocessor.go:133-137). Declared once here, Catalyst
    pushes it down to the scan instead of re-evaluating per record."""
    return df.filter(and_all(preds))
