"""Declarative data-quality constraint checking.

A lakehouse-ingest engine needs an expectations gate (the deequ /
dbt-test role): declare per-table constraints, get one violations row per
rule. The reference has no analogue — its schema contract is the TOML
type declaration (config.go:25-35) with string↔value coercion errors at
read time; this generalizes that contract to value-level rules.

Scale shape: ALL rules evaluate in ONE aggregation pass over the table
(count-if per rule, map-side combined; uniqueness adds a count_distinct
to the same pass). The wide 1-row result is then unpivoted driver-free
via ``stack`` — no per-rule scans, no driver loop. At 100 TB the cost is
one scan regardless of rule count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple:
    return ("not_null", col)


def unique(col: str) -> tuple:
    return ("unique", col)


def in_range(col: str, lo, hi) -> tuple:
    """Value in [lo, hi) — the engine's RANGE convention (lb incl, ub
    excl); NULL counts as a violation (absent attribute fails every
    non-ISNULL predicate, queries.go:167-209)."""
    return ("in_range", col, lo, hi)


def satisfies(sql: str) -> tuple:
    """Arbitrary boolean SQL expression; rows where it is not TRUE
    (false OR null) violate."""
    return ("expr", sql)


def _name(c: tuple) -> str:
    if c[0] == "in_range":
        return f"in_range({c[1]}, {c[2]}, {c[3]})"
    if c[0] == "expr":
        return f"satisfies({c[1]})"
    return f"{c[0]}({c[1]})"


def check_constraints(df: DataFrame, constraints: list[tuple]) -> DataFrame:
    """One row per rule: (rule, violations, n_rows, passed)."""
    cols = [F.count("*").cast("long").alias("_n")]
    for i, c in enumerate(constraints):
        kind = c[0]
        if kind == "not_null":
            e = F.count(F.when(F.col(c[1]).isNull(), 1))
        elif kind == "unique":
            e = F.count("*") - F.count_distinct(F.col(c[1]))
        elif kind == "in_range":
            col, lo, hi = c[1], c[2], c[3]
            ok = (F.col(col) >= F.lit(lo)) & (F.col(col) < F.lit(hi))
            e = F.count(F.when(~ok | F.col(col).isNull(), 1))
        elif kind == "expr":
            e = F.count(F.when(~F.expr(c[1]) | F.expr(c[1]).isNull(), 1))
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
        cols.append(e.cast("long").alias(f"_v{i}"))
    wide = df.agg(*cols)
    pairs = ", ".join(
        "'{}', _v{}".format(_name(c).replace("'", "\\'"), i)
        for i, c in enumerate(constraints)
    )
    return wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(f"stack({len(constraints)}, {pairs}) AS (rule, violations)"),
    ).select(
        "rule",
        "violations",
        "n_rows",
        (F.col("violations") == 0).cast("integer").alias("passed"),
    )
