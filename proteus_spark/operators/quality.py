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


def skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Key-distribution skew diagnostic: the ``top_n`` heaviest keys with
    global distribution stats attached — (key, n, n_keys, max_n,
    total_rows, avg_n, skew_ratio).

    The pre-flight check before any large keyed join/agg: skew_ratio
    (max key count / mean key count) >> 1 says "salt this key or enable
    AQE skew handling". Two aggregations, both with map-side partial
    combine; the heavy-hitter pick is TakeOrderedAndProject (per-partition
    heaps, no global sort); the one-row stats frame joins in broadcast —
    nothing here funnels the per-key relation through a single task, so
    the diagnostic itself is safe to run on a 100 TB fact table."""
    per_key = df.groupBy(F.col(key).alias("key")).agg(
        F.count("*").cast("long").alias("n")
    )
    stats = per_key.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_n"),
        F.sum("n").cast("long").alias("total_rows"),
    )
    top = per_key.orderBy(F.desc("n"), F.asc("key")).limit(top_n)
    avg_n = F.col("total_rows").cast("double") / F.col("n_keys")
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("avg_n", F.round(avg_n, 6))
        .withColumn("skew_ratio", F.round(F.col("max_n") / avg_n, 6))
    )
