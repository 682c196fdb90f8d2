"""Local mirror of the driver's DuckDB-oracle comparison.

For each registered query: run the Spark callable and the oracle SQL over
the same sf dir, then compare row count, column-name set, and an
order-insensitive multiset of values with columns sorted by name — the same
shape as the driver's CORRECTNESS check.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return repr(v)


def compare(spark_df, con, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = list(spark_df.columns)

    rel = con.execute(oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    order = sorted(spark_cols)
    s_idx = [spark_cols.index(c) for c in order]
    d_idx = [duck_cols.index(c) for c in order]

    s_set = sorted(tuple(_norm(r[i]) for i in s_idx) for r in spark_rows)
    d_set = sorted(tuple(_norm(r[i]) for i in d_idx) for r in duck_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
        only_s = [r for r in s_set[:2000] if r not in set(d_set[:2000])][:3]
        problems.append(f"values differ; first pairwise diffs={diffs} spark-only sample={only_s}")
    return problems
