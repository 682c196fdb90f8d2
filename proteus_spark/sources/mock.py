"""Mock store — test fixture parity.

The reference's mock datastore serves 1000 synthetic objects with a single
int attribute ``attribute0`` uniform in [0, 100)
(internal/qpu_classes/datastore_driver/mock/store.go:36-55; schema
``ycsbbuck`` with attribute0:int in confs/dsdriver.toml). Ours derives the
attribute deterministically from the portable hash so every engine (and the
oracle) can regenerate the identical table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proteus_spark.functions.texthash import hex_to_long_sql, md5_seeded_sql


def mock_table(spark: SparkSession, n: int = 1000) -> DataFrame:
    """(object_id string, attribute0 int) — YCSB-style uniform [0,100)."""
    ids = spark.range(n).select(
        F.concat(F.lit("object"), F.col("id").cast("string")).alias("object_id")
    )
    hashed = ids.select(
        "object_id", F.expr(md5_seeded_sql("object_id", "mock")).alias("xh")
    )
    return hashed.select(
        "object_id",
        (F.expr(hex_to_long_sql("xh")) % 100).cast("int").alias("attribute0"),
    )


def mock_table_oracle_sql(n: int = 1000) -> str:
    """DuckDB CTE regenerating the identical mock table."""
    return f"""
    mock AS (
      SELECT object_id,
             CAST({hex_to_long_sql('xh')} % 100 AS INTEGER) AS attribute0
      FROM (SELECT 'object' || CAST(range AS VARCHAR) AS object_id,
                   {md5_seeded_sql("('object' || CAST(range AS VARCHAR))", 'mock')} AS xh
            FROM range({n})))
    """
