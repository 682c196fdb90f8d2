"""Bucketed (co-located) join materialization — shuffle elimination.

The reference's answer to join locality is config-time sharding: two index
QPUs over hand-chosen key ranges behind a router (SURVEY §2.7,
confs/index0.toml [0,50) / index1.toml [50,100)). The Spark-native answer
is BUCKETING: persist both join sides hash-partitioned AND sorted by the
join key into the same number of buckets; every future equi-join on that
key then reads co-located buckets and the Exchange (and usually the Sort)
disappears from the plan.

At 100 TB this is the difference between re-shuffling hundreds of TB per
join and a map-side merge: pay one write-time shuffle, amortize it over
every downstream join/aggregation on the same key. The same trade the
reference makes by wiring state tables per join key — but here the
optimizer proves it per-plan instead of trusting the topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> DataFrame:
    """Persist ``df`` as a bucketed (+sorted) table and return the
    re-loaded handle. Joins between tables bucketed on the same key with
    the same bucket count skip the exchange (verified by
    tests/test_plans.py::test_bucketed_join_has_no_exchange)."""
    spark = df.sparkSession
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)
    return spark.table(name)


def drop_bucketed(spark: SparkSession, *names: str) -> None:
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
