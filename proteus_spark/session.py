"""SparkSession construction tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); the configuration is chosen so
the same code scales to a multi-executor cluster at ~100 TB:

- AQE on (runtime re-plan, skew-join handling, partition coalescing)
- shuffle partitions sized to the parallelism at hand (``cores`` locally;
  on a real cluster AQE's coalescing makes a generous initial number safe)
- Arrow enabled so the Pandas-UDF slow path is batch-vectorized
- UTC session timezone so results compare bit-for-bit with external oracles
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "proteus_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool = False,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores.

    ``rocksdb_state``: back Structured-Streaming state (windowed aggs,
    applyInPandasWithState operators, stream joins) with the RocksDB
    provider instead of the default in-JVM-heap HDFS-backed map. At 100 TB
    stream scale, keyed state outgrows executor heap; RocksDB spills to
    local SSD with incremental-checkpoint uploads. Off locally — tiny test
    states fit in heap and the JNI layer only adds latency.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet uses TIMESTAMP(NANOS); read as epoch-nanos
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("PROTEUS_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Broadcast threshold: dims (region/nation/customer/supplier/part at
        # test SFs) should broadcast; AQE upgrades joins at runtime too.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if rocksdb_state:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ).config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
