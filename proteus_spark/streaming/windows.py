"""Event-time windowed streaming aggregates with watermark-based late-data
policy.

The reference has NO late/out-of-order story: no watermarks, no event-time
windows, deltas applied in arrival order, and even its ordering hook is
"not yet implemented" (qpuapi.proto:113-116; races at
responseStream.go:51-64). SURVEY §2.9 marks this a Spark-native upgrade:
``withWatermark`` bounds how late an event may arrive (and therefore how
much window state the store retains — the 100 TB-scale requirement: state
is bounded by watermark horizon, not by stream length), and events older
than the watermark are dropped by policy instead of corrupting
already-emitted windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time window counts/sums with a late-data watermark.

    Update-mode semantics: each micro-batch emits the windows it changed;
    an event arriving later than ``watermark`` behind the max seen event
    time is DROPPED (never mutates a window again), so downstream consumers
    can treat emitted windows as monotonically refined and the state store
    evicts windows older than the horizon.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n",
            "value_sum",
        )
    )
