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

# Measured (Spark 4.1): the watermark computed from batch B's event-time
# stats is first APPLIED as the late filter in batch B+2 — batch B+1 is
# planned before B's stats commit. This is a Spark-runtime internal, so it
# lives in exactly one place: the stream_windowed_watermark DuckDB oracle
# and the cross-replay property test
# (tests/test_streaming.py::test_watermark_lag_model_holds_across_replays)
# both derive their window frame from this constant. Re-validate on any
# Spark version bump — the property test fails first if the lag changes.
WATERMARK_APPLY_LAG_BATCHES = 2


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


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream event-time interval join: pair each left event with
    the right events of the same ``key`` whose timestamp falls in
    [left.ts + lower, left.ts + upper].

    Another Spark-native upgrade the reference cannot express (its
    JoinQPU is a keyed coalesce of CURRENT attribute values — join.go:
    352-379 — not a temporal correlation of event streams). Both sides
    carry watermarks, so Spark bounds the join state to the watermark
    horizon plus the interval width: at 100 TB stream length, state is
    O(horizon x rate), not O(stream). Append-mode output — a pair emits
    exactly once, when both sides are past the watermark.
    """
    lt = left.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, ts_col)],
    ).withWatermark("l_ts", watermark)
    rt = right.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, ts_col)],
    ).withWatermark("r_ts", watermark)
    return lt.join(
        rt,
        F.expr(
            f"l_key = r_key AND r_ts >= l_ts + INTERVAL {lower} "
            f"AND r_ts <= l_ts + INTERVAL {upper}"
        ),
    )
