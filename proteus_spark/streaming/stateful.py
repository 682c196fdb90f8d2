"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's extension point for new stateful operator classes is the
compile-time Go interface ``QPUClass`` (internal/libqpu/types.go:39-46);
each implementation hand-rolls its state in process-local maps (e.g.
sum.go:49-59) updated record-at-a-time with no ordering guarantee
(responseStream.go:51-64). The Spark-native equivalent of "write a new
stateful QPU class" is a `groupBy(key).applyInPandasWithState` operator:
Spark's state store supplies partitioned, spillable, fault-tolerant
per-key state; the user supplies only the Arrow-batched transition
function.

Design rule for 100 TB streams: state must be BOUNDED per key and the
transition function must be ORDER-INSENSITIVE (micro-batch arrival order
is arbitrary across a repartitioned stream, exactly like the reference's
unordered apply). ``sessionize_stream`` demonstrates both: per-key state
is the set of merged session intervals (size = number of sessions, not
number of events), and interval-union is commutative — any arrival order
converges to the batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# Per-key state: parallel arrays of disjoint session intervals, each with
# its event count and value sum. Bounded by session count per key.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("vsums", ArrayType(DoubleType())),
    ]
)


def sessionize_stream(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_ns",
    value_col: str = "value",
    gap_ns: int = 30 * 60 * 1_000_000_000,
) -> DataFrame:
    """Stateful sessionization: 30-min-inactivity sessions maintained live.

    Each event is a point interval ``[ts, ts]``; intervals within
    ``gap_ns`` of each other chain into one session. The state-store entry
    per key is the current list of disjoint merged intervals with their
    event counts and value sums; every micro-batch folds its events in and
    emits the key's updated totals (update semantics — only changed keys
    emit, like the reference's per-delta group emission, sum.go:236-245).

    Interval union is commutative and associative, so the converged result
    is independent of how the stream was chunked or reordered — strictly
    stronger than the reference's arrival-order apply, and equal to the
    batch lag()-window sessionization of the same data.
    """

    # Closure (not module-level) so it pickles by value: executor workers
    # cannot import proteus_spark when the driver runs from a foreign cwd.
    # The merge is fully vectorized (sort + cummax gap-break + groupby):
    # the Arrow batch never degrades to a per-event Python loop.
    def _update(key_tuple, pdf_iter, state):
        import numpy as np
        import pandas as pd

        frames = [
            pd.DataFrame(
                {
                    "s": pdf[ts_col].astype("int64"),
                    "e": pdf[ts_col].astype("int64"),
                    "c": np.ones(len(pdf), dtype="int64"),
                    "v": pdf[value_col].astype("float64"),
                }
            )
            for pdf in pdf_iter
        ]
        if state.exists:
            starts, ends, counts, vsums = state.get
            frames.append(
                pd.DataFrame({"s": starts, "e": ends, "c": counts, "v": vsums})
            )
        iv = pd.concat(frames, ignore_index=True).sort_values(
            ["s", "e"], ignore_index=True
        )
        # an interval opens a new session iff its start exceeds the running
        # max end of everything before it by more than the gap
        prev_end_max = iv["e"].cummax().shift(1)
        new_sess = (iv["s"] - prev_end_max > gap_ns) | prev_end_max.isna()
        sess_id = new_sess.cumsum()
        merged = iv.groupby(sess_id).agg(
            s=("s", "min"), e=("e", "max"), c=("c", "sum"), v=("v", "sum")
        )

        state.update(
            (
                merged["s"].tolist(),
                merged["e"].tolist(),
                merged["c"].tolist(),
                merged["v"].tolist(),
            )
        )
        yield pd.DataFrame(
            {
                key: [key_tuple[0]],
                "n_sessions": [len(merged)],
                "n_events": [int(merged["c"].sum())],
                "value_sum": [float(merged["v"].sum())],
            }
        )

    # the key field mirrors the INPUT column (name + type): a hardcoded
    # name/type would mis-serialize any non-default key at the Arrow layer
    out_schema = StructType(
        [
            StructField(key, stream.schema[key].dataType),
            StructField("n_sessions", LongType()),
            StructField("n_events", LongType()),
            StructField("value_sum", DoubleType()),
        ]
    )
    return stream.groupBy(key).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    stream: "DataFrame",
    key: str = "text_hash",
    ttl_ms: int | None = None,
) -> "DataFrame":
    """Streaming ingest-dedup: the canonical training-data ingestion
    operator. The first record per content hash passes; re-occurrences
    are suppressed while the hash's state entry lives.

    ``ttl_ms`` bounds state size by recency at 100 TB ingest scale via a
    processing-time timeout — an expired hash re-admits, the standard
    horizon-dedup trade. ``None`` keeps hashes forever (exact dedup;
    state grows with distinct corpus size, which Spark's state store
    shards and spills, unlike the reference's in-process maps).

    Output: one row ``(key,)`` per first-seen hash. The OUTPUT SET is
    arrival-order independent (which physical row wins is not), so the
    converged result equals batch ``SELECT DISTINCT``.

    Note: Spark 4's second-gen API (``transformWithStateInPandas`` —
    named state vars, timers, native TTL) is the natural home for this
    operator, but its driver worker needs the ``google.protobuf`` wheel,
    absent in this environment; ``applyInPandasWithState`` expresses the
    same semantics with the timeout mechanism.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    # key field mirrors the input column's type (a BIGINT hash key would
    # fail Arrow serialization into a hardcoded StringType)
    out_schema = StructType([StructField(key, stream.schema[key].dataType)])
    state_schema = StructType([StructField("seen", StringType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    # Closure so it pickles by value (foreign-cwd executors cannot import
    # proteus_spark).
    def _update(key_tuple, pdf_iter, state):
        import pandas as pd

        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # horizon passed: forget the hash
            return
        for _ in pdf_iter:
            pass  # drain: content is irrelevant, the KEY is the content
        first = not state.exists
        if first:
            state.update(("1",))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # sliding horizon
        if first:
            yield pd.DataFrame({key: [key_tuple[0]]})

    return stream.groupBy(key).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
