"""CDC / snapshot+subscribe sources.

Reference model: every record is a ``LogOperation{object_id, bucket,
timestamp, payload}`` where payload is either a full ``ObjectState``
(snapshot record, type STATE) or a ``StateDelta{old, new}`` (update record,
type UPDATEDELTA) — api/protobuf-spec/qpu.proto:8-29. A stateful operator
bootstraps with the composite query ``tsPredicate [LATEST, INF)`` = replay
snapshot, then stream deltas forever; END_OF_STREAM marks the boundary
(internal/queries/queries.go:81-116, qpuapi.proto:106-111).

Spark mapping: snapshot = batch read; subscribe = ``readStream`` over the
same location; the END_OF_STREAM marker = completion of the initial
micro-batch (``StreamingQuery.processAllAvailable`` after start). The
``CDCSource`` wrapper exposes both halves; ``stage_stream`` turns a batch
DataFrame into a multi-micro-batch file stream for tests (the moral
equivalent of the reference's mock store driving subscriptions).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def attach_source_ts(df: DataFrame, ts_col: str | None = None) -> DataFrame:
    """Attach the ``_ts`` metadata column — the Spark mapping of the
    reference's per-record Vectorclock (qpu.proto:97-99; SURVEY §1.5):
    the source-assigned timestamp as epoch-MICROS BIGINT (one scalar per
    record — the reference's vector has one entry per source bucket, and a
    single-source scan is exactly that).

    ``ts_col``: use the named event-time column. Default: the file
    source's modification time (``_metadata.file_modification_time``) —
    the ingestion clock, available on any file-based scan or stream."""
    src = F.col(ts_col) if ts_col else F.col("_metadata.file_modification_time")
    return df.withColumn("_ts", F.unix_micros(src.cast("timestamp")))


def attach_vectorclock(
    df: DataFrame, source_name: str, ts_col: str | None = None
) -> DataFrame:
    """Attach the MAP-form vector clock ``_vc`` — the reference's actual
    ``Vectorclock = map<string, Timestamp>`` (qpu.proto:97-99), one entry
    per source bucket. A single-source scan carries exactly one entry
    keyed by its own name; multi-source operators (join) merge entry-wise
    (``merge_vectorclocks``), which is precisely how the reference's
    clocks compose. ``_ts`` (attach_source_ts) is the scalar projection
    of this for single-source pipelines."""
    src = F.col(ts_col) if ts_col else F.col("_metadata.file_modification_time")
    return df.withColumn(
        "_vc",
        F.create_map(
            F.lit(source_name), F.unix_micros(src.cast("timestamp"))
        ),
    )


def merge_vectorclocks(a, b):
    """Entry-wise max of two ``_vc`` map columns (vector-clock join):
    keys present on one side only keep their value; shared keys take the
    max. NULL maps (outer-join missing side) fold as empty. Pure Catalyst
    map_zip_with — no UDF, codegen-safe at any scale."""
    empty = F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<bigint>"))
    return F.map_zip_with(
        F.coalesce(a, empty),
        F.coalesce(b, empty),
        lambda _k, v1, v2: F.greatest(
            F.coalesce(v1, F.lit(-(1 << 62))), F.coalesce(v2, F.lit(-(1 << 62)))
        ),
    )


@dataclass
class CDCSource:
    """Snapshot + subscribe over one parquet location (one 'bucket')."""

    spark: SparkSession
    path: str
    name: str
    _tmp: list[str] = field(default_factory=list)
    # schema recorded by the stager (metadata-only, optimization r16):
    # subscribe() otherwise pays a fresh listing + footer schema inference
    # per call — a real CDC source publishes its schema with the feed
    # (registry/schema registry), exactly this field.
    schema: object | None = None

    def snapshot(self, with_ts: bool = False) -> DataFrame:
        """STATE records: the full current state (GetSnapshot parity —
        datastore_driver/mysql/store.go:154-247; projection/predicate
        pushdown is Catalyst's job, not ours). ``with_ts`` attaches the
        ``_ts`` vector-clock column (file ingestion clock)."""
        df = self.spark.read.parquet(self.path)
        return attach_source_ts(df) if with_ts else df

    def subscribe(
        self, max_files_per_trigger: int = 1, with_ts: bool = False
    ) -> DataFrame:
        """UPDATEDELTA stream: files appearing under the location become
        micro-batches (SubscribeOps parity — mysql/store.go:117-151).
        ``with_ts`` stamps each record with its file's ingestion time —
        the per-record Vectorclock the reference ships on every
        LogOperation (qpu.proto:8-16)."""
        schema = self.schema
        if schema is None:
            schema = self.spark.read.parquet(self.path).schema
        df = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.path)
        )
        return attach_source_ts(df) if with_ts else df


def stage_stream(
    spark: SparkSession,
    df: DataFrame,
    chunks: int = 4,
    prefix: str = "proteus_cdc_",
    order_col: str | None = None,
) -> CDCSource:
    """Stage a batch DataFrame as ``chunks`` parquet files in a temp dir so
    a file stream replays it across multiple micro-batches — the test
    harness's CDC simulator. Caller (or View.stop) cleans up.

    ``order_col``: replay in that column's order — chunk i holds the i-th
    ntile, and files get strictly increasing mtimes so the file source
    triggers them in sequence. Event-time operators (watermarks,
    stream-stream interval joins) need this: a real CDC/notification feed
    is approximately time-ordered, and replaying random subsets would
    advance the watermark past data that 'arrives' later, dropping it by
    (correct) late-data policy."""
    if order_col is not None:
        from pyspark.sql.window import Window

        from proteus_spark.plans.ckpt import release

        # checkpoint the ntile'd frame ONCE (optimization r16, guide §1):
        # stage_files writes each chunk as its own filtered job, and
        # without the checkpoint every one of those jobs re-ran the
        # global-sort window over the full input — ``chunks`` full sorts
        # to stage one table. Released as soon as the files are on disk.
        chunked = df.withColumn(
            "_chunk", F.ntile(chunks).over(Window.orderBy(order_col))
        ).localCheckpoint(eager=False)
        try:
            return stage_files(
                spark,
                [
                    chunked.filter(F.col("_chunk") == i)
                    .drop("_chunk")
                    .coalesce(1)
                    for i in range(1, chunks + 1)
                ],
                prefix=prefix,
            )
        finally:
            release(chunked)
    tmpdir = tempfile.mkdtemp(prefix=prefix)
    df.repartition(chunks).write.mode("overwrite").parquet(tmpdir)
    src = CDCSource(
        spark=spark,
        path=tmpdir,
        name=os.path.basename(tmpdir),
        schema=df.schema,
    )
    src._tmp.append(tmpdir)
    return src


def stage_files(
    spark: SparkSession,
    frames: list[DataFrame],
    prefix: str = "proteus_cdc_",
) -> CDCSource:
    """Stage an EXPLICIT ordered list of DataFrames as parquet files whose
    mtimes strictly increase in list order, so a mtime-ordered file source
    replays all of frame i's files before any of frame i+1's. This is the
    reusable form of 'tombstone-last' staging: callers that need an
    ordering invariant (e.g. DELETE records must land after the inserts
    they kill) pass the delete frame last and subscribe with
    ``max_files_per_trigger=1``. Caller (or cleanup) removes the dir."""
    import time

    tmpdir = tempfile.mkdtemp(prefix=prefix)
    scratch = tempfile.mkdtemp(prefix=prefix + "scratch_")
    now = time.time()
    for i, frame in enumerate(frames, start=1):
        cdir = os.path.join(scratch, f"c{i}")
        frame.write.parquet(cdir)
        for j, f in enumerate(sorted(os.listdir(cdir))):
            if f.endswith(".parquet"):
                dst = os.path.join(tmpdir, f"{i:04d}_{j}.parquet")
                shutil.move(os.path.join(cdir, f), dst)
                os.utime(dst, (now + i, now + i))
    shutil.rmtree(scratch, ignore_errors=True)
    src = CDCSource(
        spark=spark,
        path=tmpdir,
        name=os.path.basename(tmpdir),
        schema=frames[0].schema if frames else None,
    )
    src._tmp.append(tmpdir)
    return src


def cleanup(src: CDCSource) -> None:
    for d in src._tmp:
        shutil.rmtree(d, ignore_errors=True)


def as_update_deltas(
    stream: DataFrame,
    key_cols: list[str],
    value_col: str,
    update_when=None,
    update_factor: float = 1.5,
    delete_when=None,
) -> DataFrame:
    """Shape an append stream into UPDATEDELTA old/new records
    (qpu.proto:17-29): rows matching ``update_when`` become updates
    (old = value, new = value * factor), rows matching ``delete_when``
    become an insert FOLLOWED BY a DELETE tombstone (old = value, new
    NULL — the object existed, then was removed; qpu.proto's StateDelta
    with an absent new image), and the rest are inserts (old NULL).

    Used by tests/queries to exercise the reference's delta-application
    semantics (sum.go:250-285 applies new-minus-old per delta; a DELETE
    therefore contributes -old — the generalization the reference's sum
    QPU never shipped)."""
    if update_when is None:
        update_when = F.lit(False)
    ins = F.struct(
        F.lit("STATE").alias("op_type"),
        F.lit(None).cast("double").alias("old_value"),
        F.col(value_col).cast("double").alias("new_value"),
    )
    upd = F.struct(
        F.lit("UPDATEDELTA").alias("op_type"),
        F.col(value_col).cast("double").alias("old_value"),
        (F.col(value_col) * F.lit(update_factor)).alias("new_value"),
    )
    tomb = F.struct(
        F.lit("DELETE").alias("op_type"),
        F.col(value_col).cast("double").alias("old_value"),
        F.lit(None).cast("double").alias("new_value"),
    )
    deltas = F.when(update_when, F.array(upd)).otherwise(F.array(ins))
    if delete_when is not None:
        deltas = F.when(delete_when, F.array(ins, tomb)).otherwise(deltas)
    return stream.select(
        *key_cols, F.explode(deltas).alias("_d")
    ).select(*key_cols, "_d.op_type", "_d.old_value", "_d.new_value")
