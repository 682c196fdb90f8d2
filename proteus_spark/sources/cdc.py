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


@dataclass
class CDCSource:
    """Snapshot + subscribe over one parquet location (one 'bucket')."""

    spark: SparkSession
    path: str
    name: str
    _tmp: list[str] = field(default_factory=list)

    def snapshot(self) -> DataFrame:
        """STATE records: the full current state (GetSnapshot parity —
        datastore_driver/mysql/store.go:154-247; projection/predicate
        pushdown is Catalyst's job, not ours)."""
        return self.spark.read.parquet(self.path)

    def subscribe(self, max_files_per_trigger: int = 1) -> DataFrame:
        """UPDATEDELTA stream: files appearing under the location become
        micro-batches (SubscribeOps parity — mysql/store.go:117-151)."""
        schema = self.spark.read.parquet(self.path).schema
        return (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.path)
        )


def stage_stream(
    spark: SparkSession, df: DataFrame, chunks: int = 4, prefix: str = "proteus_cdc_"
) -> CDCSource:
    """Stage a batch DataFrame as ``chunks`` parquet files in a temp dir so
    a file stream replays it across multiple micro-batches — the test
    harness's CDC simulator. Caller (or View.stop) cleans up."""
    tmpdir = tempfile.mkdtemp(prefix=prefix)
    df.repartition(chunks).write.mode("overwrite").parquet(tmpdir)
    src = CDCSource(spark=spark, path=tmpdir, name=os.path.basename(tmpdir))
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
) -> DataFrame:
    """Shape an append stream into UPDATEDELTA old/new records
    (qpu.proto:17-29): rows matching ``update_when`` become updates
    (old = value, new = value * factor), the rest are inserts (old NULL).

    Used by tests/queries to exercise the reference's delta-application
    semantics (sum.go:250-285 applies new-minus-old per delta)."""
    if update_when is None:
        update_when = F.lit(False)
    old_v = F.when(update_when, F.col(value_col)).otherwise(F.lit(None).cast("double"))
    new_v = F.when(
        update_when, F.col(value_col) * F.lit(update_factor)
    ).otherwise(F.col(value_col))
    op = F.when(update_when, F.lit("UPDATEDELTA")).otherwise(F.lit("STATE"))
    return stream.select(
        *key_cols,
        op.alias("op_type"),
        old_v.alias("old_value"),
        new_v.alias("new_value"),
    )
