"""Materialized-view runners — the Spark re-expression of stateful QPUs.

Reference lifecycle (internal/qpu.go:33-75, sum.go:90-103, join.go:111-143):
a stateful QPU subscribes to its upstream with snapshot+subscribe, replays
STATE records into memory, flushes on END_OF_STREAM (catch-up), then applies
UPDATEDELTA records forever, pushing notifications to subscribers; clients
query the materialized state table.

Spark shape used here:

- one Structured-Streaming query per view; Spark's state store replaces the
  reference's hand-rolled in-process maps (sum.go:49-59) — partitioned,
  spillable, fault-tolerant;
- ``foreachBatch`` commits each micro-batch's changed groups into a
  VERSIONED parquet state table (v0, v1, ...) — a poor-man's Delta MERGE
  (SURVEY §7.3: on a real deployment this is a Delta/Iceberg MERGE INTO;
  versioning doubles as the freshness-in-versions metric the reference
  logs, metrics.go:103-214);
- catch-up gate = the initial load completing (processAllAvailable after
  start), mirroring the serve-gate at qpu.go:72-75;
- downstream views (the QPU DAG) recompute from the committed state inside
  the same batch hook — e.g. join+top-k over the sum state — because Spark
  forbids joins after streaming aggregations in one query, and the
  reference's own DAG has exactly this batch-per-delta cadence;
- subscriber callbacks receive (delta DataFrame, epoch) — QuerySubscribe
  parity (apiprocessor.go:248-305) with the same weak ordering guarantees
  the reference has (responseStream.go:51-64 races; we are strictly more
  ordered: per-epoch).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SumView:
    """Streaming GROUP-BY-SUM materialized view (SumQPU parity, SURVEY §2.4).

    Two input shapes:

    - mode='append': plain insert stream; Spark's streaming aggregation
      (update output mode) maintains running totals in the state store and
      emits only changed groups per batch — exactly the incremental
      semantics of sum.go:250-285, minus the races.
    - mode='cdc': UPDATEDELTA records (old_value/new_value); each batch's
      per-group contribution = sum(new - coalesce(old, 0)) is added to the
      state table (delta application parity, sum.go:250-285).

    Output column is ``<attr>_sum`` (sum.go:158-160).
    """

    def __init__(
        self,
        spark: SparkSession,
        stream: DataFrame,
        group_by: str,
        agg_attr: str = "new_value",
        name: str = "sum_view",
        mode: str = "append",
        derived: dict[str, Callable[[DataFrame], DataFrame]] | None = None,
    ):
        self.spark = spark
        self.name = name
        self.group_by = group_by
        self.agg_attr = agg_attr
        self.sum_col = f"{agg_attr}_sum"
        self.mode = mode
        self.derived = derived or {}
        self._stream = stream
        self._root = tempfile.mkdtemp(prefix=f"proteus_view_{name}_")
        self._ckpt = os.path.join(self._root, "_checkpoint")
        self._version = -1
        self._derived_version: dict[str, int] = {}
        self._subscribers: list[Callable[[DataFrame, int], None]] = []
        self._catch_up = threading.Event()
        self._query = None

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "SumView":
        if self.mode == "append":
            agg = self._stream.groupBy(self.group_by).agg(
                F.sum(self.agg_attr).alias(self.sum_col)
            )
            writer = agg.writeStream.outputMode("update").foreachBatch(
                self._on_changed_groups
            )
        elif self.mode == "cdc":
            writer = self._stream.writeStream.outputMode("append").foreachBatch(
                self._on_cdc_batch
            )
        else:
            raise ValueError(f"unknown mode {self.mode!r}")
        self._query = (
            writer.option("checkpointLocation", self._ckpt)
            .queryName(self.name)
            .start()
        )
        return self

    def await_catch_up(self) -> "SumView":
        """Serve-gate parity (qpu.go:72-75): block until the snapshot replay
        (all currently-available input) is committed."""
        self._query.processAllAvailable()
        self._catch_up.set()
        return self

    def stop(self, cleanup: bool = True) -> None:
        if self._query is not None:
            self._query.stop()
        if cleanup:
            shutil.rmtree(self._root, ignore_errors=True)

    # -- state maintenance ---------------------------------------------------
    def _state_path(self, v: int) -> str:
        return os.path.join(self._root, f"state_v{v}")

    def _on_changed_groups(self, batch: DataFrame, epoch: int) -> None:
        """update-mode aggregation hands us the changed groups with their
        NEW totals (state store did the math) -> MERGE = replace keys."""
        self._merge(batch, replace=True, epoch=epoch)

    def _on_cdc_batch(self, batch: DataFrame, epoch: int) -> None:
        """raw UPDATEDELTA rows -> per-group contribution -> MERGE-add."""
        contrib = batch.groupBy(self.group_by).agg(
            F.sum(
                F.coalesce(F.col("new_value"), F.lit(0.0))
                - F.coalesce(F.col("old_value"), F.lit(0.0))
            ).alias(self.sum_col)
        )
        self._merge(contrib, replace=False, epoch=epoch)

    def _merge(self, delta: DataFrame, replace: bool, epoch: int) -> None:
        prev = self.snapshot()
        if prev is None:
            merged = delta
        elif replace:
            merged = prev.join(
                delta, self.group_by, "left_anti"
            ).unionByName(delta)
        else:
            p = prev.withColumnRenamed(self.sum_col, "_prev")
            d = delta.withColumnRenamed(self.sum_col, "_delta")
            merged = p.join(d, self.group_by, "full_outer").select(
                self.group_by,
                (
                    F.coalesce(F.col("_prev"), F.lit(0.0))
                    + F.coalesce(F.col("_delta"), F.lit(0.0))
                ).alias(self.sum_col),
            )
        v = self._version + 1
        merged.write.mode("overwrite").parquet(self._state_path(v))
        self._version = v

        # downstream QPUs: recompute derived views over the committed state
        state = self.snapshot()
        for name, fn in self.derived.items():
            out = fn(state)
            dv = self._derived_version.get(name, -1) + 1
            out.write.mode("overwrite").parquet(
                os.path.join(self._root, f"{name}_v{dv}")
            )
            self._derived_version[name] = dv

        for cb in list(self._subscribers):
            try:
                cb(delta, epoch)
            except Exception:  # subscriber errors must not kill the view
                pass

    # -- query surface -------------------------------------------------------
    def snapshot(self) -> DataFrame | None:
        """Current materialized state (ClientQuery parity: queries answer
        from local state, sum.go:149-180)."""
        if self._version < 0:
            return None
        return self.spark.read.parquet(self._state_path(self._version))

    def snapshot_derived(self, name: str) -> DataFrame | None:
        dv = self._derived_version.get(name, -1)
        if dv < 0:
            return None
        return self.spark.read.parquet(os.path.join(self._root, f"{name}_v{dv}"))

    def subscribe(self, cb: Callable[[DataFrame, int], None]) -> None:
        """QuerySubscribe parity: cb(delta_df, epoch) per micro-batch."""
        self._subscribers.append(cb)

    def version(self) -> int:
        """Freshness-in-versions handle (metrics.go:103-214)."""
        return self._version
