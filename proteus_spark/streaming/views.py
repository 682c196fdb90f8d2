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
  HASH-BUCKET-PARTITIONED incremental state table (``_BucketedState``):
  only buckets containing changed keys are rewritten, so per-batch write
  cost is O(|delta| + |touched-bucket state|), NOT O(|all state|) — the
  Spark analogue of the reference's per-row UPSERT sink
  (internal/qpustate/mysql_backend/mysql_backend.go:147-254), and exactly
  the contract a Delta/Iceberg ``MERGE INTO`` over a key-partitioned table
  gives at deployment scale. Version retention is bounded (last
  ``retain``); manifests map bucket -> holding version, which doubles as
  the freshness-in-versions metric the reference logs (metrics.go:103-214);
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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class _BucketedState:
    """Hash-bucket-partitioned incremental state table.

    Layout: ``root/state_v{n}/_bucket={b}/*.parquet`` written with
    ``partitionBy`` — one commit writes ONLY the buckets containing changed
    keys (parquet dirs for untouched buckets are not re-created). A
    per-version manifest maps bucket -> the version dir holding that
    bucket's latest rows; a snapshot is the union read of the latest
    per-bucket paths (directory-pruned by construction). Version dirs no
    retained manifest references are deleted, bounding disk to
    O(|state| + retain * |recent deltas|) instead of growing a full copy
    per micro-batch.

    At a real deployment this is precisely a Delta/Iceberg table
    partitioned by key-hash with MERGE INTO + VACUUM; the manifest list is
    the table's version log (time travel = ``snapshot_at``). Implemented
    over plain parquet because the sandbox ships no lakehouse jars — the
    contract (O(delta) maintenance, bounded retention, versioned reads) is
    the part that matters at 100 TB.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key: str,
        n_buckets: int = 32,
        retain: int = 8,
    ):
        self.spark = spark
        self.root = root
        self.key = key
        self.n_buckets = n_buckets
        self.retain = retain
        # manifest per version: {bucket: version dir holding its data};
        # kept for ALL versions (a few ints each) — files are what get
        # evicted, so snapshot_at past the retention window raises.
        self.manifests: list[dict[int, int]] = []
        self.schema: T.StructType | None = None  # logical schema (no _bucket)

    # -- addressing --------------------------------------------------------
    @property
    def version(self) -> int:
        return len(self.manifests) - 1

    def bucket_col(self) -> Column:
        """Deterministic key -> bucket expression (JVM-side xxhash64)."""
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets)).cast(
            "int"
        )

    def _vdir(self, v: int) -> str:
        return os.path.join(self.root, f"state_v{v}")

    def _paths(self, version: int, buckets: list[int] | None) -> list[str]:
        m = self.manifests[version]
        items = (
            m.items()
            if buckets is None
            else [(b, m[b]) for b in buckets if b in m]
        )
        return [
            os.path.join(self._vdir(v), f"_bucket={b}") for b, v in items
        ]

    # -- reads -------------------------------------------------------------
    def read(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame | None:
        """Union read of the latest (or ``version``-pinned) per-bucket
        paths; ``buckets`` prunes to the named buckets. None = no rows."""
        if version is None:
            version = self.version
        if version < 0:
            return None
        lo = len(self.manifests) - self.retain
        if version < lo:
            raise ValueError(
                f"version {version} evicted (retention keeps >= {lo})"
            )
        paths = self._paths(version, buckets)
        if not paths:
            if self.schema is not None:
                return self.spark.createDataFrame([], self.schema)
            return None
        return self.spark.read.parquet(*paths)

    # -- writes ------------------------------------------------------------
    def commit(self, merged: DataFrame | None, touched: list[int]) -> int:
        """Write ``merged`` (rows for the touched buckets, WITH a
        ``_bucket`` column) as the next version; untouched buckets keep
        their existing manifest pointers. Empty-delta batches bump the
        version with a copied manifest and write nothing."""
        v = len(self.manifests)
        written: set[int] = set()
        if merged is not None and touched:
            par = self.spark.sparkContext.defaultParallelism
            (
                merged.repartition(min(len(touched), par), "_bucket")
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(self._vdir(v))
            )
            if self.schema is None:
                self.schema = T.StructType(
                    [f for f in merged.schema.fields if f.name != "_bucket"]
                )
            written = {
                b
                for b in touched
                if os.path.isdir(os.path.join(self._vdir(v), f"_bucket={b}"))
            }
        m = dict(self.manifests[-1]) if self.manifests else {}
        for b in touched:
            if b in written:
                m[b] = v
            else:
                # every key in the bucket was deleted this batch: the new
                # version has no dir for it, and pointing at the OLD dir
                # would resurrect the deleted keys — drop the bucket
                m.pop(b, None)
        self.manifests.append(m)
        self._evict()
        return v

    def _evict(self) -> None:
        keep_from = max(0, len(self.manifests) - self.retain)
        referenced: set[int] = set()
        for m in self.manifests[keep_from:]:
            referenced.update(m.values())
        for v in range(keep_from):
            if v not in referenced:
                shutil.rmtree(self._vdir(v), ignore_errors=True)


class SumView:
    """Streaming GROUP-BY-SUM materialized view (SumQPU parity, SURVEY §2.4).

    Two input shapes:

    - mode='append': plain insert stream; Spark's streaming aggregation
      (update output mode) maintains running totals in the state store and
      emits only changed groups per batch — exactly the incremental
      semantics of sum.go:250-285, minus the races.
    - mode='cdc': UPDATEDELTA records (old_value/new_value); each batch's
      per-group contribution = sum(coalesce(new,0) - coalesce(old,0)) is
      added to the state table (delta application parity, sum.go:250-285).
      DELETE records (old image, no new) therefore subtract — the
      generalization the reference's sum QPU never shipped.

    Output column is ``<attr>_sum`` (sum.go:158-160). State maintenance is
    O(|delta| + |touched buckets|) per batch via ``_BucketedState``.
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
        n_buckets: int = 32,
        retain: int = 8,
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
        self._state = _BucketedState(
            spark, self._root, key=group_by, n_buckets=n_buckets, retain=retain
        )
        self._retain = retain
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
    def _on_changed_groups(self, batch: DataFrame, epoch: int) -> None:
        """update-mode aggregation hands us the changed groups with their
        NEW totals (state store did the math) -> MERGE = replace keys."""
        self._merge(batch, replace=True, epoch=epoch)

    def _on_cdc_batch(self, batch: DataFrame, epoch: int) -> None:
        """raw UPDATEDELTA rows -> per-group contribution -> MERGE-add.
        DELETEs (new_value NULL, old_value set) contribute -old. An input
        ``_ts`` vector-clock column (see sources.cdc.attach_source_ts)
        carries through as the group's freshness: max over applied deltas
        (the reference folds per-record Vectorclocks the same way when it
        stamps state rows, qpu.proto:97-99)."""
        aggs = [
            F.sum(
                F.coalesce(F.col("new_value"), F.lit(0.0))
                - F.coalesce(F.col("old_value"), F.lit(0.0))
            ).alias(self.sum_col)
        ]
        if "_ts" in batch.columns:
            aggs.append(F.max("_ts").alias("_ts"))
        contrib = batch.groupBy(self.group_by).agg(*aggs)
        self._merge(contrib, replace=False, epoch=epoch)

    def _merge(self, delta: DataFrame, replace: bool, epoch: int) -> None:
        key = self.group_by
        delta = delta.withColumn("_bucket", self._state.bucket_col()).persist()
        try:
            # bounded driver probe: <= n_buckets ints, never row data
            touched = [
                r[0] for r in delta.select("_bucket").distinct().collect()
            ]
            d = delta.drop("_bucket")
            # prev = ONLY the buckets this delta touches (pruned read);
            # untouched buckets keep their manifest pointers untouched
            prev = (
                self._state.read(buckets=touched) if touched else None
            )
            has_ts = "_ts" in d.columns
            if prev is None or not touched:
                merged = d
            elif replace:
                merged = prev.join(d, key, "left_anti").unionByName(d)
            else:
                p = prev.withColumnRenamed(self.sum_col, "_prev")
                dd = d.withColumnRenamed(self.sum_col, "_delta")
                if has_ts:
                    p = p.withColumnRenamed("_ts", "_pts")
                    dd = dd.withColumnRenamed("_ts", "_dts")
                sel = [
                    F.col(key),
                    (
                        F.coalesce(F.col("_prev"), F.lit(0.0))
                        + F.coalesce(F.col("_delta"), F.lit(0.0))
                    ).alias(self.sum_col),
                ]
                if has_ts:
                    # greatest skips NULLs: a group untouched this batch
                    # keeps its previous clock
                    sel.append(
                        F.greatest(F.col("_pts"), F.col("_dts")).alias("_ts")
                    )
                merged = p.join(dd, key, "full_outer").select(*sel)
            merged = merged.withColumn("_bucket", self._state.bucket_col())
            self._state.commit(merged if touched else None, touched)
        finally:
            delta.unpersist()

        # downstream QPUs: recompute derived views over the committed state
        state = self.snapshot()
        for name, fn in self.derived.items():
            out = fn(state)
            dv = self._derived_version.get(name, -1) + 1
            out.write.mode("overwrite").parquet(
                os.path.join(self._root, f"{name}_v{dv}")
            )
            self._derived_version[name] = dv
            old = dv - self._retain
            if old >= 0:
                shutil.rmtree(
                    os.path.join(self._root, f"{name}_v{old}"),
                    ignore_errors=True,
                )

        for cb in list(self._subscribers):
            try:
                cb(delta.drop("_bucket"), epoch)
            except Exception:  # subscriber errors must not kill the view
                pass

    # -- query surface -------------------------------------------------------
    def snapshot(self) -> DataFrame | None:
        """Current materialized state (ClientQuery parity: queries answer
        from local state, sum.go:149-180)."""
        return self._state.read()

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
        return self._state.version

    def snapshot_at(self, version: int) -> DataFrame:
        """Time-travel read of an earlier state version — the VECTORCLOCK
        tsPredicate bound the reference declares but never implemented
        (qpu.proto:74-95; SURVEY §2.9 maps it to table time travel).
        Versions inside the retention window remain readable; older ones
        are vacuumed (ValueError)."""
        if not 0 <= version <= self._state.version:
            raise ValueError(
                f"version {version} out of range [0, {self._state.version}]"
            )
        df = self._state.read(version=version)
        if df is None:
            raise ValueError(f"version {version} has no committed state")
        return df


class JoinView:
    """Streaming keyed-merge JOIN view (JoinQPU parity, SURVEY §2.3).

    Reference semantics (join.go:302-350,352-379,393-456): exactly two
    input streams; one merged row per join-key value; arriving attributes
    OVERWRITE that key's row (last-writer-wins, no ordering guarantee);
    attributes the other side hasn't supplied yet sit at their default
    (0 for numerics — join.go:414-423). This is a keyed coalesce, not a
    relational join — a key present on either side produces a row.

    Spark shape: the two streams are tagged and unioned by name (missing
    columns -> NULL), so ONE streaming query maintains the state — no
    cross-stream race, strictly stronger than the reference's
    goroutine-per-record apply. Each micro-batch collapses to one row per
    key (last non-null value per column), then MERGEs into the bucketed
    state table with per-column coalesce(batch, state, default) — only
    buckets containing arrived keys rewrite (O(delta) maintenance, the
    MERGE INTO contract; see ``_BucketedState``).
    """

    def __init__(
        self,
        spark: SparkSession,
        left: DataFrame,
        right: DataFrame,
        key: str,
        name: str = "join_view",
        defaults: dict[str, float] | None = None,
        n_buckets: int = 32,
        retain: int = 8,
    ):
        self.spark = spark
        self.name = name
        self.key = key
        self.defaults = defaults or {}
        self._stream = left.unionByName(right, allowMissingColumns=True)
        self._root = tempfile.mkdtemp(prefix=f"proteus_view_{name}_")
        self._ckpt = os.path.join(self._root, "_checkpoint")
        self._state = _BucketedState(
            spark, self._root, key=key, n_buckets=n_buckets, retain=retain
        )
        self._subscribers: list[Callable[[DataFrame, int], None]] = []
        self._query = None

    def start(self) -> "JoinView":
        self._query = (
            self._stream.writeStream.outputMode("append")
            .foreachBatch(self._on_batch)
            .option("checkpointLocation", self._ckpt)
            .queryName(self.name)
            .start()
        )
        return self

    def await_catch_up(self) -> "JoinView":
        """Serve-gate parity (qpu.go:72-75)."""
        self._query.processAllAvailable()
        return self

    def stop(self, cleanup: bool = True) -> None:
        if self._query is not None:
            self._query.stop()
        if cleanup:
            shutil.rmtree(self._root, ignore_errors=True)

    # -- state maintenance -------------------------------------------------
    def _on_batch(self, batch: DataFrame, epoch: int) -> None:
        has_op = "_op" in batch.columns
        cols = [c for c in batch.columns if c not in (self.key, "_op")]
        # collapse the batch: one row per key, last non-null per attribute
        # (arrival order within a batch is arbitrary — matching the
        # reference's unordered apply, join.go:352-379); the optional
        # ``_op`` column marks DELETE tombstones — a key whose last record
        # in the batch is a DELETE is removed from state
        aggs = [F.last(c, ignorenulls=True).alias(c) for c in cols]
        if has_op:
            aggs.append(F.last("_op", ignorenulls=False).alias("_op"))
        delta = (
            batch.groupBy(self.key)
            .agg(*aggs)
            .withColumn("_bucket", self._state.bucket_col())
            .persist()
        )
        try:
            touched = [
                r[0] for r in delta.select("_bucket").distinct().collect()
            ]
            d0 = delta.drop("_bucket")
            deleted = None
            if has_op:
                deleted = d0.filter(F.col("_op") == "DELETE").select(self.key)
                d0 = d0.drop("_op")
            prev = self._state.read(buckets=touched) if touched else None
            if prev is None or not touched:
                merged = d0.select(
                    self.key,
                    *[
                        F.coalesce(F.col(c), F.lit(self.defaults.get(c))).alias(c)
                        if c in self.defaults
                        else F.col(c)
                        for c in cols
                    ],
                )
            else:
                d = d0.select(
                    F.col(self.key),
                    *[F.col(c).alias(f"_d_{c}") for c in cols],
                )
                merged = prev.join(d, self.key, "full_outer").select(
                    self.key,
                    *[
                        F.coalesce(
                            F.col(f"_d_{c}"),
                            F.col(c),
                            F.lit(self.defaults.get(c)),
                        ).alias(c)
                        for c in cols
                    ],
                )
            if deleted is not None:
                merged = merged.join(deleted, self.key, "left_anti")
            merged = merged.withColumn("_bucket", self._state.bucket_col())
            self._state.commit(merged if touched else None, touched)
        finally:
            delta.unpersist()
        for cb in list(self._subscribers):
            try:
                cb(delta.drop("_bucket"), epoch)
            except Exception:  # subscriber errors must not kill the view
                pass

    # -- query surface -----------------------------------------------------
    def snapshot(self) -> DataFrame | None:
        return self._state.read()

    def subscribe(self, cb: Callable[[DataFrame, int], None]) -> None:
        self._subscribers.append(cb)

    def version(self) -> int:
        return self._state.version

    def snapshot_at(self, version: int) -> DataFrame:
        """Time-travel read (see SumView.snapshot_at)."""
        if not 0 <= version <= self._state.version:
            raise ValueError(
                f"version {version} out of range [0, {self._state.version}]"
            )
        df = self._state.read(version=version)
        if df is None:
            raise ValueError(f"version {version} has no committed state")
        return df
