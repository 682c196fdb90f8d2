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
- ``foreachBatch`` appends each micro-batch's delta rows into a
  HASH-BUCKET-PARTITIONED LSM state table (``_BucketedState``): commits
  write O(|delta|) bytes full stop, reads collapse each bucket's
  base+delta chain through the view's merge policy, and a bucket compacts
  only when its pending deltas reach its base size (amortized O(delta)
  maintenance) — the log-structured analogue of the reference's per-row
  B-tree UPSERT sink
  (internal/qpustate/mysql_backend/mysql_backend.go:147-254), and the
  same shape as an Iceberg merge-on-read table with minor compaction.
  Version retention is bounded (last ``retain``); manifests map bucket ->
  version chain, which doubles as the freshness-in-versions metric the
  reference logs (metrics.go:103-214);
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


class _Merge:
    """Merge-on-read policy: collapse the union of a bucket's base +
    delta rows (each stamped with its commit version ``_v``) to one row
    per key. Implementations are pure DataFrame aggregations, so the
    collapse runs as one hash aggregate across executors."""

    def collapse(self, df: DataFrame, key: str) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class _ReplaceMerge(_Merge):
    """Latest version wins wholesale (update-mode aggregation emits each
    group's NEW total, so the newest row IS the state)."""

    def collapse(self, df: DataFrame, key: str) -> DataFrame:
        cols = [c for c in df.columns if c not in (key, "_v")]
        return (
            df.groupBy(key)
            .agg(F.max_by(F.struct(*cols), "_v").alias("_s"))
            .select(key, *[F.col(f"_s.{c}").alias(c) for c in cols])
        )


class _AddMerge(_Merge):
    """Deltas are additive contributions (CDC new-minus-old); state is
    their running sum. Commutative+associative, so base rows produced by
    compaction are just partial sums. ``_ts`` folds as max (vector-clock
    join, qpu.proto:97-99)."""

    def __init__(self, sum_col: str):
        self.sum_col = sum_col

    def collapse(self, df: DataFrame, key: str) -> DataFrame:
        aggs = [F.sum(self.sum_col).alias(self.sum_col)]
        if "_ts" in df.columns:
            aggs.append(F.max("_ts").alias("_ts"))
        return df.groupBy(key).agg(*aggs)


class _CoalesceMerge(_Merge):
    """JoinView semantics: per column, last non-null value by version;
    a DELETE tombstone at version v kills everything <= v (a later
    re-insert revives the key); keys with no live rows disappear.
    Missing attributes fall to their declared defaults (join.go:414-423)."""

    def __init__(self, defaults: dict[str, float]):
        self.defaults = defaults

    def collapse(self, df: DataFrame, key: str) -> DataFrame:
        from pyspark.sql.window import Window

        cols = [c for c in df.columns if c not in (key, "_v", "_op")]
        if "_op" in df.columns:
            vdel = F.max(
                F.when(F.col("_op") == "DELETE", F.col("_v"))
            ).over(Window.partitionBy(key))
            df = df.withColumn("_vdel", vdel).filter(
                F.col("_v") > F.coalesce(F.col("_vdel"), F.lit(-1))
            )
        picked = df.groupBy(key).agg(
            *[
                F.max_by(c, F.when(F.col(c).isNotNull(), F.col("_v"))).alias(c)
                for c in cols
            ]
        )
        return picked.select(
            key,
            *[
                F.coalesce(F.col(c), F.lit(self.defaults[c])).alias(c)
                if c in self.defaults
                else F.col(c)
                for c in cols
            ],
        )


class _BucketedState:
    """Hash-bucket-partitioned LSM state table: delta commits,
    merge-on-read, per-bucket compaction.

    A commit writes ONLY the micro-batch's delta rows (partitioned by key
    bucket) — per-batch write cost is O(|delta|), full stop; there is no
    read-modify-write of existing buckets on the hot path. Each bucket
    accumulates a CHAIN of versions [base, delta, delta, ...]; a read
    unions the chain and collapses it with the view's merge policy (one
    hash aggregate). When a bucket's pending-delta bytes reach its base
    bytes — or its chain hits ``max_chain`` (read-amplification bound) —
    that bucket alone is compacted: chain ∪ new delta collapse to a fresh
    base inside the same commit. Size-triggered compaction rewrites at
    most ~2x the bytes the deltas brought in, so maintenance stays
    amortized O(|delta|) — the LSM argument, and the reason round 2's
    bucket-rewrite design (measured: a 1000-key uniform delta touched all
    buckets and rewrote 110% of state per batch) was replaced.

    This is the same shape as a lakehouse merge-on-read table (Iceberg
    MOR delta files + minor compaction; the reference's own sink is a
    per-row B-tree UPSERT, mysql_backend.go:147-254, which a log-structured
    store matches amortized). The manifest list is the version log; time
    travel = ``snapshot_at``; version dirs no retained manifest references
    are vacuumed. Plain parquet because the sandbox ships no lakehouse
    jars — the contract (O(delta) maintenance, bounded retention,
    versioned reads) is the part that matters at 100 TB.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key: str,
        merge: _Merge,
        n_buckets: int = 32,
        retain: int = 8,
        max_chain: int = 16,
    ):
        self.spark = spark
        self.root = root
        self.key = key
        self.merge = merge
        self.n_buckets = n_buckets
        self.retain = retain
        self.max_chain = max_chain
        # manifest per version: {bucket: (chain of version dirs holding its
        # rows, oldest first)}; kept for ALL versions (ints only) — files
        # are what get evicted, so reads past the retention window raise.
        self.manifests: list[dict[int, tuple[int, ...]]] = []
        self.schema: T.StructType | None = None  # stored schema (no _bucket)
        # (version, bucket) -> bytes written, recorded AT COMMIT (one flat
        # listing of each just-written bucket dir) and persisted in the
        # manifest. Compaction-trigger sizing reads THIS map, never the
        # filesystem — a per-commit walk of historic chain dirs is a LIST
        # storm on an object store.
        self.sizes: dict[tuple[int, int], int] = {}
        # highest micro-batch epoch ever committed (persisted in the
        # manifest, restored by recover): foreachBatch re-delivers the
        # in-flight epoch after a restart, and re-applying it would
        # double-count additive merges — the guard makes commits
        # exactly-once per epoch.
        self.last_epoch: int = -1

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

    def _bdir(self, v: int, b: int) -> str:
        return os.path.join(self._vdir(v), f"_bucket={b}")

    def _paths(self, version: int, buckets: list[int] | None) -> list[str]:
        m = self.manifests[version]
        items = (
            m.items()
            if buckets is None
            else [(b, m[b]) for b in buckets if b in m]
        )
        return [self._bdir(v, b) for b, chain in items for v in chain]

    # -- reads -------------------------------------------------------------
    def _read_raw(self, paths: list[str]) -> DataFrame:
        # explicit schema once it is known (always, after the first commit
        # or a recover): chain reads otherwise re-infer the schema from
        # footers across EVERY chained bucket dir on EVERY read — pure
        # driver-side listing/IO that grows with chain length (guide §1/§6,
        # the registry._schema_cache move applied to the LSM). The stored
        # schema is exactly the on-disk file schema: commit_delta captures
        # it from the written frame minus the _bucket partition column,
        # and bucket dirs are passed as leaf paths so no partition column
        # is re-discovered.
        if self.schema is not None:
            return self.spark.read.schema(self.schema).parquet(*paths)
        return self.spark.read.parquet(*paths)

    def read(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame | None:
        """Collapsed state at ``version`` (default latest): union the
        per-bucket chains (directory-pruned by construction; ``buckets``
        prunes further) and merge-on-read. None = never committed."""
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
                empty = self.spark.createDataFrame([], self.schema)
                return self.merge.collapse(empty, self.key)
            return None
        return self.merge.collapse(self._read_raw(paths), self.key)

    # -- writes ------------------------------------------------------------
    def _dir_bytes(self, path: str) -> int:
        """One flat listing of a just-written bucket dir (partitionBy lays
        part files directly in ``_bucket=N/``). Called once per (version,
        bucket) at commit time — the same listing Spark's commit protocol
        already did — and on legacy recovery for manifests that predate
        size tracking. Never called on the trigger-check hot path."""
        total = 0
        try:
            for f in os.listdir(path):
                fp = os.path.join(path, f)
                if os.path.isfile(fp):
                    try:
                        total += os.path.getsize(fp)
                    except OSError:
                        pass
        except OSError:
            pass
        return total

    def _size(self, v: int, b: int) -> int:
        """Bytes of bucket ``b``'s slice in version dir ``v`` — from the
        commit-time record; falls back to (and memoizes) a one-off listing
        only for chains recovered from pre-size-tracking manifests."""
        if (v, b) not in self.sizes:
            self.sizes[(v, b)] = self._dir_bytes(self._bdir(v, b))
        return self.sizes[(v, b)]

    def commit_delta(self, delta: DataFrame | None, epoch: int | None = None) -> int:
        """Append ``delta`` (this batch's rows, WITH ``_bucket``) as the
        next version. Buckets due for compaction fold chain + delta into
        a fresh single-version base in the same write; every other
        delta-carrying bucket just extends its chain. Untouched buckets
        carry their chains forward. None / row-less deltas bump the
        version with a copied manifest.

        The touched-bucket set is derived FROM the write (one listing of
        the just-written version dir) — the commit runs exactly one Spark
        job per micro-batch; there is no separate bucket-discovery pass
        over the delta. Compaction decisions evaluate every chained bucket
        against the in-memory size map, which is equivalent to evaluating
        only the touched set: an untouched bucket's chain and sizes are
        unchanged since its last touch, so its trigger result cannot have
        flipped (the one exception — a chain left overdue by a config
        change across recovery — just compacts one commit earlier, which
        the amortized bound absorbs).

        ``epoch``: the micro-batch id. A commit whose epoch is <= the last
        committed epoch is a foreachBatch REPLAY (post-restart
        re-delivery) and is skipped — without this, an additive merge
        (CDC mode) double-counts the replayed batch. Exactly-once, per
        epoch, surviving restarts (the epoch rides the manifest)."""
        if epoch is not None and epoch <= self.last_epoch:
            return self.version  # replayed batch: already applied
        v = len(self.manifests)
        prev = dict(self.manifests[-1]) if self.manifests else {}
        written: set[int] = set()
        compact: set[int] = set()
        if delta is not None:
            for b, chain in prev.items():
                if not chain:
                    continue
                if len(chain) >= self.max_chain:
                    compact.add(b)
                    continue
                base = self._size(chain[0], b)
                pending = sum(self._size(cv, b) for cv in chain[1:])
                # size-tiered trigger (ratio 0.5): rewrite costs <= ~3x
                # what the pending deltas brought in -> amortized O(delta)
                if base > 0 and pending >= base * 0.5:
                    compact.add(b)

            delta = delta.withColumn("_v", F.lit(v))
            out = delta
            if compact:
                chain_paths = [
                    self._bdir(cv, b)
                    for b in compact
                    for cv in prev.get(b, ())
                ]
                old = self._read_raw(chain_paths).withColumn(
                    "_bucket", self.bucket_col()
                )
                clist = sorted(compact)
                folded = self.merge.collapse(
                    old.unionByName(
                        delta.filter(F.col("_bucket").isin(clist)),
                        allowMissingColumns=True,
                    ),
                    self.key,
                ).withColumn("_bucket", self.bucket_col())
                # re-add helper cols so base and delta files share one schema
                for c in delta.columns:
                    if c not in folded.columns:
                        folded = folded.withColumn(
                            c,
                            F.lit(v)
                            if c == "_v"
                            else F.lit(None).cast(delta.schema[c].dataType),
                        )
                out = delta.filter(~F.col("_bucket").isin(clist)).unionByName(
                    folded.select(*delta.columns)
                )
            par = self.spark.sparkContext.defaultParallelism
            (
                out.repartition(min(self.n_buckets, par), "_bucket")
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(self._vdir(v))
            )
            if self.schema is None:
                self.schema = T.StructType(
                    [f for f in out.schema.fields if f.name != "_bucket"]
                )
            # the write IS the bucket discovery: partitionBy lays one
            # ``_bucket=N`` dir per bucket that received rows
            try:
                for d in os.listdir(self._vdir(v)):
                    if d.startswith("_bucket="):
                        b = int(d.split("=", 1)[1])
                        written.add(b)
                        self.sizes[(v, b)] = self._dir_bytes(self._bdir(v, b))
            except OSError:
                pass
        m = prev
        for b in written:
            m[b] = (v,) if b in compact else m.get(b, ()) + (v,)
        for b in compact - written:
            # compaction folded the bucket to zero live keys (all
            # deleted): keeping the old chain would resurrect them
            m.pop(b, None)
        self.manifests.append(m)
        self._persist_manifest(v, m, epoch=epoch)
        # Advance the exactly-once high-water mark only AFTER the commit's
        # write + manifest publish succeeded. Advancing it up front would
        # make a mid-commit failure (transient executor/IO error) followed
        # by an in-process restart silently SKIP the re-delivered epoch —
        # the batch would be lost from state, while the durable-recovery
        # path (fresh object, manifest never persisted) replays correctly.
        if epoch is not None:
            self.last_epoch = epoch
        self._evict()
        return v

    # -- durability --------------------------------------------------------
    def _persist_manifest(
        self,
        v: int,
        m: dict[int, tuple[int, ...]],
        epoch: int | None = None,
    ) -> None:
        """Write the version's manifest as a tiny JSON next to the data —
        the state's commit log. Without it the bucket->chain mapping lives
        only in driver memory and a driver restart orphans every committed
        file (the reference's state survives restarts because it IS the
        database, mysql_backend.go:63-144). Write-then-rename = atomic
        publish; recovery takes the highest contiguous version."""
        import json

        tmp = os.path.join(self.root, f".manifest_v{v}.tmp")
        dst = os.path.join(self.root, f"manifest_v{v}.json")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "buckets": {str(b): list(chain) for b, chain in m.items()},
                    # schema rides the commit log: without it a recovered
                    # state can't serve the empty-result paths (read/
                    # changes_since at an all-empty or no-news bound)
                    "schema": self.schema.json() if self.schema else None,
                    # byte sizes of every (version, bucket) slice this
                    # manifest references: compaction-trigger sizing after
                    # recovery reads these instead of listing the store
                    "sizes": {
                        f"{cv}:{b}": self.sizes[(cv, b)]
                        for b, chain in m.items()
                        for cv in chain
                        if (cv, b) in self.sizes
                    },
                    # exactly-once guard survives restarts; this commit's
                    # epoch rides the manifest even though the in-memory
                    # high-water mark only advances after the publish
                    "epoch": self.last_epoch if epoch is None else epoch,
                },
                f,
            )
        os.replace(tmp, dst)

    def recover(self) -> int:
        """Rebuild the manifest list from the persisted commit log (e.g.
        after a driver restart): returns the recovered latest version, or
        -1 for an empty/new state dir."""
        import json
        import re as _re

        found: dict[int, dict[int, tuple[int, ...]]] = {}
        schemas: dict[int, str] = {}
        if os.path.isdir(self.root):
            for fname in os.listdir(self.root):
                mt = _re.fullmatch(r"manifest_v(\d+)\.json", fname)
                if mt:
                    with open(os.path.join(self.root, fname)) as f:
                        raw = json.load(f)
                    buckets = raw.get("buckets", raw)  # legacy: bare map
                    found[int(mt.group(1))] = {
                        int(b): tuple(chain) for b, chain in buckets.items()
                    }
                    if isinstance(raw, dict) and raw.get("schema"):
                        schemas[int(mt.group(1))] = raw["schema"]
                    if isinstance(raw, dict):
                        for k, nbytes in (raw.get("sizes") or {}).items():
                            cv, b = k.split(":")
                            self.sizes[(int(cv), int(b))] = int(nbytes)
                        if raw.get("epoch") is not None:
                            self.last_epoch = max(
                                self.last_epoch, int(raw["epoch"])
                            )
        self.manifests = []
        v = 0
        while v in found:  # highest contiguous prefix = committed history
            self.manifests.append(found[v])
            v += 1
        committed = [k for k in schemas if k < v]
        if self.schema is None and committed:
            import json as _json

            self.schema = T.StructType.fromJson(
                _json.loads(schemas[max(committed)])
            )
        return self.version

    def changes_since(self, since_version: int) -> DataFrame | None:
        """Catch-up read: the CURRENT rows of every key touched after
        ``since_version`` — the VECTORCLOCK-bound tsPredicate ``[v, INF)``
        the reference declares but never implemented (qpu.proto:74-95;
        queries.go:119-134 only ships [LATEST, INF)).

        The LSM makes this natural: keys touched since v live in the
        version dirs > v that the current chains still reference, so the
        key probe reads ONLY those delta files (no full-state scan).
        Compaction folds untouched keys into new dirs, so the key set is a
        SUPERSET of the truly-changed keys — at-least-once delivery, the
        same guarantee a CDC catch-up gives. Values come from the current
        collapse, semi-joined to the touched keys; touched keys with NO
        current row (tombstoned since the bound) are delivered too, as
        null-valued rows with ``_deleted = 1`` — a catch-up that dropped
        deletions would leave the consumer's mirror holding dead keys
        forever."""

        def _with_flag(df: DataFrame) -> DataFrame:
            return df.withColumn("_deleted", F.lit(0))

        cur = self.version
        if cur < 0 or since_version >= cur:
            if self.schema is not None:
                empty = self.spark.createDataFrame([], self.schema)
                return _with_flag(self.merge.collapse(empty, self.key))
            return None
        m = self.manifests[cur]
        paths = [
            self._bdir(v, b)
            for b, chain in m.items()
            for v in chain
            if v > since_version
        ]
        if not paths:
            if self.schema is None:
                return None
            empty = self.spark.createDataFrame([], self.schema)
            return _with_flag(self.merge.collapse(empty, self.key))
        touched = self._read_raw(paths).select(self.key).distinct()
        full = self.read()
        live = _with_flag(full.join(touched, self.key, "left_semi"))
        gone = touched.join(full.select(self.key), self.key, "left_anti")
        for f in live.schema.fields:
            if f.name not in (self.key, "_deleted"):
                gone = gone.withColumn(
                    f.name, F.lit(None).cast(f.dataType)
                )
        gone = gone.withColumn("_deleted", F.lit(1))
        return live.unionByName(gone.select(*live.columns))

    def _evict(self) -> None:
        keep_from = max(0, len(self.manifests) - self.retain)
        referenced: set[int] = set()
        for m in self.manifests[keep_from:]:
            for chain in m.values():
                referenced.update(chain)
        # frontier: versions below it were already vacuumed by earlier
        # commits — without it this loop rescans (and re-rmtrees) every
        # historic version on EVERY commit, O(total versions) driver work
        # per batch over the stream's lifetime
        start = getattr(self, "_evicted_to", 0)
        for v in range(start, keep_from):
            if v not in referenced:
                shutil.rmtree(self._vdir(v), ignore_errors=True)
                # drop size records for the removed version — the map
                # would otherwise accrete dead entries forever
                for key in [k for k in self.sizes if k[0] == v]:
                    self.sizes.pop(key, None)
        # a still-referenced version below keep_from must stay scannable
        self._evicted_to = min(
            keep_from,
            min((rv for rv in referenced if rv >= start), default=keep_from),
        )


def _dispatch_subscribers(
    subscribers: list[tuple[Callable[[DataFrame, int], None], bool]],
    delta: DataFrame,
    epoch: int,
) -> None:
    """Per-micro-batch subscriber fan-out, shared by SumView and JoinView.

    A DURABLE subscriber's exception propagates — the micro-batch fails,
    the streaming query stops, and a restart replays the epoch: the state
    commit is then skipped (exactly-once) while dispatch re-runs
    (at-least-once), so an idempotent exporter completes the publication
    it lost. Swallowing such an exception instead would let Spark
    checkpoint the epoch with the export incomplete — permanently missing
    from the feed (ADVICE r13). Best-effort observers keep the swallow:
    their failures must not kill the view.

    EVERY subscriber is dispatched before a durable failure re-raises
    (review r14 #2): aborting the loop mid-way would starve the
    subscribers registered after the failing one — in-process observers
    have no replay to catch them up, so the one-callback-per-version
    counting they rely on would silently break."""
    durable_err: Exception | None = None
    for cb, durable in list(subscribers):
        try:
            cb(delta, epoch)
        except Exception as exc:
            if durable and durable_err is None:
                durable_err = exc
            # observer errors must not kill the view; a durable error
            # still lets the rest of the fan-out run first
    if durable_err is not None:
        raise durable_err


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
        root: str | None = None,
    ):
        self.spark = spark
        self.name = name
        self.group_by = group_by
        self.agg_attr = agg_attr
        self.sum_col = f"{agg_attr}_sum"
        self.mode = mode
        self.derived = derived or {}
        self._stream = stream
        # ``root``: pin the state+checkpoint location so the view can be
        # STOPPED AND RESTARTED in place — the new instance recovers the
        # LSM manifest (including the exactly-once epoch high-water mark)
        # and Spark's checkpoint resumes the source offsets; a batch that
        # committed to state but not to the offset log is re-delivered and
        # deduped by the epoch guard. Default: fresh temp dir per view.
        self._root = root or tempfile.mkdtemp(prefix=f"proteus_view_{name}_")
        os.makedirs(self._root, exist_ok=True)
        self._ckpt = os.path.join(self._root, "_checkpoint")
        # append mode: update-mode agg emits NEW totals -> latest row wins;
        # cdc mode: raw contributions -> running sum (commutative)
        merge = (
            _ReplaceMerge()
            if mode == "append"
            else _AddMerge(sum_col=self.sum_col)
        )
        self._state = _BucketedState(
            spark, self._root, key=group_by, merge=merge,
            n_buckets=n_buckets, retain=retain,
        )
        if root is not None:
            self._state.recover()
        self._retain = retain
        self._snap_lock = threading.Lock()
        self._batch_lock = threading.Lock()
        self._stopped = False
        self._snap_cache = None
        self._snap_version = -1
        self._derived_version: dict[str, int] = {}
        # (callback, durable) pairs — see subscribe() for the contract
        self._subscribers: list[
            tuple[Callable[[DataFrame, int], None], bool]
        ] = []
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
        return self

    def freeze(self) -> int:
        """Stop processing and latch the view READ-ONLY, returning the
        frozen version — latch and read happen inside ONE _batch_lock
        critical section, so the caller's subsequent reads (version,
        snapshot, subscriber tallies) are immutable by construction
        (VERDICT r12 #1: the test-side latch-then-read left a window
        where a mid-flight commit landed between the two). Unlike
        stop(), the materialized snapshot stays readable; call stop()
        afterwards for teardown (idempotent)."""
        if self._query is not None:
            self._query.stop()
        with self._batch_lock:
            self._stopped = True
            return self._state.version

    def stop(self, cleanup: bool = True) -> None:
        if self._query is not None:
            self._query.stop()
        # join the in-flight foreachBatch AND latch _stopped under the same
        # lock: a callback dispatched just before query.stop() but not yet
        # at the lock acquires it after us, sees the flag, and returns
        # without committing — post-stop state is final either way
        with self._batch_lock:
            self._stopped = True
        with self._snap_lock:
            if self._snap_cache is not None:
                try:
                    self._snap_cache.unpersist()
                except Exception:
                    pass  # session may already be closing
                self._snap_cache = None
        if cleanup:
            shutil.rmtree(self._root, ignore_errors=True)

    # -- state maintenance ---------------------------------------------------
    def _on_changed_groups(self, batch: DataFrame, epoch: int) -> None:
        """update-mode aggregation hands us the changed groups with their
        NEW totals (state store did the math) -> MERGE = replace keys."""
        self._merge(batch, epoch=epoch)

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
        self._merge(contrib, epoch=epoch)

    def _merge(self, delta: DataFrame, epoch: int) -> None:
        # batch-in-flight guard: stop() barriers on this lock, so a
        # caller that returned from stop() can never observe a version
        # bump or subscriber callback landing afterwards (the round-8
        # deflake's diagnosed race — StreamingQuery.stop() does not join
        # the Python foreachBatch callback thread; a callback that loses
        # the race to stop() must observe the latch and drop the batch)
        with self._batch_lock:
            if self._stopped:
                return
            self._merge_locked(delta, epoch)

    def _merge_locked(self, delta: DataFrame, epoch: int) -> None:
        # merge POLICY lives in the _state.merge object chosen at
        # construction (replace / add / coalesce) — not a per-call flag.
        # LSM append: write ONLY the delta rows — no read-modify-write of
        # existing state on the hot path (merge happens on read / at
        # per-bucket compaction), and ONE Spark job per batch (the commit
        # derives touched buckets from its own write; replayed epochs are
        # skipped — exactly-once for the additive CDC merge)
        delta = delta.withColumn("_bucket", self._state.bucket_col())
        # With subscribers registered, the delta plan would otherwise
        # EXECUTE TWICE per batch — once for the state commit's write and
        # once when the dispatch fan-out's consumers act on it (for an
        # update-mode aggregation that is the whole agg + state-store pass
        # again; measured ~2x the batch cost on the CDF-export views,
        # optimization r16 / guide §1). One eager localCheckpoint makes
        # the commit write and every subscriber read the same materialized
        # blocks; released deterministically after the fan-out (consumers
        # act synchronously inside their callback — the subscribe()
        # contract). Views without subscribers keep the single-job shape.
        _ckpt = None
        if self._subscribers:
            delta = delta.localCheckpoint(eager=True)
            _ckpt = delta
        # NOTE: a replayed epoch (commit_delta returns an unchanged
        # version) still falls through to subscriber dispatch
        # DELIBERATELY — downstream delivery is AT-LEAST-ONCE.
        # A crash between the state's manifest persist and a subscriber's
        # own commit point (e.g. minilog.append_epoch's atomic marker)
        # leaves the export incomplete; on restart foreachBatch re-delivers
        # the epoch, the state commit is skipped (exactly-once), and the
        # re-dispatched subscriber completes its idempotent publication —
        # the marker-keyed replay guard in append_epoch depends on being
        # re-invoked (review r13 #1). Replays only occur across restarts,
        # so in-process callback counting (one per version) is unaffected.
        # Derived views, by contrast, recompute FROM the committed state —
        # an IN-PROCESS replay that did not advance the version has
        # nothing new to derive, so the recompute (and its version bump +
        # retention delete) is skipped: re-running it only burned Spark
        # jobs and drifted _derived_version ahead of the state version
        # (ADVICE r14). EXCEPT when this instance has not produced the
        # derived view at all (_derived_version is in-memory and resets on
        # restart): a post-restart replayed epoch must still recompute, or
        # a crash between the state commit and the derived write would
        # leave the derived view permanently unavailable (review r14 #1 —
        # the crash-repair duty the pre-r14 always-recompute carried).
        try:
            prev_v = self._state.version
            new_v = self._state.commit_delta(delta, epoch=epoch)

            # downstream QPUs: recompute derived views over the committed
            # state (None until the first non-empty batch commits a schema
            # — an empty first micro-batch must not crash the query).
            # Snapshot resolution is only paid when a derived view will
            # consume it (optimization r16, guide §1): with no derived views
            # the per-batch read.parquet resolution + persist/unpersist churn
            # served nobody — readers memoize their own snapshot per version.
            state = self.snapshot() if self.derived else None
            for name, fn in self.derived.items() if state is not None else ():
                if new_v == prev_v and name in self._derived_version:
                    continue  # in-process replay, derived already current
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

            _dispatch_subscribers(
                self._subscribers, delta.drop("_bucket"), epoch
            )
        finally:
            if _ckpt is not None:
                from proteus_spark.plans.ckpt import release

                release(_ckpt)

    # -- query surface -------------------------------------------------------
    def snapshot(self) -> DataFrame | None:
        """Current materialized state (ClientQuery parity: queries answer
        from local state, sum.go:149-180).

        Reads pay the LSM collapse once per version: the collapsed frame
        is memoized + persisted, so a read-heavy serving workload between
        micro-batches hits the cached collapse instead of re-aggregating
        the bucket chains on every query (the LSM read-optimized view).
        Laziness keeps the writer unaffected — materialization cost lands
        on the first reader of each version, O(|state|) once per version
        AT MOST (never per read, never per commit)."""
        with self._snap_lock:
            v = self._state.version
            if v != self._snap_version:
                new = self._state.read()
                old = self._snap_cache
                self._snap_cache = new.persist() if new is not None else None
                self._snap_version = v
                if old is not None:
                    old.unpersist()
            return self._snap_cache

    def snapshot_derived(self, name: str) -> DataFrame | None:
        dv = self._derived_version.get(name, -1)
        if dv < 0:
            return None
        return self.spark.read.parquet(os.path.join(self._root, f"{name}_v{dv}"))

    def subscribe(
        self, cb: Callable[[DataFrame, int], None], durable: bool = False
    ) -> None:
        """QuerySubscribe parity: cb(delta_df, epoch) per micro-batch.

        ``durable=True`` marks a durability-bearing subscriber (a CDF
        exporter, a state mirror): its exceptions PROPAGATE out of
        foreachBatch so the micro-batch fails and a restart replays the
        epoch — the at-least-once re-dispatch then completes the
        publication. Swallow-and-continue (the default) is reserved for
        best-effort observers, where losing one callback is acceptable
        but killing the view is not (ADVICE r13: a transient exporter
        IO error after the state commit would otherwise checkpoint the
        epoch and permanently lose it from the exported feed)."""
        self._subscribers.append((cb, durable))

    def unsubscribe(self, cb: Callable[[DataFrame, int], None]) -> None:
        """Remove a subscriber registered with ``subscribe``. Idempotent —
        a long-lived view must not accrete dead callbacks (each one costs
        a delta.collect() per micro-batch), so every transient consumer
        (server NDJSON streams, bounded watchers) unregisters on exit."""
        for i, (fn, _durable) in enumerate(self._subscribers):
            if fn == cb:
                del self._subscribers[i]
                break

    def version(self) -> int:
        """Freshness-in-versions handle (metrics.go:103-214)."""
        return self._state.version

    def changes_since(self, version: int) -> DataFrame | None:
        """Catch-up subscribe from a version bound: current rows of every
        group touched after ``version`` (at-least-once; see
        _BucketedState.changes_since). The [v, INF) tsPredicate."""
        return self._state.changes_since(version)

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
        root: str | None = None,
        order_col: str | None = None,
    ):
        self.spark = spark
        self.name = name
        self.key = key
        self.defaults = defaults or {}
        # ``order_col``: when the transport supplies a per-key total order
        # (a CDF feed's epoch stamp, a vector clock), the within-batch
        # collapse becomes DETERMINISTIC last-writer-wins by that order
        # instead of the reference's arbitrary-arrival ``last`` — required
        # when one micro-batch can hold several versions of a key (e.g. a
        # rate-limited log consumer pulling multiple exported epochs at
        # once). The column is consumed by the collapse and never stored.
        self.order_col = order_col
        self._stream = left.unionByName(right, allowMissingColumns=True)
        # root pins state+checkpoint for restart-in-place (see SumView)
        self._root = root or tempfile.mkdtemp(prefix=f"proteus_view_{name}_")
        os.makedirs(self._root, exist_ok=True)
        self._ckpt = os.path.join(self._root, "_checkpoint")
        self._state = _BucketedState(
            spark, self._root, key=key,
            merge=_CoalesceMerge(defaults=self.defaults),
            n_buckets=n_buckets, retain=retain,
        )
        if root is not None:
            self._state.recover()
        # (callback, durable) pairs — see SumView.subscribe for the contract
        self._subscribers: list[
            tuple[Callable[[DataFrame, int], None], bool]
        ] = []
        self._snap_lock = threading.Lock()
        self._batch_lock = threading.Lock()
        self._stopped = False
        self._snap_cache = None
        self._snap_version = -1
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

    def freeze(self) -> int:
        """Latch read-only and return the frozen version in one critical
        section (see SumView.freeze); the snapshot stays readable."""
        if self._query is not None:
            self._query.stop()
        with self._batch_lock:
            self._stopped = True
            return self._state.version

    def stop(self, cleanup: bool = True) -> None:
        if self._query is not None:
            self._query.stop()
        # join the in-flight foreachBatch AND latch _stopped under the
        # same lock (see SumView.stop): post-stop state is final
        with self._batch_lock:
            self._stopped = True
        with self._snap_lock:
            if self._snap_cache is not None:
                try:
                    self._snap_cache.unpersist()
                except Exception:
                    pass  # session may already be closing
                self._snap_cache = None
        if cleanup:
            shutil.rmtree(self._root, ignore_errors=True)

    # -- state maintenance -------------------------------------------------
    def _on_batch(self, batch: DataFrame, epoch: int) -> None:
        with self._batch_lock:  # stop() barriers on this (see SumView)
            if self._stopped:
                return
            self._on_batch_locked(batch, epoch)

    def _on_batch_locked(self, batch: DataFrame, epoch: int) -> None:
        has_op = "_op" in batch.columns
        cols = [
            c
            for c in batch.columns
            if c not in (self.key, "_op", self.order_col)
        ]
        # collapse the batch: one row per key, last non-null per attribute
        # (arrival order within a batch is arbitrary — matching the
        # reference's unordered apply, join.go:352-379) — or, with
        # order_col, the row with the HIGHEST order among non-null values
        # (deterministic LWW when the transport stamps a per-key order);
        # the optional ``_op`` column marks DELETE tombstones — a key
        # whose last record in the batch is a DELETE is removed from state
        if self.order_col is not None:
            oc = F.col(self.order_col)
            aggs = [
                F.max_by(F.col(c), F.when(F.col(c).isNotNull(), oc)).alias(c)
                for c in cols
            ]
            if has_op:
                # deterministic tie-break: equal order values (possible when
                # two transports' sequence domains overlap) resolve by an
                # EXPLICIT op precedence, not arrival order — and not the op
                # string's accidental lexicographic order, which ranked
                # "UPDATEDELTA" above "DELETE" and silently resurrected
                # concurrently-deleted keys (ADVICE r7). A DELETE tombstone
                # outranks any same-order upsert (STATE / UPDATEDELTA /
                # NULL): the Cassandra / Kafka-compaction convention —
                # resurrecting a deleted key is the worse failure mode.
                op_rank = F.when(
                    F.col("_op") == "DELETE", F.lit(1)
                ).otherwise(F.lit(0))
                aggs.append(
                    F.max_by(F.col("_op"), F.struct(oc, op_rank)).alias("_op")
                )
        else:
            aggs = [F.last(c, ignorenulls=True).alias(c) for c in cols]
            if has_op:
                aggs.append(F.last("_op", ignorenulls=False).alias("_op"))
        delta = (
            batch.groupBy(self.key)
            .agg(*aggs)
            .withColumn("_bucket", self._state.bucket_col())
        )
        # one execution per batch even with subscribers registered — see
        # SumView._merge_locked (the commit write and the dispatch fan-out
        # otherwise each run the batch-collapse plan)
        _ckpt = None
        if self._subscribers:
            delta = delta.localCheckpoint(eager=True)
            _ckpt = delta
        # LSM append: delta rows only (tombstones persist as rows with
        # _op=DELETE until their bucket compacts); the coalesce merge
        # resolves per-column last-writer-wins + deletes on read; one
        # Spark job per batch (touched buckets come from the commit's
        # own write); replayed epochs are skipped
        # replayed epochs skip the state commit but still re-notify:
        # downstream delivery is at-least-once so idempotent exporters can
        # complete a crash-interrupted publication (see SumView._merge_locked)
        try:
            self._state.commit_delta(delta, epoch=epoch)
            _dispatch_subscribers(
                self._subscribers, delta.drop("_bucket"), epoch
            )
        finally:
            if _ckpt is not None:
                from proteus_spark.plans.ckpt import release

                release(_ckpt)

    # -- query surface -----------------------------------------------------
    def snapshot(self) -> DataFrame | None:
        """Collapsed state, memoized per version (see SumView.snapshot)."""
        with self._snap_lock:
            v = self._state.version
            if v != self._snap_version:
                new = self._state.read()
                old = self._snap_cache
                self._snap_cache = new.persist() if new is not None else None
                self._snap_version = v
                if old is not None:
                    old.unpersist()
            return self._snap_cache

    def subscribe(
        self, cb: Callable[[DataFrame, int], None], durable: bool = False
    ) -> None:
        """Per-micro-batch delta callback; ``durable=True`` for
        durability-bearing subscribers — see SumView.subscribe."""
        self._subscribers.append((cb, durable))

    def unsubscribe(self, cb: Callable[[DataFrame, int], None]) -> None:
        """Remove a subscriber (idempotent); see SumView.unsubscribe."""
        for i, (fn, _durable) in enumerate(self._subscribers):
            if fn == cb:
                del self._subscribers[i]
                break

    def version(self) -> int:
        return self._state.version

    def changes_since(self, version: int) -> DataFrame | None:
        """Catch-up from a version bound (see SumView.changes_since)."""
        return self._state.changes_since(version)

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


class _DistinctMerge(_Merge):
    """History/log state: rows are IMMUTABLE change records, so the
    collapse keeps them all — it only drops the chain bookkeeping and
    dedups exact replays (at-least-once replay safety). Idempotent under
    compaction: a folded base is the distinct union of its chain, and
    re-collapsing base + new deltas changes nothing already folded."""

    def collapse(self, df: DataFrame, key: str) -> DataFrame:
        return df.drop("_v").distinct()


class HistoryView:
    """Streaming SCD2 history view: every change record for a key is
    retained, and reads surface slowly-changing-dimension rows with
    validity intervals ([valid_from, valid_to) by the change's event-time
    order, open interval + ``is_current`` for the latest).

    The third state shape next to SumView (one agg row per key) and
    JoinView (one merged row per key): ONE ROW PER CHANGE. The LSM fits it
    perfectly — history is append-only, so every commit is O(|delta|) by
    construction (there is nothing to read-modify-write, merge-on-read is
    just replay-dedup), and per-bucket compaction only folds exact
    duplicates. Interval computation happens at read: a window per key
    ordered by (order_col, id_col) — per-key history is bounded (a
    dimension key changes thousands of times, not billions), so the
    window partition never concentrates the corpus in one task.

    The reference keeps only current state (mysql_backend.go:147-254
    upserts in place, old values lost); SCD2 retention is the lakehouse
    upgrade every warehouse dimension pipeline expects.
    """

    def __init__(
        self,
        spark: SparkSession,
        stream: DataFrame,
        key: str,
        order_col: str,
        id_col: str,
        name: str = "history_view",
        n_buckets: int = 32,
        retain: int = 8,
        root: str | None = None,
    ):
        self.spark = spark
        self.name = name
        self.key = key
        self.order_col = order_col
        self.id_col = id_col
        self._stream = stream
        # root pins state+checkpoint for restart-in-place (see SumView)
        self._root = root or tempfile.mkdtemp(prefix=f"proteus_view_{name}_")
        os.makedirs(self._root, exist_ok=True)
        self._ckpt = os.path.join(self._root, "_checkpoint")
        self._state = _BucketedState(
            spark, self._root, key=key, merge=_DistinctMerge(),
            n_buckets=n_buckets, retain=retain,
        )
        if root is not None:
            self._state.recover()
        self._batch_lock = threading.Lock()
        self._stopped = False
        self._query = None

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "HistoryView":
        writer = self._stream.writeStream.outputMode("append").foreachBatch(
            self._on_batch
        )
        self._query = (
            writer.option("checkpointLocation", self._ckpt)
            .queryName(self.name)
            .start()
        )
        return self

    def await_catch_up(self) -> "HistoryView":
        self._query.processAllAvailable()
        return self

    def stop(self, cleanup: bool = True) -> None:
        if self._query is not None:
            self._query.stop()
        # join the in-flight foreachBatch AND latch _stopped BEFORE cleanup
        # removes the state root from under a mid-commit batch (see
        # SumView.stop) — a late callback sees the latch, never the rmtree
        with self._batch_lock:
            self._stopped = True
        if cleanup:
            shutil.rmtree(self._root, ignore_errors=True)

    # -- state maintenance -------------------------------------------------
    def _on_batch(self, batch: DataFrame, epoch: int) -> None:
        with self._batch_lock:
            if self._stopped:
                return
            self._state.commit_delta(
                batch.withColumn("_bucket", self._state.bucket_col()),
                epoch=epoch,
            )

    # -- query surface -----------------------------------------------------
    def log(self) -> DataFrame | None:
        """The raw deduped change log (one row per change record)."""
        df = self._state.read()
        return None if df is None else df.drop("_bucket")

    def history(self) -> DataFrame | None:
        """SCD2 rows: every change with its validity interval —
        ``valid_to`` = next change's ``order_col`` for the key (NULL while
        current), deterministic under ties via ``id_col``."""
        from pyspark.sql.window import Window

        log = self.log()
        if log is None:
            return None
        w = Window.partitionBy(self.key).orderBy(self.order_col, self.id_col)
        nxt = F.lead(self.order_col).over(w)
        return log.select(
            "*",
            F.col(self.order_col).alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().cast("int").alias("is_current"),
        )

    def version(self) -> int:
        return self._state.version


    def as_of(self, at) -> DataFrame | None:
        """Point-in-time dimension read: each key's value whose validity
        interval covers ``at`` (event-time travel — distinct from
        ``_BucketedState.snapshot_at``, which travels COMMIT versions).
        Keys whose first change is after ``at`` are absent, exactly like
        a dimension table rebuilt from the log at that moment."""
        hist = self.history()
        if hist is None:
            return None
        return hist.filter(
            (F.col("valid_from") <= F.lit(at))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(at)))
        ).drop("valid_from", "valid_to", "is_current")
