"""Query registry — single source of truth for the correctness gate.

Every implemented operator from SURVEY §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible)
an equivalent ANSI-SQL oracle string that DuckDB runs over the same parquet
tables. ``__spark_entry__.py`` re-exports this registry to the driver.

Conventions that keep the Spark result and the DuckDB oracle hash-identical:

- every computed column is aliased to the SAME name on both sides;
- computed floating-point aggregates are rounded identically on both sides
  (sums of money-scale values -> 2 decimals; ratios/averages -> 6), because
  double summation order differs between engines;
- integer aggregates are cast to BIGINT in the oracle (DuckDB widens
  SUM(BIGINT) to HUGEINT otherwise);
- no raw TIMESTAMP columns in outputs (session-TZ vs naive mismatch);
  format to strings or extract date parts instead;
- unordered outputs are fine (the driver's hash is order-insensitive), but
  every LIMIT/top-k query carries explicit deterministic tie-breaks.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | Callable[[], str] | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""

    def resolve_oracle(self) -> str | None:
        if callable(self.oracle):
            return self.oracle()
        return self.oracle


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle=None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register a query under ``name`` with its DuckDB oracle."""

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags, doc=doc or fn.__doc__ or "")
        return fn

    return deco


# rows-per-row-group below which a source is parallel enough on its own;
# above it (with few row groups) the file is effectively unsplittable and
# every scan-side stage would run near-serial.
_DENSIFY_MIN_ROWS = 50_000
_split_cache: dict[str, tuple[int, int]] = {}

# Schema metadata cache (optimization r15, guide §1/§6): ``spark.read
# .parquet(path)`` re-infers the schema on EVERY call — a file listing plus
# a footer read through the JVM, measured ~115 ms per table per query
# construction at sf0.1 (vs ~17 ms with an explicit schema). The testdata
# tables are static, so the inferred schema is cached per path — METADATA
# only, exactly the class of the ``_split_cache`` footer cache above; every
# execution still reads all data from parquet. At 100 TB the same move is
# what a catalog/table-format (metastore, Iceberg manifest) does: resolve
# the schema once, not once per query.
_schema_cache: dict[str, object] = {}


def _scan_shape(path: str) -> tuple[int, int]:
    """(rows in the LARGEST single parquet row group, total row-group
    count) under ``path``.

    Parquet splits at row-group boundaries only: a million-row single-group
    file is one Spark task no matter what maxPartitionBytes says. Real lake
    writers emit ~128 MB multi-group files, but defensive engines must
    handle the degenerate shape (single-group dumps, gzip-ish unsplittable
    inputs) — the footer read is a few KB of driver-side IO, cached. The
    row-group COUNT is the scan's maximum parallelism: densify must fire
    only when that is below the cluster's, never on an already-well-split
    source (measured at a 100x replica laid out as 32 multi-group files:
    densify's extra roundRobin exchange carried all 60M filtered rows for
    zero scan-parallelism gain)."""
    if path not in _split_cache:
        worst, groups = 0, 0
        try:
            import pyarrow.parquet as pq

            files = (
                [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
                if os.path.isdir(path)
                else [path]
            )
            for f in files:
                md = pq.ParquetFile(f).metadata
                groups += md.num_row_groups
                for i in range(md.num_row_groups):
                    worst = max(worst, md.row_group(i).num_rows)
        except Exception:
            worst, groups = 0, 0  # unreadable footer -> assume splittable
        _split_cache[path] = (worst, groups)
    return _split_cache[path]


def _unsplittable_rows(path: str) -> int:
    return _scan_shape(path)[0]


_lead_distinct_cache: dict[str, int] = {}


def _leading_col_distinct_hint(path: str) -> int:
    """LOWER-BOUND-ish cardinality hint for a table's LEADING column from
    parquet footer statistics only (metadata-only, cached — the
    _scan_shape class). Densify hashes its fan-out key on the leading
    column under the 'dumps lead with their record key' convention; this
    hint is the check behind that convention (VERDICT r15 item 8 / ADVICE
    r15): a flag/enum/constant leading column would collapse the hash
    fan-out into a handful of partitions — strictly worse than
    round-robin. Returns: the footer ``distinct_count`` when present;
    else for integer columns the min..max span (an upper bound on
    distincts, but a TINY span proves low cardinality, which is the
    failure being guarded); else 2 for a non-constant column of other
    types and 1 for a constant one; 0 when no statistics are readable
    (callers treat 0 as "unknown — don't trust the hash key")."""
    if path not in _lead_distinct_cache:
        hint = 0
        try:
            import pyarrow.parquet as pq

            files = (
                [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
                if os.path.isdir(path)
                else [path]
            )
            mins, maxs, distincts = [], [], 0
            for f in files:
                md = pq.ParquetFile(f).metadata
                for i in range(md.num_row_groups):
                    st = md.row_group(i).column(0).statistics
                    if st is None or st.min is None or st.max is None:
                        raise ValueError("no leading-column stats")
                    mins.append(st.min)
                    maxs.append(st.max)
                    distincts += st.distinct_count or 0
            if mins:
                lo, hi = min(mins), max(maxs)
                if distincts:
                    hint = distincts
                elif isinstance(lo, int) and isinstance(hi, int):
                    hint = hi - lo + 1
                else:
                    hint = 1 if lo == hi else 2
        except Exception:
            hint = 0
        _lead_distinct_cache[path] = hint
    return _lead_distinct_cache[path]


_rows_cache: dict[str, int] = {}


def table_rows(sf_dir: str, name: str) -> int:
    """Total row count of one testdata table from parquet FOOTERS only —
    a few KB of driver-side IO, cached per path (the same metadata-only
    class as ``_scan_shape``/``_schema_cache``: no data is read, no
    results are derived from it). For scale-adaptive partition sizing of
    derived frames (optimization r15); returns 0 when the footer is
    unreadable so callers fall back to a parallelism default."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if path not in _rows_cache:
        n = 0
        try:
            import pyarrow.parquet as pq

            files = (
                [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
                if os.path.isdir(path)
                else [path]
            )
            for f in files:
                n += pq.ParquetFile(f).metadata.num_rows
        except Exception:
            n = 0
        _rows_cache[path] = n
    return _rows_cache[path]


def _tune_session(spark: SparkSession) -> None:
    """Apply the engine's runtime-settable tuning to WHATEVER session the
    caller hands us (an external harness passes its own plain session —
    builder-time configs in session.py never reach it).

    - shuffle partitions sized to actual parallelism: a plain session's
      default of 200 runs 200-way exchanges AND 200 state-store partitions
      per streaming micro-batch (stateful ops don't benefit from AQE
      coalescing — state partitioning is fixed at first batch). On a real
      cluster defaultParallelism scales with executors, so this holds at
      100 TB too.
    - UTC session TZ: timestamp results must not depend on host TZ.
    - Arrow: Pandas-UDF paths batch-transfer instead of pickling rows.
    - legacy nanosAsLong: lets the old TIMESTAMP(NANOS) events layout read
      as epoch-nanos longs (no-op for the current MICROS layout).
    """
    for k, v in (
        ("spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable on this runtime -> keep its default


def load(
    spark: SparkSession, sf_dir: str, name: str, densify: bool = False
) -> DataFrame:
    """Load one testdata table (driver contract: parquet per table).

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark only reads with
    the nanosAsLong legacy conf — set it defensively on whatever session the
    driver hands us. The ``ts`` column then arrives as LongType epoch-nanos;
    use ``events_with_ts`` for a proper timestamp column.

    ``densify``: when the largest row group holds >= _DENSIFY_MIN_ROWS rows
    the scan is repartitioned to cluster parallelism right after decode, so
    per-row work (partial aggregation, expression eval) spreads across
    executors instead of running at file parallelism. Filters/pruning still
    push THROUGH the repartition to the scan (PushDownPredicates handles
    Repartition), so the exchange carries only filtered, pruned rows.

    OFF by default — measured both ways at sf0.1: it pays only when heavy
    per-row work sits BEFORE the plan's first natural exchange (Q1-style
    map-side partial aggregation: -20%%; hash pipelines use their own
    fanout). Join-heavy plans feed a hash exchange immediately, so the
    extra roundRobin exchange is pure overhead (Q21 tripled: the three
    lineitem self-join branches each re-shuffled the full table; headline
    bench 14.9s -> 23.5s). Opt in per call site, don't default on.
    """
    _tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    cached = _schema_cache.get(path)
    if cached is None:
        df = spark.read.parquet(path)
        _schema_cache[path] = df.schema
    else:
        df = spark.read.schema(cached).parquet(path)
    if densify:
        worst, groups = _scan_shape(path)
        par = spark.sparkContext.defaultParallelism
        # fire only when the scan is BOTH dense (big row groups) and
        # under-parallel for this cluster — a well-laid-out source (>=
        # par/2 row groups) already scans wide, and the extra exchange
        # would carry the whole filtered table for nothing
        if worst >= _DENSIFY_MIN_ROWS and groups < max(2, par // 2):
            from pyspark.sql import functions as F

            # HASH repartition on a deterministic key, NOT round-robin
            # ``repartition(par)`` (optimization r15, guide §2.5): every
            # keyless repartition first pays a LOCAL SORT of its input
            # (sortBeforeRepartition) so retried tasks reproduce the same
            # row placement — and here the input is the single serial scan
            # task, so the whole table sorts in ONE task before fanning out
            # (measured at sf0.1: q1 1.16s round-robin vs 0.66s hashed).
            # The key is ``xxhash64(<leading column>)`` — the dumps this
            # trigger targets lead with their record key by convention
            # (doc_id / vec_id / event_id / l_orderkey ...), so the hash
            # spreads evenly; deterministic, so retries are safe without
            # the sort (SPARK-38388 does not apply) and — unlike a
            # synthetic monotonically_increasing_id key, which Catalyst
            # treats as nondeterministic — filters still PUSH THROUGH the
            # repartition to the parquet scan, and column pruning keeps
            # the scan narrow (hashing ALL columns was measured to widen
            # q1's ReadSchema from 7 to 11 columns and cost ~25%).
            # PushedFilters verified in plans/r15/tpch_q1_after.txt.
            # The leading-column convention is CHECKED, not assumed (r16,
            # VERDICT r15 item 8): footer stats must show enough distinct
            # values for the hash to spread evenly (guide §2.5: >= ~100x
            # the partition count). A flag/enum/constant leading column —
            # or one with no readable stats — falls back to the round-robin
            # form, which pays the local sort but can never collapse the
            # fan-out into a handful of partitions.
            if _leading_col_distinct_hint(path) >= 100 * par:
                df = df.repartition(par, F.xxhash64(F.col(df.columns[0])))
            else:
                df = df.repartition(par)
    return df


# Spill bookkeeping: one session-scoped root, per-spill subdirs tracked in
# FIFO order. A long-lived process re-running the registry must not accrete
# spill dirs monotonically (VERDICT r5), so dirs beyond the keep bound are
# reclaimed oldest-first. The consumer contract is "collect the returned
# DataFrame before running _spill_keep() more spilling queries" — trivially
# true for the external driver (collects each result before the next
# query) and for every local harness. A consumer that genuinely holds more
# results live raises the bound via PROTEUS_SPILL_KEEP; and a reclaimed
# dir is not silently emptied — it keeps one sentinel file whose NAME
# states the policy, so a late re-evaluation fails with an error that
# points at the fix instead of a bare missing-path (ADVICE r6).
_SPILL_KEEP_DEFAULT = 64
_RECLAIM_SENTINEL = "RECLAIMED-oldest-spill-beyond-keep-bound-raise-PROTEUS_SPILL_KEEP.txt"
# Sentinel dirs are themselves bounded (ADVICE r7): only the most recent
# reclaims keep their diagnostic marker — older ones are removed outright,
# so total directory count in a long-lived process stays <= keep bound +
# _SENTINEL_KEEP instead of growing one near-empty dir per reclaim.
_SENTINEL_KEEP = 8
_spill_root: str | None = None
_spill_dirs: list[str] = []
_sentinel_dirs: list[str] = []


def _spill_keep() -> int:
    try:
        return max(1, int(os.environ.get("PROTEUS_SPILL_KEEP", _SPILL_KEEP_DEFAULT)))
    except ValueError:
        return _SPILL_KEEP_DEFAULT


def _spill_dir() -> str:
    import atexit
    import shutil
    import tempfile
    import uuid

    global _spill_root
    if _spill_root is None:
        _spill_root = tempfile.mkdtemp(prefix="proteus_spill_")
        atexit.register(shutil.rmtree, _spill_root, ignore_errors=True)
    path = os.path.join(_spill_root, uuid.uuid4().hex)
    _spill_dirs.append(path)
    while len(_spill_dirs) > _spill_keep():
        old = _spill_dirs.pop(0)
        shutil.rmtree(old, ignore_errors=True)
        try:
            # leave a sentinel: a reader that re-evaluates a reclaimed
            # result gets a parquet-footer error NAMING this file (and
            # thus the policy + the env knob), not a bare missing path
            os.makedirs(old, exist_ok=True)
            with open(os.path.join(old, _RECLAIM_SENTINEL), "w") as fh:
                fh.write(
                    "This spill dir was reclaimed FIFO (keep bound "
                    f"{_spill_keep()}). Collect results before running more "
                    "spilling queries, or raise PROTEUS_SPILL_KEEP.\n"
                )
            _sentinel_dirs.append(old)
            while len(_sentinel_dirs) > _SENTINEL_KEEP:
                shutil.rmtree(_sentinel_dirs.pop(0), ignore_errors=True)
        except OSError:
            pass  # best-effort diagnostic only
    return path


def spill(df: DataFrame) -> DataFrame:
    """Materialize a query-harness result WITHOUT a driver round-trip.

    Harness queries that build state in temp dirs (streaming views, durable
    indexes) must return a DataFrame that outlives those dirs' cleanup. The
    banned shape is ``spark.createDataFrame(df.collect(), df.schema)`` — a
    full result pull through driver memory (VERDICT r4). Instead the result
    spills to a harness-owned parquet path (executor-parallel write) and
    the caller gets a plain scan. Spill dirs live under one session root,
    bounded FIFO at ``_SPILL_KEEP`` (oldest reclaimed), with the root
    atexit-cleaned."""
    path = _spill_dir()
    df.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    if not any(
        f.endswith(".parquet") or f.startswith("part-")
        for f in os.listdir(path)
        if not f.endswith(".crc")
    ):
        # zero-row result: parquet wrote no data files to infer from.
        # Only THIS case falls back to an empty frame — any other read
        # failure (permissions, corruption) must surface, not masquerade
        # as a plausible zero-row answer (ADVICE r5).
        return spark.createDataFrame([], df.schema)
    return spark.read.parquet(path)


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as TimestampNTZ plus ``ts_ns`` epoch-nanos long —
    the queryable-time view of the stream table. Handles both testdata
    vintages: TIMESTAMP(MICROS) parquet (reads as TimestampNTZ) and
    TIMESTAMP(NANOS) parquet (reads as epoch-nanos LongType under the
    nanosAsLong conf). DuckDB equivalents: ``CAST(ts AS TIMESTAMP)`` /
    ``epoch_ns(ts)`` — verified bit-identical under the UTC session TZ."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # legacy nanos-as-long layout
        return ev.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts",
            F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")).cast(
                "timestamp_ntz"
            ),
        )
    return ev.withColumn(
        "ts_ns", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


# Temp-view registration memo (optimization r15): ``createOrReplaceTempView``
# costs a catalog RPC + plan analysis (~20 ms) per table per query
# construction; a 6-table query pays ~130 ms per bench run re-registering
# views that already point at the identical DataFrame. The memo records,
# per live SparkSession, which (path, densify) each table-named view
# currently holds and skips the no-op re-registration. Any OTHER registrant
# of a session view (engine catalog API, topology builder) must call
# ``invalidate_view`` so a colliding name never serves a stale skip.
import weakref  # noqa: E402

_view_reg: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def table_view(
    spark: SparkSession, sf_dir: str, name: str, densify: bool = False
) -> None:
    """Register testdata table ``name`` as the temp view ``name``, skipping
    the re-registration when this session's view already binds the same
    (path, densify) through this helper."""
    key = (os.path.join(sf_dir, f"{name}.parquet"), densify)
    try:
        reg = _view_reg.setdefault(spark, {})
    except TypeError:  # un-weakref-able session stand-in: just register
        load(spark, sf_dir, name, densify=densify).createOrReplaceTempView(name)
        return
    if reg.get(name) == key:
        # cheap existence confirm before trusting the memo (ADVICE r15):
        # a view dropped outside the invalidate_view contract (foreign
        # code calling dropTempView) must re-register, not fail later
        # with a missing-view analysis error. Catalog lookup is a local
        # RPC, far cheaper than the plan analysis the memo elides.
        try:
            if spark.catalog.tableExists(name):
                return
        except Exception:
            pass  # catalog unavailable: fall through and re-register
        reg.pop(name, None)
    load(spark, sf_dir, name, densify=densify).createOrReplaceTempView(name)
    reg[name] = key


def invalidate_view(spark: SparkSession, name: str) -> None:
    """Forget the memoized binding for ``name`` (call after registering a
    same-named view outside ``table_view``)."""
    try:
        reg = _view_reg.get(spark)
    except TypeError:
        return
    if reg:
        reg.pop(name, None)


def register_sql(
    name: str,
    sql: str,
    tags: tuple[str, ...] = (),
    doc: str = "",
    spark_prelude: dict[str, Callable[[SparkSession, str], DataFrame]] | None = None,
    oracle_prelude: str = "",
    densify_tables: tuple[str, ...] = (),
):
    """Register a dialect-shared SQL query: the SAME SQL text runs through
    ``spark.sql`` (over temp views of the testdata tables) and through DuckDB
    as the oracle. Valid because the query sticks to the common dialect
    (ANSI joins/aggregates/windows, DECIMAL casts, DATE casts).

    ``spark_prelude`` registers extra derived temp views on the Spark side;
    ``oracle_prelude`` prepends CTE text on the DuckDB side (used when a
    derived view needs per-engine construction, e.g. nanos timestamps).

    DECIMAL convention: money aggregates are computed in DECIMAL, not
    DOUBLE — both engines then produce bit-identical results regardless of
    summation order (validated: TPC-H Q1 sums match to the last digit).
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        import re

        referenced = set(re.findall(r"[a-z_]+", sql))
        from proteus_spark import TABLES

        for t in TABLES:
            if t in referenced:
                table_view(spark, sf_dir, t, densify=t in densify_tables)
        for vname, builder in (spark_prelude or {}).items():
            builder(spark, sf_dir).createOrReplaceTempView(vname)
            invalidate_view(spark, vname)  # derived view shadows any table
        return spark.sql(sql)

    fn.__name__ = name
    fn.__doc__ = doc
    oracle = oracle_prelude + sql
    if oracle_prelude and sql.lstrip().upper().startswith("WITH "):
        # the prelude already opened a WITH clause: splice the query's own
        # CTE list onto it instead of emitting an invalid second WITH
        body = sql.lstrip()[5:]
        oracle = oracle_prelude.rstrip() + ",\n" + body
    QUERIES[name] = QuerySpec(
        fn=fn, oracle=oracle, tags=tags + ("shared-sql",), doc=doc
    )
    return fn


def _import_all() -> None:
    """Import every query module so decorators run (idempotent)."""
    from proteus_spark.queries import core  # noqa: F401

    for mod in ("sqlsurface", "tpch_full", "llm", "streaming"):
        try:
            __import__(f"proteus_spark.queries.{mod}")
        except ImportError:
            pass


# Verification-priority order. External harnesses that budget their checks
# walk queries() in dict order (first ~50), so the window rotates per round.
# Every registered query has accumulated at least one hash-green driver row
# (rounds 4-13 were all 50/50 green; the ledger recount at round-14 start —
# now mechanized as scripts/recount_ledger.py, VERDICT r13 #3 — found the
# oldest evidence to be the 26 r10-only queries below, exactly as
# ROTATION.md's precomputed plan expected). The ROUND-14 window fronts the
# changed-implementation streaming-view family (subscriber dispatch gained
# durable-vs-best-effort semantics and replayed epochs now skip derived
# recompute — ADVICE r13; three queries switched their cdf_exporter
# registration to durable=True), then the 26 r10-only cohort, then 9 more
# longest-idle r11-only fill. Queries rotated OUT remain covered by the
# local DuckDB oracle gate (tests/test_oracle_gate.py runs ALL oracled
# queries on every pytest) — see ROTATION.md for the manifest.
#
# HARD RULE (CORRECTNESS_r03 evidence): the driver records a RED
# `err: "no_oracle"` row for any window entry without an oracle — it does
# NOT fall back to rows-only checks. The first 50 names here must all have
# oracles; tests/test_oracle_gate.py::test_priority_window_all_oracled
# enforces this structurally.
PRIORITY: tuple[str, ...] = (
    # ================== ROUND-14 WINDOW (ROTATION.md plan) ==============
    # -- changed-implementation re-verification, fronted per the standing
    # rule. These three switched their CDF-export subscription to
    # durable=True (exporter errors now fail the micro-batch instead of
    # being swallowed — ADVICE r13 medium), so their driver rows hash the
    # new dispatch path end-to-end:
    "stream_cdf_export_roundtrip", "stream_compacted_bootstrap",
    "stream_view_dag_via_log",
    # -- the rest of the r11-only streaming-view family (SumView/JoinView
    # _merge_locked/_on_batch dispatch + replay-derived-skip changed this
    # round; these drive those exact code paths under the oracle):
    "stream_sum_view", "stream_sum_view_broker", "stream_sum_view_cdc",
    "stream_sum_view_deletes", "stream_sum_view_minilog",
    "stream_sum_view_timetravel", "stream_join_view",
    "stream_join_view_deletes",
    # -- r11-only ingest gates (foreachBatch + maintained-lake readers;
    # llmops/lake.py's sidecar commit turned atomic this round):
    "stream_ann_ingest", "stream_decontaminate", "stream_dedup_ingest",
    "stream_quality_gate",
    # -- 26 r10-only refreshes (the oldest external evidence; recounted
    # from the CORRECTNESS_r01..r13 artifacts at round-14 start with
    # scripts/recount_ledger.py — matches ROTATION.md's precomputed plan
    # and VERDICT r13's list exactly) ------------------------------------
    "agg_bloom_probe", "agg_full", "agg_grouping_sets",
    "agg_histogram_sketch", "basket_part_pairs", "cube_flag_status",
    "dq_skew_report", "dq_validate_orders", "events_anomaly_zscore",
    "events_cohort_retention", "events_ewma_daily", "events_funnel",
    "events_gap_fill_hourly", "events_rollup_multigrain",
    "events_sessionization", "events_sliding_2h", "events_tumbling_hourly",
    "groupby_having", "llm_bm25_search", "llm_corpus_stats", "llm_lang_id",
    "llm_token_stats", "range_join_events", "scd2_temporal_join",
    "semi_join_exists", "window_lag_delta",
    # -- 9 more r11-only fill: the changed-impl pair first — VERDICT r13
    # #5's profiling landed a jaccard_pairs(pre_restricted=True) change
    # (minhash_lsh_dedup skips the verify stage's redundant second
    # semi-join restriction; measured 15-20% faster, results identical,
    # re-gated hash-green at sf0.001+sf0.01), and llm_lsh_recall_report
    # rides the same pipeline — then longest-idle alphabetical ----------
    "llm_dedup_minhash_lsh", "llm_lsh_recall_report",
    "agg_countmin_terms", "agg_hll_rollup", "customer_value_deciles",
    "graph_pagerank_parts", "llm_chunk_documents", "llm_cluster_audit",
    "llm_corpus_mixture",
)


def _ordered() -> dict[str, QuerySpec]:
    _import_all()
    out: dict[str, QuerySpec] = {}
    for name in PRIORITY:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, spec in QUERIES.items():
        if name not in out:
            out[name] = spec
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracles() -> dict[str, str]:
    out = {}
    for name, spec in _ordered().items():
        sql = spec.resolve_oracle()
        if sql is not None:
            out[name] = sql
    return out
