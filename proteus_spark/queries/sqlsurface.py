"""Extended ad-hoc SQL surface — SURVEY §2.2-2.7 "Spark gives it free" set.

The reference's parser accepts only single-table SELECT + AND-ed predicates
+ ORDER BY + LIMIT (internal/sqlparser/sqlparse.go:102-124; GROUP BY is a
silent no-op at sqlparse.go:216-221, JOIN syntax rejected at
sqlparse.go:188-197). SURVEY §2 directs the new engine to expose the full
Spark SQL surface since it is free; these queries pin that surface down
with oracle checks: aggregates, grouping sets, windows, set ops, pivot,
semi/anti joins, scalar functions, JSON access, sessionization, as-of join.

Most entries are dialect-shared SQL (see registry.register_sql): the same
text runs on Spark and DuckDB, with money math in DECIMAL so both engines
agree bit-for-bit. DataFrame-API showcases (window/pivot/setops/asof) keep
separate Spark implementations with a matching oracle.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from proteus_spark.plans.ckpt import release as release_checkpoint
from proteus_spark.registry import (
    events_with_ts,
    load,
    register,
    register_sql,
    table_rows,
    table_view,
)

# Shared DECIMAL fragments (validated bit-exact across engines).
DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
CHARGE = f"{DISC_PRICE} * (1 + CAST(l_tax AS DECIMAL(18,2)))"

# DuckDB-side derivation of the nanos-timestamp events view; the Spark side
# registers the same view from registry.events_with_ts (see register_sql).
EVENTS_NS_ORACLE = (
    "WITH events_ns AS (SELECT event_id, user_id, event_type, value, props, "
    "epoch_ns(ts) AS ts_ns, CAST(ts AS TIMESTAMP) AS ts FROM events)\n"
)


def _events_ns(spark, sf_dir):
    return events_with_ts(spark, sf_dir)


EVENTS_PRELUDE = {"events_ns": _events_ns}


# ---------------------------------------------------------------------------
# Aggregation surface (SURVEY §2.4 — beyond the reference's sum-only enum)
# ---------------------------------------------------------------------------

register_sql(
    "agg_full",
    f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
           CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
             / count(*) AS avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate",),
    doc="COUNT/COUNT DISTINCT/SUM/MIN/MAX/AVG — the aggregate surface the "
    "reference lacks (only Sum exists in its enum, types.go:188-194).",
)

register_sql(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum({DISC_PRICE}) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(sum({CHARGE}) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
             / count(*) AS avg_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
             / count(*) AS avg_price,
           CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
             / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "tpch", "bench"),
    doc="TPC-H Q1 pricing summary over the driver testdata: scan + "
    "filter + 8-aggregate groupBy; partial aggregation collapses rows "
    "map-side so the exchange carries only #groups x #tasks rows. "
    "lineitem is densified (single-row-group file -> serial scan): the "
    "DECIMAL partial aggregation is the heavy pre-exchange work, and "
    "spreading it measured -18%; join-shaped queries skip densify (their "
    "next operator is an exchange anyway, measured regression).",
    densify_tables=("lineitem",),
)

register_sql(
    "tpch_q6",
    f"""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    tags=("aggregate", "tpch", "bench"),
    doc="TPC-H Q6 forecast-revenue: pure scan+filter+sum; every predicate "
    "reaches the parquet scan (PushedFilters) so row groups skip.",
)

register_sql(
    "groupby_having",
    f"""
    SELECT l_orderkey, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    """,
    tags=("aggregate",),
    doc="HAVING over a grouped sum (TPC-H Q18 inner shape).",
)

# rollup_flag_status RETIRED round 6 (registry hygiene, VERDICT r5 #8):
# CUBE's grouping sets are a strict superset of ROLLUP's over the same
# keys, so cube_flag_status subsumes the retired query's coverage.
register_sql(
    "cube_flag_status",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate",),
    doc="CUBE grouping sets (SURVEY §2.4: free in Spark, absent in the "
    "reference); carries the retired ROLLUP query's count column so the "
    "merged check keeps both aggregates.",
)


# ---------------------------------------------------------------------------
# Join surface (SURVEY §2.3 — beyond the reference's single keyed merge)
# ---------------------------------------------------------------------------

register_sql(
    "tpch_q3",
    f"""
    SELECT l_orderkey,
           CAST(CAST(sum({DISC_PRICE}) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15' AND l_shipdate > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("join", "tpch", "bench"),
    doc="TPC-H Q3 shipping-priority: 3-way join + agg + top-10. customer "
    "is dim-sized -> Catalyst broadcasts it; the orders-lineitem join "
    "shuffles on the order key.",
)

register_sql(
    "tpch_q5",
    f"""
    SELECT n_name,
           CAST(CAST(sum({DISC_PRICE}) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
    tags=("join", "tpch", "bench"),
    doc="TPC-H Q5 local-supplier revenue: 6-way join chain; all dims "
    "broadcast, fact tables shuffle once on the order key.",
)

register_sql(
    "semi_join_exists",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    tags=("join",),
    doc="EXISTS -> left-semi join (SURVEY §2.3: absent in reference; "
    "Spark plans a broadcast/shuffled semi join, never a full materialize).",
)

register_sql(
    "anti_join_not_exists",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
    doc="NOT EXISTS -> left-anti join.",
)


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------

register_sql(
    "setops_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setops",),
    doc="INTERSECT (free in Spark; reference has only the router's bag "
    "UNION ALL — router.go:43-78).",
)

register_sql(
    "setops_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setops",),
    doc="EXCEPT.",
)

# distinct_segments RETIRED in round 5 (VERDICT r4 #8 registry hygiene):
# a bare two-column DISTINCT adds no information beyond the DISTINCT
# shapes already inside setops_except/intersect and a dozen dedup
# queries, and every registered query costs a rotation slot. The operator
# itself (hash aggregate, map-side partial distinct) stays covered by
# those queries' plans.


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.6: none in reference; pyspark.sql.Window)
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS BIGINT) AS rn
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part)
    WHERE rn <= 3
    """,
    tags=("window",),
)
def window_topk_per_group(spark, sf_dir):
    """Top-k per group via ranking window — the per-group generalization of
    the reference's global ORDER BY+LIMIT top-k (sqlparser_test.go:42-56).
    Plans as a single shuffle on the partition key with running-window
    ranking; no self-join."""
    part = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", F.col("rn").cast("long").alias("rn"))
    )


# window_running_sum RETIRED round 6 (registry hygiene, VERDICT r5 #8):
# the running-aggregate frame it exercised now rides window_lag_delta
# below (same window spec family over events), and the DECIMAL-exact
# cumulative-sum frame shape remains covered by events_ewma_daily /
# customer_value_deciles.
@register(
    "window_lag_delta",
    oracle=EVENTS_NS_ORACLE
    + """
    SELECT event_id, user_id, value,
           value - lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts_ns, event_id) AS delta,
           CAST(count(*) OVER (PARTITION BY user_id
                               ORDER BY ts_ns, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS seq
    FROM events_ns
    """,
    tags=("window",),
)
def window_lag_delta(spark, sf_dir):
    """lag()-based per-user delta over event time, plus a running count
    frame (absorbs the retired window_running_sum's UNBOUNDED
    PRECEDING..CURRENT ROW coverage with an exact-integer accumulator).
    Subtraction of identical doubles is deterministic — no rounding."""
    ev = events_with_ts(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.count(F.lit(1))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("seq"),
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    tags=("pivot",),
)
def pivot_event_counts(spark, sf_dir):
    """groupBy().pivot() with an explicit value list (explicit values keep
    the plan a single pass — no extra distinct-scan job — and make the
    output schema deterministic)."""
    ev = load(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    cols = [F.col("user_id")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES
    ]
    return out.select(*cols)


# ---------------------------------------------------------------------------
# Scalar functions / JSON (SURVEY §2.10: reference has none)
# ---------------------------------------------------------------------------

register_sql(
    "scalar_functions",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           abs(p_size - 25) AS size_dist,
           CAST(round(p_retailprice / 10, 1) * 10 AS DOUBLE) AS price_bucket
    FROM part
    """,
    tags=("scalar",),
    doc="Scalar string/math pass-through (SURVEY §2.10: the reference "
    "query language has zero scalar functions; the full "
    "pyspark.sql.functions namespace comes free).",
)


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    tags=("scalar",),
)
def json_extract_props(spark, sf_dir):
    """JSON attribute access on the semi-structured props column — the
    uninterpreted-payload part of the reference object model
    (Documentation.md:23-33) made queryable."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


# ---------------------------------------------------------------------------
# Event-time queries: tumbling window, sessionization, as-of join
# ---------------------------------------------------------------------------


@register(
    "events_tumbling_hourly",
    oracle=EVENTS_NS_ORACLE
    + """
    SELECT CAST(date_trunc('hour', ts) AS DATE) AS day,
           EXTRACT(hour FROM date_trunc('hour', ts)) AS hour,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS value_sum
    FROM events_ns
    GROUP BY 1, 2, 3
    """,
    tags=("event-time",),
)
def events_tumbling_hourly(spark, sf_dir):
    """Tumbling-window aggregate (batch semantics of the streaming windowed
    agg; SURVEY §2.9 notes the reference has no event-time windows at all —
    this is the Spark-native upgrade)."""
    ev = events_with_ts(spark, sf_dir)
    bucket = F.date_trunc("hour", F.col("ts"))
    return ev.groupBy(
        bucket.cast("date").alias("day"),
        F.hour(bucket).cast("int").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(38,6)").cast("double").alias("value_sum"),
    )


@register(
    "events_sessionization",
    oracle=EVENTS_NS_ORACLE
    + """
    SELECT user_id, CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts_ns, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT user_id, ts_ns, event_id,
               CASE WHEN ts_ns - lag(ts_ns) OVER (PARTITION BY user_id
                                                  ORDER BY ts_ns, event_id)
                         > 1800000000000 OR
                         lag(ts_ns) OVER (PARTITION BY user_id
                                          ORDER BY ts_ns, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events_ns))
    GROUP BY user_id
    """,
    tags=("event-time",),
)
def events_sessionization(spark, sf_dir):
    """Sessionization: 30-minute inactivity gap -> new session, counted per
    user. lag + cumulative-sum window composition; one shuffle on user_id
    shared by both windows."""
    ev = events_with_ts(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap_ns = 30 * 60 * 1_000_000_000
    prev = F.lag("ts_ns").over(w)
    is_new = F.when(prev.isNull() | ((F.col("ts_ns") - prev) > gap_ns), 1).otherwise(0)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@register(
    "asof_join_latest_order",
    oracle=EVENTS_NS_ORACLE
    + """
    SELECT event_id, user_id, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate
    FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM (SELECT event_id, user_id, ts FROM events_ns
            WHERE event_type = 'purchase') e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    WHERE rn = 1
    """,
    tags=("event-time", "join", "bench"),
)
def asof_join_latest_order(spark, sf_dir):
    """As-of join (SURVEY §2.3: no as-of join exists in the reference OR in
    stock Spark): for each purchase event, the latest order of the same
    customer at event time. Implemented as equi-join on the entity key +
    time filter + argmax window — fully declarative, so Catalyst broadcasts
    the small side and prunes columns. Per-key order cardinality is bounded
    (orders/customer), so the intermediate stays linear; for unbounded
    histories the operators.asof merge-asof path applies."""
    ev = (
        events_with_ts(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    o = load(spark, sf_dir, "orders")
    joined = ev.join(
        o,
        (o.o_custkey == ev.user_id) & (o.o_orderdate <= ev.ts),
        "inner",
    )
    w = W.partitionBy("event_id").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
    )


@register(
    "range_join_events",
    oracle=EVENTS_NS_ORACLE
    + """
    SELECT a.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_pairs
    FROM events_ns a JOIN events_ns b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(a.ts_ns - b.ts_ns) <= 600000000000
    GROUP BY a.user_id
    """,
    tags=("join", "range"),
)
def range_join_events(spark, sf_dir):
    """Range join (the brief's custom-operator list; absent from the
    reference AND from stock Spark's equi-join fast paths): per-user count
    of event pairs within 10 minutes of each other. The operator
    bucketizes time so the theta predicate becomes an equi-join on
    (key, bucket) with a 3-bucket explode on one side — one hash shuffle,
    never a per-key cross product; the oracle states the same semantics
    as a plain theta join."""
    from proteus_spark.operators.join import range_join_pairs

    ev = events_with_ts(spark, sf_dir).select("user_id", "event_id", "ts_ns")
    pairs = range_join_pairs(
        ev, key="user_id", ts_col="ts_ns", radius=600_000_000_000,
        id_col="event_id",
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


register_sql(
    "events_rollup_multigrain",
    """
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS value_sum
    FROM events_ns
    GROUP BY GROUPING SETS (
      (date_trunc('month', ts)),
      (date_trunc('month', ts), date_trunc('day', ts))
    )
    """,
    tags=("event-time", "rollup"),
    spark_prelude=EVENTS_PRELUDE,
    oracle_prelude=EVENTS_NS_ORACLE,
    doc="Hypertable-style continuous-aggregate rollup: day and month "
    "grains in ONE grouping-sets pass (Spark computes the finest grain "
    "and rolls partials up — at scale this is the incremental-rollup "
    "cascade, each coarser grain aggregating the finer one's partials, "
    "never rescanning the base table).",
)


register_sql(
    "events_cohort_retention",
    """
    WITH weeks AS (
      SELECT DISTINCT user_id,
             CAST(floor(ts_ns / 604800000000000.0) AS BIGINT) AS w
      FROM events_ns),
    cohort AS (SELECT user_id, min(w) AS c FROM weeks GROUP BY user_id)
    SELECT c AS cohort_week, w - c AS week_offset,
           CAST(count(*) AS BIGINT) AS users
    FROM weeks JOIN cohort USING (user_id)
    GROUP BY c, w - c
    """,
    tags=("event-time", "retention"),
    spark_prelude=EVENTS_PRELUDE,
    oracle_prelude=EVENTS_NS_ORACLE,
    doc="Weekly cohort-retention matrix: distinct (user, week) activity, "
    "cohort = first active week, count per (cohort, offset). Week indexes "
    "are epoch-nanos arithmetic (shared dialect, no per-engine date-diff "
    "quirks); two map-side-combined aggregations and one equi-join on the "
    "already-deduplicated (user, week) relation.",
)


_FUNNEL_BODY = """
s1 AS (SELECT user_id, min(ts_ns) AS t1
       FROM events_ns WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts_ns) AS t2
       FROM events_ns e JOIN s1 ON e.user_id = s1.user_id
        AND e.ts_ns > s1.t1 AND e.ts_ns <= s1.t1 + 604800000000000
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts_ns) AS t3
       FROM events_ns e JOIN s2 ON e.user_id = s2.user_id
        AND e.ts_ns > s2.t2 AND e.ts_ns <= s2.t2 + 604800000000000
       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS users FROM s1
UNION ALL
SELECT 'view>click' AS stage, CAST(count(*) AS BIGINT) AS users FROM s2
UNION ALL
SELECT 'view>click>purchase' AS stage, CAST(count(*) AS BIGINT) AS users
FROM s3
"""


@register(
    "events_funnel",
    oracle=lambda: EVENTS_NS_ORACLE.rstrip() + ",\n" + _FUNNEL_BODY,
    tags=("event-time", "funnel"),
)
def events_funnel(spark, sf_dir):
    """Ordered-conversion funnel (view -> click -> purchase, 7-day step
    windows): min-timestamp chaining — each stage is one groupBy-min plus
    an equi-join on user_id with a range residual, so cost is three
    map-side-combined aggregations over ever-shrinking user sets; no
    window sort, no per-user event materialization. The product-analytics
    companion to events_sessionization. Stage SQL is shared verbatim with
    the oracle (only the events_ns view construction differs per engine)."""
    _events_ns(spark, sf_dir).createOrReplaceTempView("events_ns")
    return spark.sql("WITH " + _FUNNEL_BODY)


@register(
    "agg_percentiles",
    oracle="""
    WITH events_ns AS (SELECT event_type, value FROM events)
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events_ns GROUP BY event_type
    """,
    tags=("aggregate",),
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: both linear-interpolate between order
    statistics). The streaming/sketch variant is percentile_approx /
    t-digest — exposed separately because approximations can't
    oracle-match."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# TPC-H extension pack (adapted to the driver schema: no shipmode /
# commitdate / receiptdate / partsupp columns — each adaptation keeps the
# original query's PLAN SHAPE, which is what the scale argument is about)
# ---------------------------------------------------------------------------

register_sql(
    "tpch_q4",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q4 shape (EXISTS decorrelated to a left-semi join; the "
    "commitdate<receiptdate predicate becomes a discount predicate on the "
    "driver schema). Catalyst plans semi-join + partial agg — no "
    "per-order subquery execution.",
)

register_sql(
    "tpch_q10",
    f"""
    SELECT c.c_custkey, c.c_name,
           CAST(CAST(sum({DISC_PRICE}) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("tpch", "join", "bench"),
    doc="TPC-H Q10 returned-item revenue: 3-way join with two broadcast "
    "sides (customer filtered late, nation tiny), agg on custkey, top-20 "
    "via TakeOrderedAndProject.",
)

register_sql(
    "tpch_q12",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q12 shape (shipmode group becomes returnflag on the driver "
    "schema): join + conditional-sum pivoting priorities into columns.",
)

register_sql(
    "tpch_q14",
    f"""
    SELECT round(
      100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE}
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,4)) AS DOUBLE)
            / CAST(CAST(sum({DISC_PRICE}) AS DECIMAL(38,4)) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-02-01'
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q14 promo revenue percentage: broadcast join to part, "
    "conditional DECIMAL sums, final scalar division in DOUBLE (decimal "
    "division scale rules differ across engines; the sums stay exact).",
)

register_sql(
    "tpch_q18",
    """
    SELECT c.c_name, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(CAST(t.total_qty AS DECIMAL(38,2)) AS DOUBLE) AS total_qty
    FROM (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    ) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q18 large-volume orders: HAVING-filtered agg drives the "
    "join (small build side after filter), top-100 by order value.",
)

register_sql(
    "tpch_q19",
    f"""
    SELECT CAST(CAST(sum({DISC_PRICE}) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q19 disjunctive-predicate revenue (container terms dropped "
    "for the driver schema): the OR-of-conjunctions stays a single "
    "broadcast-join pass; the l_quantity disjuncts can't prune the scan "
    "but the p_brand IN-set implied by the OR does reach the part side.",
)


# -- Deterministic HLL: md5-register sketch, identical in both engines ----
#
# Spark's approx_count_distinct / hll_sketch_agg are engine-specific
# (HyperLogLog++ implementation details + Datasketches binary registers),
# so for 7 rounds these two queries were the registry's only rows-only
# checks. VERDICT r7 #4: replace the opaque sketch with a PURE DATA
# FUNCTION — classic HyperLogLog over the portable md5 hash family
# (functions/texthash.py), every step expressible identically in Spark SQL
# and DuckDB:
#   register  = first 3 hex chars of md5('hll|' || value)  mod m
#   rho       = leading-zero bits of the next 12 hex chars (48 bits) + 1,
#               computed by STRING ops (strip leading '0' chars, CASE on
#               the first surviving nibble) — no float log2 at the bit
#               boundary, so both engines agree exactly
#   estimate  = alpha_m * m^2 / sum(2^-M_j)  with linear-counting
#               correction below 2.5m (Flajolet et al.), where the
#               harmonic sum is computed EXACTLY as a BIGINT in units of
#               2^-49 (every term 2^(49-rho) is an integer; empty
#               registers contribute 2^49) — summation order cannot
#               perturb it, unlike a double sum under shuffle.
# The estimate is a deterministic function of the value SET, so the DuckDB
# oracle hash-checks it; the error bound vs the exact count stays asserted
# in-query as the semantic floor (a broken sketch that both engines agree
# on must still fail loudly).

_HLL_M = 1024  # 2^10 registers: rsd = 1.04/sqrt(m) ~ 3.25%


def _hll_sketch_ctes(m: int, grp_expr: str, val_expr: str, rel: str) -> str:
    """CTE chain ``hx, rr, regs`` computing per-(grp, reg) max rho — the
    sketch's register table (at scale: one codegen hash pass, then a
    (grp, reg)-keyed partial max whose exchange carries <= m rows per
    group, never the distinct values themselves)."""
    from proteus_spark.functions.texthash import hex_slice_to_long_sql

    rho = (
        "CASE WHEN rest = '' THEN 49 "
        "ELSE (12 - length(rest)) * 4 "
        "+ (CASE WHEN substr(rest, 1, 1) IN "
        "('8','9','a','b','c','d','e','f') THEN 0 "
        "WHEN substr(rest, 1, 1) IN ('4','5','6','7') THEN 1 "
        "WHEN substr(rest, 1, 1) IN ('2','3') THEN 2 ELSE 3 END) + 1 END"
    )
    return f"""
    hx AS (SELECT {grp_expr} AS grp,
                  md5('hll|' || CAST({val_expr} AS STRING)) AS h
           FROM {rel}),
    rr AS (SELECT grp, ({hex_slice_to_long_sql('h', 1, 3)}) % {m} AS reg,
                  regexp_replace(substr(h, 4, 12), '^0*', '') AS rest
           FROM hx),
    regs AS (SELECT grp, reg, max({rho}) AS mx
             FROM rr GROUP BY grp, reg)"""


def _hll_estimate_sql(m: int, regs_rel: str) -> str:
    """SELECT grp, est FROM the register table: exact BIGINT harmonic sum
    (units of 2^-49), then ONE double division + the linear-counting
    branch, rounded to 4 decimals on both engines."""
    alpha = 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * float(2**49)  # one Python double, same literal
    return f"""
    SELECT grp,
           round(CASE WHEN ({m} - cnt) > 0
                       AND {num!r} / CAST(ssc AS DOUBLE) <= {2.5 * m!r}
                      THEN CAST({m} AS DOUBLE)
                           * ln(CAST({m} AS DOUBLE) / ({m} - cnt))
                      ELSE {num!r} / CAST(ssc AS DOUBLE) END, 4) AS est
    FROM (SELECT grp, count(*) AS cnt,
                 CAST(sum(CAST(pow(2.0, 49 - mx) AS BIGINT))
                      + ({m} - count(*)) * {2**49} AS BIGINT) AS ssc
          FROM {regs_rel} GROUP BY grp)"""


# agg_approx_distinct RETIRED round 11 (the subsumption audit ROTATION.md
# banked for the round-10 post-freeze stream_lsh_dedup_ingest): it was the
# same `_hll_sketch_ctes(_HLL_M, key, "l_orderkey", "lineitem")` +
# `_hll_estimate_sql(_HLL_M, "regs")` template that agg_hll_rollup's
# regs/mest CTEs instantiate VERBATIM — same m, same value column, same
# table, same in-query 3-sigma assertion — differing only in the group-key
# expression (raw l_returnflag vs substr of shipdate; a key choice, not
# unique logic). Both were shared-SQL queries (spark.sql(<oracle text>)),
# so each driver hash checked cross-engine SQL agreement on the SAME
# template; the rollup additionally hash-checks the register-wise-max
# union algebra, which approx_distinct lacked. The independent
# verification that the shared text implements the HLL SPEC lives in the
# r10 pure-Python pin, now repointed at the rollup and extended to the
# union path (tests/test_empty_inputs.py::
# test_hll_estimate_matches_pure_python_reference). Same precedent as the
# r10 llm_bpe_encode -> llm_bpe_encode_holdout retirement (shared-fold
# template, superset instantiation survives). Audit counterparts both
# REPRIEVED: graph_pagerank_parts is NOT subsumed by _converged — power
# iteration forgets its initialization, so a Spark-side r0/early-round bug
# reaches the same quantized fixpoint and the converged hash stays green,
# while the fixed-3 hash uniquely pins r0 = 1.0 and the exact
# iteration-count semantics of the shared _pagerank_step; and the
# llm_dedup_ngram_capped reprieve stands — it remains the SOLE value-level
# hash of the rare-shingle cap mechanics (groupBy(s).count() <= cap
# semi-join, cap 50) that the r9 containment_capped retirement rationale
# leans on (llm_dedup_containment stays registered but uncapped).


@register(
    "events_sliding_2h",
    oracle=EVENTS_NS_ORACLE
    + """
    , slid AS (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS w_start,
             event_type, value
      FROM events_ns)
    SELECT CAST(w_start AS TIMESTAMP) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS value_sum
    FROM slid
    GROUP BY 1, 2
    """,
    tags=("event-time",),
)
def events_sliding_2h(spark, sf_dir):
    """Sliding-window aggregate (2h window, 1h slide): each event lands in
    two overlapping windows via F.window's generator — the batch semantics
    of the streaming sliding-window agg. Oracle reproduces the window
    assignment with explicit window-start arithmetic."""
    ev = events_with_ts(spark, sf_dir)
    win = F.window(F.col("ts"), "2 hours", "1 hour")
    return ev.groupBy(
        win.start.alias("window_start"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(38,6)").cast("double").alias("value_sum"),
    )


_HLL_ROLLUP_SQL = f"""
    WITH {_hll_sketch_ctes(_HLL_M,
                           "substr(CAST(l_shipdate AS STRING), 1, 7)",
                           "l_orderkey", "lineitem")},
    mest AS ({_hll_estimate_sql(_HLL_M, "regs")}),
    uregs AS (SELECT 'ALL' AS grp, reg, max(mx) AS mx
              FROM regs GROUP BY reg),
    uest AS ({_hll_estimate_sql(_HLL_M, "uregs")}),
    ex AS (SELECT substr(CAST(l_shipdate AS STRING), 1, 7) AS grp,
                  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_month
           FROM lineitem GROUP BY 1),
    ext AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_total
            FROM lineitem)
    SELECT ex.grp AS month, mest.est AS month_estimate, ex.exact_month,
           uest.est AS merged_estimate, ext.exact_total
    FROM mest JOIN ex ON ex.grp = mest.grp
    CROSS JOIN uest CROSS JOIN ext
"""


@register(
    "agg_hll_rollup",
    oracle=_HLL_ROLLUP_SQL,
    tags=("aggregate", "approx", "sketch"),
)
def agg_hll_rollup(spark, sf_dir):
    """MERGEABLE sketch rollup, HASH-ORACLED (r8 promotion — VERDICT r7
    #4): per-month md5-register sketches union into a total-period
    distinct estimate WITHOUT re-touching the raw data — union is the
    register-wise max, commutative and idempotent, so the rollup is
    partitioning-independent; the oracle hash-checks the union algebra
    itself (merged_estimate rides every row next to each month's). At
    100 TB this is the difference between a daily-materialized KB-sized
    register table answering any date-range distinct query, and a
    full-corpus re-scan per query. The merged-vs-exact 3-sigma bound is
    asserted in-query as the semantic floor."""
    table_view(spark, sf_dir, "lineitem")
    out = spark.sql(_HLL_ROLLUP_SQL)
    row = out.limit(1).collect()
    if row:  # empty input has nothing to bound (and no rows to return)
        m, e = row[0]["merged_estimate"], row[0]["exact_total"]
        assert abs(m - e) / e <= 0.10, f"merged sketch {m} vs exact {e}"
    return out


_HIST_BIN_W = 25.0


@register(
    "agg_histogram_sketch",
    oracle=EVENTS_NS_ORACLE
    + f"""
    , part AS (
      SELECT strftime(ts, '%Y-%m') AS month, event_type,
             CAST(floor(value / {_HIST_BIN_W}) AS BIGINT) AS bin,
             count(*) AS cnt
      FROM events_ns GROUP BY 1, 2, 3),
    merged AS (
      SELECT event_type, bin, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM part GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM merged)
    SELECT event_type, bin, CAST(bin * {_HIST_BIN_W} AS DOUBLE) AS bin_lo, cnt,
           CAST(cum AS BIGINT) AS cum,
           CAST((2 * cum >= total AND 2 * (cum - cnt) < total)
                AS INTEGER) AS is_p50
    FROM cum
    """,
    tags=("aggregate", "sketch"),
)
def agg_histogram_sketch(spark, sf_dir):
    """MERGEABLE fixed-bin histogram sketch rollup — the exactly-checkable
    companion to the HLL rollup: per-(event_type, month) value histograms
    (bin = floor(value/25)) merge by bin-wise addition into per-type
    histograms, and quantile estimates read straight off the cumulative
    counts WITHOUT re-touching raw events. At 100 TB the monthly partial
    is the materialization unit: any date-range quantile/distribution
    query is then a KB-scale merge. Bin counts are integers end-to-end
    and the p50-bin marker uses only integer comparisons (2*cum vs
    total), so — unlike HLL's engine-specific registers — a full DuckDB
    oracle checks every row. Merge is commutative/associative, so the
    rollup is partitioning-independent; the ranking window runs per
    event_type over ~value_range/bin_width rows, never over raw data."""
    ev = events_with_ts(spark, sf_dir)
    part = ev.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month"),
        "event_type",
        F.floor(F.col("value") / _HIST_BIN_W).cast("long").alias("bin"),
    ).agg(F.count("*").alias("cnt"))
    merged = part.groupBy("event_type", "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    w_cum = (
        W.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_tot = W.partitionBy("event_type")
    cum = merged.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_tot)
    )
    return cum.select(
        "event_type",
        "bin",
        (F.col("bin") * _HIST_BIN_W).alias("bin_lo"),
        "cnt",
        F.col("cum").cast("long").alias("cum"),
        (
            (2 * F.col("cum") >= F.col("total"))
            & (2 * (F.col("cum") - F.col("cnt")) < F.col("total"))
        )
        .cast("integer")
        .alias("is_p50"),
    )


register_sql(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
    tags=("aggregate",),
    doc="Explicit GROUPING SETS — the general form behind ROLLUP/CUBE, "
    "with an asymmetric set list neither shortcut can express (SURVEY "
    "§2.4: free in Spark, absent in the reference).",
)


register_sql(
    "events_anomaly_zscore",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events_ns GROUP BY CAST(ts AS DATE), event_type),
    scored AS (
      SELECT CAST(d AS STRING) AS day, event_type, n,
             round((n - avg(n) OVER (PARTITION BY event_type))
                   / stddev_samp(n) OVER (PARTITION BY event_type), 6) AS z
      FROM daily)
    SELECT day, event_type, n, z
    FROM scored WHERE abs(z) > 2
    """,
    spark_prelude=EVENTS_PRELUDE,
    oracle_prelude=EVENTS_NS_ORACLE,
    tags=("events", "window", "anomaly"),
    doc="Daily per-type volume anomalies: z-score of each day's event count "
    "against that type's distribution, flagging |z| > 2 days — the ops "
    "monitoring query every event pipeline runs. Window aggregates per "
    "type (map-side partial count, one exchange on (date, type), then a "
    "per-type window over the tiny daily rollup).",
)


# scd2_user_value_history RETIRED round 7 (registry hygiene, VERDICT r6
# #7 — one banked retirement per round-7 addition): scd2_temporal_join's
# `hist` CTE RECOMPUTES the identical SCD2 interval build (same lead()
# over (user_id ORDER BY ts_ns, event_id) on the purchase feed, same
# +inf open-interval close), then additionally checks its point-in-
# interval consumption — the llm_dedup_simhash -> simhash_pairs
# subsumption precedent. The streaming SCD2 build stays independently
# verified by stream_scd2_history (whose oracle is the same window
# build).


register_sql(
    "window_rank_family",
    """
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist() OVER w, 6) AS cdist,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
    doc="The complete ranking-function family over per-customer order "
    "spend: rank/dense_rank/percent_rank/cume_dist/ntile share one window "
    "spec (one exchange + one sort; deterministic tie-breaks make every "
    "function hash-stable).",
)


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'qty' AS measure,
           CAST(l_quantity AS DOUBLE) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', CAST(l_extendedprice AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc', CAST(l_discount AS DOUBLE)
    FROM lineitem
    """,
    tags=("sql-surface",),
)
def unpivot_lineitem_measures(spark, sf_dir):
    """UNPIVOT (wide -> long) via stack — the inverse of
    pivot_event_counts, completing the reshape pair; a generator
    projection (no shuffle, no UDF), 3 long rows per input row."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'qty', CAST(l_quantity AS DOUBLE), "
            "'price', CAST(l_extendedprice AS DOUBLE), "
            "'disc', CAST(l_discount AS DOUBLE)) AS (measure, val)"
        ),
    )


_EWMA_ALPHA = 0.3


@register(
    "events_ewma_daily",
    oracle=EVENTS_NS_ORACLE
    + f"""
    , daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events_ns GROUP BY 1, 2),
    seq AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY d) - 1 AS i
      FROM daily),
    acc AS (
      SELECT *,
             sum(n * power(1 - {_EWMA_ALPHA}, -i))
               OVER (PARTITION BY event_type ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      FROM seq)
    SELECT strftime(d, '%Y-%m-%d') AS day, event_type, n,
           round({_EWMA_ALPHA} * power(1 - {_EWMA_ALPHA}, i) * s
                 + power(1 - {_EWMA_ALPHA}, i + 1)
                   * first_value(n) OVER (PARTITION BY event_type ORDER BY i),
                 6) AS ewma
    FROM acc
    """,
    tags=("event-time", "window"),
)
def events_ewma_daily(spark, sf_dir):
    """Exponentially-weighted moving average of daily event volume per
    type — the smoothing companion to the z-score anomaly query. The
    recurrence ewma_t = a*x_t + (1-a)*ewma_{{t-1}} (seeded with x_0)
    unrolls into ONE closed-form window expression:
    a * (1-a)^t * sum(x_i * (1-a)^(-i)) + (1-a)^(t+1) * x_0 — a running
    sum plus first_value, both over the same per-type window, so the
    whole series computes in one pass with no recursion or UDF. The
    (1-a)^(-i) weights stay tiny here (~30 daily points per type;
    (1/0.7)^30 ≈ 4e4 — far inside double range); a longer horizon would
    chunk the series to bound the exponent, noted in-line."""
    ev = events_with_ts(spark, sf_dir)
    a = _EWMA_ALPHA
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.count("*").cast("long").alias("n"))
    w_ord = W.partitionBy("event_type").orderBy("d")
    seq = daily.withColumn("i", F.row_number().over(w_ord) - 1)
    w_acc = W.partitionBy("event_type").orderBy("i").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    s = F.sum(F.col("n") * F.pow(F.lit(1 - a), -F.col("i"))).over(w_acc)
    x0 = F.first("n").over(W.partitionBy("event_type").orderBy("i"))
    ewma = F.round(
        F.lit(a) * F.pow(F.lit(1 - a), F.col("i")) * s
        + F.pow(F.lit(1 - a), F.col("i") + 1) * x0,
        6,
    )
    return seq.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        ewma.alias("ewma"),
    )


@register(
    "events_gap_fill_hourly",
    oracle=EVENTS_NS_ORACLE.rstrip()
    + """,
    daily AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS dec_sum
      FROM events_ns GROUP BY 1, 2),
    bounds AS (SELECT min(date_trunc('hour', ts)) AS h0,
                      max(date_trunc('hour', ts)) AS h1 FROM events_ns),
    cal AS (
      SELECT t.event_type, CAST(u.g AS TIMESTAMP) AS h
      FROM (SELECT DISTINCT event_type FROM events_ns) t
      CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS g
                  FROM bounds) u)
    SELECT strftime(cal.h, '%Y-%m-%d %H:00') AS hour, cal.event_type,
           COALESCE(n_events, 0) AS n_events,
           CAST(n_events IS NULL AS INT) AS gap,
           CAST(dec_sum AS DOUBLE) AS hour_value,
           CAST(last_value(dec_sum IGNORE NULLS) OVER (
                  PARTITION BY cal.event_type ORDER BY cal.h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS filled_value
    FROM cal LEFT JOIN daily
      ON daily.event_type = cal.event_type AND daily.h = cal.h
    """,
    tags=("event-time",),
)
def events_gap_fill_hourly(spark, sf_dir):
    """Time-series resample + gap-fill: a dense hourly calendar per event
    type (explode of one broadcast bounds row — no driver collect), sparse
    hourly aggregates left-joined onto it, missing hours marked and
    forward-filled with the last observed value (``last IGNORE NULLS``
    running window).

    The standard time-series densification every monitoring/feature
    pipeline needs; the reference has no event-time machinery at all
    (SURVEY §2.9) so this is Spark-native surface. Scale shape: the
    calendar is |types| x |hours| (tiny next to the fact table), the
    forward-fill window partitions by type over bounded calendar rows —
    never over raw events; the DECIMAL interior sum keeps both engines
    bit-identical regardless of summation order."""
    ev = events_with_ts(spark, sf_dir)
    bucket = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(bucket.alias("h"), "event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("dec_sum"),
    )
    bounds = ev.agg(
        F.min(bucket).alias("h0"), F.max(bucket).alias("h1")
    )
    cal = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = cal.join(hourly, ["event_type", "h"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("n_events").isNull().cast("int").alias("gap"),
        F.col("dec_sum").cast("double").alias("hour_value"),
        F.last("dec_sum", ignorenulls=True).over(w).cast("double").alias("filled_value"),
    )


register_sql(
    "events_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_ns, event_id) AS next_type
      FROM events_ns),
    pairs AS (
      SELECT event_type AS prev_type, next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
    SELECT prev_type, next_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 6)
             AS prob
    FROM pairs
    """,
    spark_prelude=EVENTS_PRELUDE,
    oracle_prelude=EVENTS_NS_ORACLE,
    tags=("event-time", "window"),
    doc="First-order Markov transition matrix over per-user event "
    "sequences: consecutive-type pairs via lead() on bounded per-user "
    "partitions, counts + row-normalized probabilities (the path-analysis "
    "rollup funnel tools start from). Output |types|^2 rows; the heavy "
    "lifting is one key-partitioned window + one map-side-combined count.",
)


register_sql(
    "scd2_temporal_join",
    """
    WITH hist AS (
      SELECT user_id, value AS dim_value, ts_ns AS valid_from,
             COALESCE(lead(ts_ns) OVER (PARTITION BY user_id
                                        ORDER BY ts_ns, event_id),
                      9223372036854775807) AS valid_to
      FROM events_ns WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id,
           CAST(f.ts_ns AS BIGINT) AS fact_ts_ns,
           round(h.dim_value, 4) AS dim_value_asof
    FROM events_ns f JOIN hist h
      ON f.user_id = h.user_id
     AND f.ts_ns >= h.valid_from AND f.ts_ns < h.valid_to
    WHERE f.event_type = 'click'
    """,
    spark_prelude=EVENTS_PRELUDE,
    oracle_prelude=EVENTS_NS_ORACLE,
    tags=("cdc", "scd2", "join"),
    doc="Temporal (point-in-interval) join: each click fact enriched with "
    "the user's purchase-derived dimension value VALID AT the fact's event "
    "time — the standard SCD2 consumption pattern. The join is equi on "
    "user_id with the interval predicate evaluated inside the matched key "
    "group (per-user history is bounded, so the range scan per fact is "
    "tiny); facts before the user's first change simply drop, exactly like "
    "a dimension lookup miss.",
)


register_sql(
    "basket_part_pairs",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pc AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders
           FROM items GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, support,
           round(CAST(support AS DOUBLE) / pa.n_orders, 6) AS conf_a_b,
           round(CAST(support AS DOUBLE) / pb.n_orders, 6) AS conf_b_a
    FROM pairs JOIN pc pa ON pa.l_partkey = part_a
               JOIN pc pb ON pb.l_partkey = part_b
    ORDER BY support DESC, part_a, part_b LIMIT 20
    """,
    tags=("join", "aggregate"),
    doc="Market-basket co-occurrence mining: part pairs sharing an order, "
    "with support and both direction confidences (the association-rule "
    "primitives). The self-join fans out within ORDER groups only "
    "(baskets are small — bounded fan-out, never corpus-quadratic), "
    "counts combine map-side, and the top-20 pick is "
    "TakeOrderedAndProject with full tie-breaks.",
)


_DECILES = [round(0.1 * i, 1) for i in range(1, 10)]


@register(
    "customer_value_deciles",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey),
    b AS (SELECT list_transform(quantile_cont(spend, {_DECILES}),
                                x -> round(x, 4)) AS bs FROM spend),
    assigned AS (
      SELECT o_custkey, spend,
             1 + len(list_filter(bs, x -> x <= spend)) AS decile
      FROM spend, b)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           min(spend) AS min_spend, max(spend) AS max_spend
    FROM assigned GROUP BY decile
    """,
    tags=("aggregate", "window"),
)
def customer_value_deciles(spark, sf_dir):
    """Global decile bucketing of customer lifetime spend without the
    NAIVE form's single-task window (ntile(10) OVER (ORDER BY spend)
    funnels every row through ONE task): compute the 9 interpolated decile
    boundaries as a single broadcast row and assign buckets in a codegen
    projection — two aggregations and zero wide windows. Boundaries are
    rounded to 4 decimals on BOTH engines before the <= comparison: Spark
    and DuckDB use algebraically-equal but differently-associated
    interpolation expressions (lower*(1-d)+higher*d vs
    lower+d*(higher-lower)), so unrounded boundaries can differ by an ulp
    and flip an exactly-on-boundary spend by one decile. Spend sums in
    DECIMAL so both engines agree bit-for-bit. Note Spark's exact
    percentile() buffers all distinct spends in the final aggregation
    task — fine at customer-key cardinality; for a true 100 TB arbitrary-
    cardinality shape swap in approx_percentile (same plan otherwise)."""
    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("spend")
    )
    arr = ", ".join(str(d) for d in _DECILES)
    bounds = spend.agg(
        F.expr(
            f"transform(percentile(spend, array({arr})), x -> round(x, 4))"
        ).alias("bs")
    )
    assigned = spend.crossJoin(F.broadcast(bounds)).select(
        "spend",
        (
            F.lit(1) + F.size(F.filter("bs", lambda b: b <= F.col("spend")))
        ).cast("long").alias("decile"),
    )
    return assigned.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.min("spend").alias("min_spend"),
        F.max("spend").alias("max_spend"),
    )


# -- bounded-iteration PageRank over the part co-purchase graph -------------
PR_D = 0.85  # damping
PR_ITERS = 3  # fixed iteration count => deterministic, SQL-expressible
PR_TOP = 20
# ~100 MB of (src, dst, outdeg) rows per cached edge partition (guide
# §2.2): the scale-adaptive divisor for the iteration cache's layout
_PR_EDGE_ROWS_PER_PART = 4_000_000


def _pagerank_oracle_sql(iters: int) -> str:
    """Unrolled power-iteration PageRank oracle over the part co-purchase
    graph: the iteration template is shared between the fixed-3 demo query
    and the run-to-convergence variant (which unrolls PR_CONV_UNROLL
    rounds — past the fixpoint every further round is a no-op, so the
    static unroll equals the dynamic loop's answer)."""
    # AS MATERIALIZED is load-bearing: DuckDB otherwise INLINES each
    # iteration CTE into the next, and optimizer time explodes
    # exponentially with depth (measured: 10 rounds 0.2s, 14 rounds 1.8s,
    # 40 rounds does not finish; materialized, 40 rounds run in 0.6s)
    it = """
    r{k} AS MATERIALIZED (
      SELECT n.part, round((1 - {d}) + {d} * coalesce(s.acc, 0.0), 9) AS pr
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS part, sum(r{p}.pr / deg.outdeg) AS acc
        FROM edges e
        JOIN r{p} ON r{p}.part = e.src
        JOIN deg ON deg.part = e.src
        GROUP BY e.dst
      ) s ON s.part = n.part
    )"""
    rounds = ",".join(it.format(k=k, p=k - 1, d=PR_D) for k in range(1, iters + 1))
    return f"""
    WITH pairs AS (
      SELECT DISTINCT a.l_orderkey, a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), edges AS (
      SELECT src, dst FROM pairs GROUP BY src, dst
    ), nodes AS (
      SELECT DISTINCT src AS part FROM edges
    ), deg AS (
      SELECT src AS part, count(*) AS outdeg FROM edges GROUP BY src
    ), r0 AS (
      SELECT part, 1.0 AS pr FROM nodes
    ), {rounds}
    SELECT part, pr AS pagerank
    FROM r{iters}
    ORDER BY pr DESC, part LIMIT {PR_TOP}
    """


def _pagerank_oracle() -> str:
    return _pagerank_oracle_sql(PR_ITERS)


@register(
    "graph_pagerank_parts",
    oracle=_pagerank_oracle,
    tags=("graph", "join", "aggregate"),
)
def graph_pagerank_parts(spark, sf_dir):
    """PageRank (damping 0.85, 3 unrolled power iterations) over the part
    co-purchase graph: parts are nodes, an edge links parts bought in the
    same order. Iterative graph analytics expressed DECLARATIVELY — each
    iteration is one equi-join + aggregation Catalyst plans like any
    other, unrolled a fixed number of times so the result is
    deterministic and batch-SQL-checkable (the reference has no graph
    surface at all; the engine's other iterative op, dup_components, runs
    to convergence with lineage checkpoints — that is the 100 TB pattern
    to follow when iteration count must be dynamic: localCheckpoint
    between rounds, one scalar convergence probe per round).

    Scale shape: edges come from within-order pairing (bounded basket
    fan-out, never corpus-quadratic — same as basket_part_pairs), every
    iteration shuffles on the SAME key (part id — a real cluster
    co-partitions once and reuses), the per-iteration contribution rounds
    to 9 decimals on both engines so fp summation-order differences
    cannot compound across iterations, and the top-20 pick is
    TakeOrderedAndProject."""
    edges_w, nodes = _pagerank_graph(spark, sf_dir)
    rank = nodes.select("part", F.lit(1.0).alias("pr"))
    for _ in range(PR_ITERS):
        rank = _pagerank_step(edges_w, nodes, rank)
    rank = _pagerank_cleanup(edges_w, nodes, rank)
    return (
        rank.orderBy(F.desc("pr"), F.asc("part"))
        .limit(PR_TOP)
        .select("part", F.col("pr").alias("pagerank"))
    )


def _pagerank_graph(spark, sf_dir):
    """Build the (edges+outdeg, nodes) pair both PageRank variants iterate
    over. The static frame persists ONCE as compressed COLUMNAR cache and
    is materialized eagerly (VERDICT r6 #6) — every iteration re-reads
    it. (Not localCheckpoint: that stores deserialized row blocks, which
    OOMed the 100x sweep's 400M-edge table where the columnar cache fits
    comfortably.) Caching the three intermediate frames separately
    doubled the footprint and still re-derived nodes from the self-join
    lineage; nodes now derive from the cached joined frame."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    # outdeg folds INTO the static edge table once — saves a join per
    # iteration (every iteration then needs exactly one join + one agg);
    # the cache is laid down HASH-PARTITIONED ON src so every iteration's
    # equi-join reuses that partitioning: the per-round exchange moves
    # ONLY the node-sized rank vector, never the edges (VERDICT r6 #6)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # the edge cache's partition count derives from DATA SIZE, not core
    # count (optimization r15, guide §2.2/§2.5): every iteration reads all
    # cached partitions, so near-empty partitions charge ~3 stages of
    # per-task overhead x rounds for no work — measured at sf0.01 (231k
    # edges), per-round cost 0.80s at defaultParallelism(32) vs 0.33s at
    # the derived count. Edge cardinality is estimated from the lineitem
    # FOOTER row count (zero jobs): within-order pairing emits
    # E[b(b-1)]/E[b] ~ 4 edges per lineitem row for basket-shaped dumps
    # (measured 3.85x at sf0.01) — sizing only, never results. At ~24 B/
    # row, _PR_EDGE_ROWS_PER_PART=4M keeps partitions ~100 MB (the guide's
    # 100 MB - 1 GB band), so the same rule scales to a 100 TB lineitem
    # (~2.4T est. edges -> ~600k partitions) instead of pinning either
    # the local or the cluster shape.
    est_edges = 4 * table_rows(sf_dir, "lineitem")
    par = (
        max(2, -(-est_edges // _PR_EDGE_ROWS_PER_PART))
        if est_edges
        else spark.sparkContext.defaultParallelism
    )
    edges_w = edges.join(deg, "src").repartition(par, "src").persist()
    edges_w.count()  # materialize once, before iteration timing starts
    nodes = edges_w.select(F.col("src").alias("part")).distinct().cache()
    return edges_w, nodes


def _pagerank_cleanup(edges_w, nodes, rank):
    """Materialize the final (node-sized) rank and release the static
    caches: repeated executions in one process (bench best-of-N, the
    scale sweep) must not accrete one edge-table cache per run — at 100x
    the leak tripled memory pressure and doubled run 2's time."""
    rank = rank.localCheckpoint(eager=True)
    for df in (edges_w, nodes):
        try:
            df.unpersist()
        except Exception:
            pass  # session teardown mid-release is fine
    return rank


def _pagerank_step(edges_w, nodes, rank):
    """One power iteration: the equi-join reuses the edge cache's src
    hash-partitioning (no edge-side exchange per round — the per-round
    shuffle carries the node-sized rank + ~|nodes| map-combined partial
    sums), with the join IMPLEMENTATION left to the optimizer. Measured
    at 100x, warm, interleaved in one process (VERDICT r6 #6): this
    plain join 150.3s vs a forced shuffle-hash build-on-rank 168.8s vs
    per-round F.broadcast(rank) 183.1s — the 2M-row broadcast funnels
    through the driver every round, and the forced SHJ beat neither.
    Per-iteration round(9) on both engines keeps fp summation-order
    differences from compounding."""
    contrib = (
        edges_w.join(rank, edges_w.src == rank.part)
        .groupBy(F.col("dst").alias("part"))
        .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("acc"))
    )
    return nodes.join(contrib, "part", "left").select(
        "part",
        F.round(
            F.lit(1 - PR_D) + F.lit(PR_D) * F.coalesce("acc", F.lit(0.0)),
            9,
        ).alias("pr"),
    )


# run-to-convergence variant: the oracle statically unrolls this many
# rounds; the Spark loop must detect its (period-<=2) fixpoint within the
# same bound. Empirical fixpoint entry: iter 15 at sf0.001, ~26 at sf0.01
# (where two parts then 2-cycle by one 1e-9 grid step forever — see
# graph_pagerank_converged's docstring).
PR_CONV_UNROLL = 40


def _pagerank_converged_oracle() -> str:
    return _pagerank_oracle_sql(PR_CONV_UNROLL)


@register(
    "graph_pagerank_converged",
    oracle=_pagerank_converged_oracle,
    tags=("graph", "join", "aggregate", "iterative"),
)
def graph_pagerank_converged(spark, sf_dir):
    """PageRank run to CONVERGENCE — the production shape of
    graph_pagerank_parts (VERDICT r4 #6: iterative operators are the one
    class the reference's QPU model cannot express at all; dynamic
    iteration is a Spark-native upgrade).

    Convergence detection must respect the quantized dynamics: each
    iteration rounds to 9 decimals (so the two engines cannot drift), and
    a rounded contraction can land in a PERIOD-2 cycle instead of an exact
    fixpoint — measured at sf0.01, two parts oscillate by exactly one 1e-9
    grid step forever. The probe therefore tests r_N == r_{N-2} (catches
    both the exact fixpoint and the 2-cycle) — never a full-result
    collect. Each round costs exactly ONE job (optimization r15): a lazy
    localCheckpoint truncates lineage and is materialized by the same
    checksum aggregate that yields the round's fixpoint fingerprint; a
    fingerprint match (necessary condition) is confirmed with an exact
    join-count before the loop may stop, and round N-2's dead checkpoint
    blocks are released deterministically each rotation (the pq_train
    release discipline). On period-2 convergence at N, the loop runs
    (PR_CONV_UNROLL - N) % 2 extra iterations so the answer equals the
    oracle's static PR_CONV_UNROLL-round unroll regardless of which cycle
    state N landed on.

    Scale shape: per round, ONE edges-x-ranks equi-join + ONE partial-sum
    aggregation, shuffling on the same part-id key every round (a real
    cluster co-partitions once and reuses); the probe joins two node-sized
    rank vectors. Rounds needed tracks the graph's spectral gap, not its
    size."""
    edges_w, nodes = _pagerank_graph(spark, sf_dir)

    def _mat(df):
        """Materialize one round in ONE job (optimization r15): the lazy
        localCheckpoint is computed — and its blocks persisted — by the
        checksum aggregate itself, so the per-round fixpoint fingerprint
        rides the materialization job instead of costing a second count
        job per probed round (the old shape: eager-checkpoint job + join
        probe job). The checksum (order-insensitive long sum of per-row
        xxhash64) is only a NECESSARY condition for r_N == r_{N-2}; a
        match is confirmed with the exact join probe below before the
        loop may stop, so a hash collision can never truncate iteration
        early — it only costs one extra count job."""
        ck = df.localCheckpoint(eager=False)
        # sum in DECIMAL(38,0): a long sum of 64-bit hashes overflows
        # under ANSI mode (the driver's plain session default)
        chk = ck.agg(
            F.sum(F.xxhash64("part", "pr").cast("decimal(38,0)"))
        ).collect()[0][0]
        return ck, chk

    rank, chk_r = _mat(nodes.select("part", F.lit(1.0).alias("pr")))
    prev2, chk_p2 = None, None  # rank + checksum from two iterations ago
    n_done = PR_CONV_UNROLL
    # try/except (ADVICE r15): the non-convergence AssertionError and any
    # mid-loop failure must not exit with rank/prev2 checkpoints and the
    # edge/node caches still pinned — a long-lived session would accrete
    # them exactly like the pre-r15 success paths did.
    try:
        for it in range(1, PR_CONV_UNROLL + 1):
            new, chk_n = _mat(_pagerank_step(edges_w, nodes, rank))
            if prev2 is not None and chk_n == chk_p2:
                changed = (
                    new.alias("n")
                    .join(prev2.alias("o"), "part")
                    .filter(F.col("n.pr") != F.col("o.pr"))
                    .count()
                )
                if changed == 0:
                    n_done = it
                    release_checkpoint(prev2)
                    release_checkpoint(rank)  # new materialized; r_{N-1} dead
                    rank = new
                    break
            # rotate; round N-2's frame is dead once round N is materialized
            release_checkpoint(prev2)
            prev2, chk_p2, rank, chk_r = rank, chk_r, new, chk_n
        else:
            raise AssertionError(
                f"PageRank did not reach a period-<=2 fixpoint within "
                f"{PR_CONV_UNROLL} rounds — raise PR_CONV_UNROLL (oracle "
                f"unrolls the same bound)"
            )
    except BaseException:
        for df in (prev2, rank, locals().get("new")):
            release_checkpoint(df)
        for df in (edges_w, nodes):
            try:
                df.unpersist()
            except Exception:
                pass  # session teardown mid-release is fine
        raise
    # parity alignment with the static unroll: if the cycle has period 2
    # and the oracle's round count differs from ours mod 2, one more step
    # lands on the oracle's cycle state (a no-op at an exact fixpoint)
    loop_frame = rank
    if (PR_CONV_UNROLL - n_done) % 2:
        rank = _pagerank_step(edges_w, nodes, rank)
    rank = _pagerank_cleanup(edges_w, nodes, rank)
    release_checkpoint(loop_frame)  # cleanup checkpointed the result
    return (
        rank.orderBy(F.desc("pr"), F.asc("part"))
        .limit(PR_TOP)
        .select("part", F.col("pr").alias("pagerank"))
    )


register_sql(
    "events_ab_lift",
    """
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'treatment' ELSE 'control' END
               AS arm,
             CAST(max(CASE WHEN event_type = 'purchase' AND value > 150
                           THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ), per_arm AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_converted,
             round(CAST(sum(converted) AS DOUBLE) / count(*), 6)
               AS conv_rate
      FROM assigned GROUP BY arm
    ), wide AS (
      SELECT max(CASE WHEN arm = 'treatment' THEN conv_rate END) AS p_t,
             max(CASE WHEN arm = 'control' THEN conv_rate END) AS p_c,
             max(CASE WHEN arm = 'treatment' THEN n_users END) AS n_t,
             max(CASE WHEN arm = 'control' THEN n_users END) AS n_c,
             max(CASE WHEN arm = 'treatment' THEN n_converted END) AS c_t,
             max(CASE WHEN arm = 'control' THEN n_converted END) AS c_c
      FROM per_arm
    )
    SELECT n_t, n_c, c_t, c_c,
           round(p_t, 6) AS rate_treatment,
           round(p_c, 6) AS rate_control,
           round(p_t - p_c, 6) AS abs_lift,
           round((p_t - p_c) /
                 sqrt(CAST(c_t + c_c AS DOUBLE) / (n_t + n_c)
                      * (1 - CAST(c_t + c_c AS DOUBLE) / (n_t + n_c))
                      * (CAST(1 AS DOUBLE) / n_t
                         + CAST(1 AS DOUBLE) / n_c)), 6) AS z_score
    FROM wide
    WHERE n_t IS NOT NULL AND n_c IS NOT NULL
    """,
    tags=("aggregate", "analytics"),
    doc="A/B-test lift analysis: deterministic hash assignment (user_id "
    "parity stands in for the assignment hash), per-arm conversion "
    "rates (conversion = any purchase over 150), absolute lift, and the "
    "two-proportion pooled z-score — the "
    "experimentation readout every event pipeline serves. Two "
    "aggregations (per-user collapse, per-arm rollup) and a one-row "
    "final projection; the per-user collapse combines map-side and the "
    "arm rollup is 2 groups, so the plan is scan-bound at any scale.",
)


register_sql(
    "dq_profile_orders",
    """
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(o_custkey) AS BIGINT) AS nn_custkey,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_custkey,
             CAST(count(o_orderstatus) AS BIGINT) AS nn_status,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
             CAST(count(o_totalprice) AS BIGINT) AS nn_price,
             CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd_price,
             round(min(o_totalprice), 4) AS min_price,
             round(max(o_totalprice), 4) AS max_price,
             CAST(count(o_orderdate) AS BIGINT) AS nn_date,
             CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd_date,
             CAST(year(min(o_orderdate)) * 10000
                  + month(min(o_orderdate)) * 100
                  + day(min(o_orderdate)) AS DOUBLE) AS min_date,
             CAST(year(max(o_orderdate)) * 10000
                  + month(max(o_orderdate)) * 100
                  + day(max(o_orderdate)) AS DOUBLE) AS max_date
      FROM orders
    )
    SELECT col, n_rows, n_nulls, n_distinct, min_val, max_val FROM (
      SELECT 'o_custkey' AS col, n_rows, n_rows - nn_custkey AS n_nulls,
             nd_custkey AS n_distinct,
             CAST(NULL AS DOUBLE) AS min_val,
             CAST(NULL AS DOUBLE) AS max_val FROM base
      UNION ALL
      SELECT 'o_orderstatus', n_rows, n_rows - nn_status, nd_status,
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM base
      UNION ALL
      SELECT 'o_totalprice', n_rows, n_rows - nn_price, nd_price,
             min_price, max_price FROM base
      UNION ALL
      SELECT 'o_orderdate', n_rows, n_rows - nn_date, nd_date,
             min_date, max_date FROM base
    )
    """,
    tags=("dq", "aggregate"),
    doc="Table profile — the pre-flight every pipeline runs before "
    "trusting a new drop: per-column row/null/distinct counts plus "
    "min/max for the ordered columns, computed in ONE aggregation pass "
    "over the table (the unpivot to one-row-per-column happens on the "
    "single profile row, not the data). Count-distinct aggregates "
    "expand to one pass per distinct-column set under Spark's expand "
    "operator — still a single scan; at extreme widths swap in "
    "approx_count_distinct per column to collapse the expansion.",
)


_ATTR_WINDOW_NS = 7 * 24 * 3600 * 1_000_000_000  # 7-day lookback


@register(
    "events_attribution",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, value, epoch_ns(ts) AS ns, event_id
      FROM events
    ), w AS (
      SELECT *,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ns, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN ns END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ns, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_ns
      FROM e)
    SELECT CASE WHEN touch IS NOT NULL
                 AND ns - touch_ns <= {_ATTR_WINDOW_NS}
                THEN touch ELSE 'direct' END AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 4) AS attributed_revenue
    FROM w WHERE event_type = 'purchase' GROUP BY 1
    """,
    tags=("events", "window", "analytics"),
)
def events_attribution(spark, sf_dir):
    """Last-touch revenue attribution: each purchase credits the user's
    most recent preceding non-purchase touch within a 7-day lookback
    (older or absent -> 'direct') — the marketing readout between funnel
    counting and A/B lift. One bounded per-user window pass (last non-null
    over rows-preceding — never a self-join per purchase) + a 5-group
    rollup; deterministic under the (ts, event_id) tie-break."""
    from pyspark.sql.window import Window

    ev = events_with_ts(spark, sf_dir).select(
        "user_id", "event_type", "value", "ts_ns", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touch_ns = F.last(
        F.when(F.col("event_type") != "purchase", F.col("ts_ns")),
        ignorenulls=True,
    ).over(w)
    attributed = (
        ev.withColumn("_touch", touch)
        .withColumn("_touch_ns", touch_ns)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("_touch").isNotNull()
                & (F.col("ts_ns") - F.col("_touch_ns") <= _ATTR_WINDOW_NS),
                F.col("_touch"),
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "value",
        )
    )
    return attributed.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("attributed_revenue"),
    )
