"""Reference-parity queries — SURVEY §2.1-2.8 operator inventory.

Each query exercises one reference operator class with its exact semantics,
re-expressed as DataFrame transforms, and carries a DuckDB oracle.
The two queries the reference itself unit-tests
(internal/sqlparser/sqlparser_test.go:23-56) appear verbatim in shape:
a point EQ query and an ORDER BY ... DESC LIMIT 5 top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proteus_spark.operators import (
    RangeIndex,
    apply_predicates,
    eq,
    is_not_null,
    is_null,
    keyed_merge_join,
    range_pred,
    sum_view,
    topk,
    union_router,
)
from proteus_spark.registry import load, register, spill


# ---------------------------------------------------------------------------
# Scan / projection / filters (SURVEY §2.1, §2.2)
# ---------------------------------------------------------------------------


@register(
    "ref_point_eq",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id = 42
    """,
    tags=("parity", "filter"),
)
def ref_point_eq(spark, sf_dir):
    """Point query parity: ``select * from t where x = 42``
    (sqlparser_test.go:23-40). EQ = degenerate range (sqlparse.go:444-465)."""
    ev = load(spark, sf_dir, "events")
    return apply_predicates(ev, [eq("event_id", 42)]).select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "ref_projection",
    oracle="SELECT c_name, c_acctbal FROM customer",
    tags=("parity", "projection"),
)
def ref_projection(spark, sf_dir):
    """Projection pushdown parity (sqlparse.go:155-175; the reference pushes
    the SELECT list into the scan — mysql/store.go:157-165; Catalyst's
    ColumnPruning reaches the parquet ReadSchema)."""
    return load(spark, sf_dir, "customer").select("c_name", "c_acctbal")


@register(
    "ref_ts_projection",
    oracle="""
    SELECT event_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS _ts
    FROM events WHERE event_type = 'click'
    """,
    tags=("parity", "metadata"),
)
def ref_ts_projection(spark, sf_dir):
    """Vector-clock metadata surface (SURVEY §1.5): every record carries a
    ``_ts`` source-timestamp column — the Spark mapping of the reference's
    per-record Vectorclock (qpu.proto:97-99), which its responses expose
    (qpuextapi.proto:33-38). Epoch-micros BIGINT; for event-sourced tables
    the clock is the event time, for raw file scans it is the ingestion
    time (sources.cdc.attach_source_ts)."""
    from proteus_spark.registry import events_with_ts
    from proteus_spark.sources.cdc import attach_source_ts

    ev = events_with_ts(spark, sf_dir)
    return (
        attach_source_ts(ev, ts_col="ts")
        .filter(F.col("event_type") == "click")
        .select("event_id", "event_type", "_ts")
    )


@register(
    "ref_range_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20
    """,
    tags=("parity", "filter"),
)
def ref_range_filter(spark, sf_dir):
    """RANGE predicate parity: lbound inclusive, ubound exclusive
    (queries.go:183-209)."""
    li = load(spark, sf_dir, "lineitem")
    return apply_predicates(li, [range_pred("l_quantity", 10, 20)]).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "ref_isnull",
    oracle="""
    SELECT event_id, event_type
    FROM (SELECT event_id, event_type,
                 CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS maybe
          FROM events)
    WHERE maybe IS NULL
    """,
    tags=("parity", "filter"),
)
def ref_isnull(spark, sf_dir):
    """ISNULL parity: null = attribute absent from the object map
    (queries.go:167-174). The testdata has no physically-null columns, so a
    nullable column is derived first — the predicate semantics are what is
    under test."""
    ev = load(spark, sf_dir, "events").withColumn(
        "maybe",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("event_type")
        ),
    )
    return apply_predicates(ev, [is_null("maybe")]).select("event_id", "event_type")


@register(
    "ref_isnotnull",
    oracle="""
    SELECT event_id, event_type
    FROM (SELECT event_id, event_type,
                 CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS maybe
          FROM events)
    WHERE maybe IS NOT NULL
    """,
    tags=("parity", "filter"),
)
def ref_isnotnull(spark, sf_dir):
    """ISNOTNULL parity (queries.go:159-166; pushed down to the scan as in
    mysql/store.go:167-177 — ours reaches parquet PushedFilters)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "maybe",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("event_type")
        ),
    )
    return apply_predicates(ev, [is_not_null("maybe")]).select("event_id", "event_type")


@register(
    "ref_conjunction",
    oracle="""
    SELECT l_orderkey, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity >= 30 AND l_quantity < 40
      AND l_returnflag = 'R' AND l_discount >= 0.05
    """,
    tags=("parity", "filter"),
)
def ref_conjunction(spark, sf_dir):
    """Implicit-AND conjunction of predicates (queries.go:160-211)."""
    li = load(spark, sf_dir, "lineitem")
    return apply_predicates(
        li,
        [
            range_pred("l_quantity", 30, 40),
            eq("l_returnflag", "R"),
            range_pred("l_discount", 0.05, None),
        ],
    ).select("l_orderkey", "l_quantity", "l_discount", "l_returnflag")


# ---------------------------------------------------------------------------
# Top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "ref_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
    """,
    tags=("parity", "topk"),
)
def ref_topk_orders(spark, sf_dir):
    """Top-k parity: ``ORDER BY ... DESC LIMIT 5`` (sqlparser_test.go:42-56).
    Plans as TakeOrderedAndProject — per-partition heaps, no global sort."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return topk(o, by="o_totalprice", k=5, descending=True, tiebreak=["o_orderkey"])


# ---------------------------------------------------------------------------
# Group-by-sum view (SURVEY §2.4; SumQPU)
# ---------------------------------------------------------------------------


@register(
    "ref_sum_view",
    oracle="""
    SELECT user_id, round(sum(value), 4) AS value_sum
    FROM events GROUP BY user_id
    """,
    tags=("parity", "aggregate"),
)
def ref_sum_view(spark, sf_dir):
    """SumQPU parity: SUM(value) GROUP BY user_id, output column
    ``<attr>_sum`` (sum.go:108-121,158-160). Rounded identically on both
    sides because double summation order differs across engines."""
    ev = load(spark, sf_dir, "events")
    v = sum_view(ev, group_by="user_id", agg_attr="value")
    return v.select("user_id", F.round("value_sum", 4).alias("value_sum"))


# ---------------------------------------------------------------------------
# Keyed-merge join view (SURVEY §2.3; JoinQPU)
# ---------------------------------------------------------------------------


def _order_revenue(spark, sf_dir):
    """votes-per-story analogue: revenue per order from lineitem."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "ref_join_merge",
    oracle="""
    WITH rev AS (
      SELECT l_orderkey AS o_orderkey,
             sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT COALESCE(o.o_orderkey, r.o_orderkey) AS o_orderkey,
           o.o_totalprice AS o_totalprice,
           round(COALESCE(r.revenue, 0.0), 4) AS revenue
    FROM orders o FULL OUTER JOIN rev r USING (o_orderkey)
    """,
    tags=("parity", "join"),
)
def ref_join_merge(spark, sf_dir):
    """JoinQPU parity: keyed merge on the join key, one row per key from
    EITHER side, missing side defaulted (0 for numeric —
    join.go:352-379,414-423)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    rev = _order_revenue(spark, sf_dir)
    merged = keyed_merge_join(orders, rev, key="o_orderkey", defaults={"revenue": 0.0})
    return merged.select(
        "o_orderkey", "o_totalprice", F.round("revenue", 4).alias("revenue")
    )


@register(
    "ref_lobsters_topk",
    oracle="""
    WITH rev AS (
      SELECT l_orderkey AS o_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS vote_sum
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey AS story_id, o.o_orderpriority AS title, r.vote_sum AS vote_sum
    FROM orders o JOIN rev r USING (o_orderkey)
    ORDER BY r.vote_sum DESC, o.o_orderkey LIMIT 5
    """,
    tags=("parity", "pipeline"),
)
def ref_lobsters_topk(spark, sf_dir):
    """The reference's flagship pipeline shape: votes -> sum -> join stories
    -> ``ORDER BY vote_sum DESC LIMIT 5``
    (configs/cloudserver-federation/localdev/sum-stories.toml;
    sqlparser_test.go:42-56; the join state table even carries a hardcoded
    index on vote_sum — join.go:178). lineitem plays votes, orders plays
    stories."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    rev = _order_revenue(spark, sf_dir).withColumn(
        "vote_sum", F.round("revenue", 4)
    ).drop("revenue")
    merged = orders.join(rev, on="o_orderkey", how="inner")
    top = topk(merged, by="vote_sum", k=5, descending=True, tiebreak=["o_orderkey"])
    return top.select(
        F.col("o_orderkey").alias("story_id"),
        F.col("o_orderpriority").alias("title"),
        "vote_sum",
    )


# ---------------------------------------------------------------------------
# Router / scatter-gather (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "ref_router_union",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    """,
    tags=("parity", "router"),
)
def ref_router_union(spark, sf_dir):
    """RouterQPU parity: scatter-gather bag union over two range shards
    (router.go:43-78; shard layout from confs/index0.toml [0,50) +
    confs/index1.toml [50,100) behind confs/router.toml)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    shard0 = c.filter(range_pred("c_custkey", None, 750))
    shard1 = c.filter(range_pred("c_custkey", 750, None))
    return union_router([shard0, shard1])


# ---------------------------------------------------------------------------
# Secondary index (SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "ref_index_range",
    oracle="""
    SELECT p_partkey, p_size FROM part
    WHERE p_size >= 10 AND p_size < 20
    ORDER BY p_size, p_partkey LIMIT 20
    """,
    tags=("parity", "index"),
)
def ref_index_range(spark, sf_dir):
    """InMemIndex range lookup parity: B-tree AscendRange between bounds
    (inMemIndex.go:519-550), result capped at 20 (inMemIndex.go:245-247 —
    made deterministic by (attribute, key) ordering)."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_size")
    idx = RangeIndex(part, attribute="p_size", key="p_partkey", lbound=0, ubound=50)
    return idx.lookup_range(10, 20)


@register(
    "ref_index_point",
    oracle="""
    SELECT p_partkey, p_size FROM part
    WHERE p_size >= 42 AND p_size < 43
    ORDER BY p_size, p_partkey LIMIT 20
    """,
    tags=("parity", "index"),
)
def ref_index_point(spark, sf_dir):
    """InMemIndex EQ lookup parity: EQ as degenerate range [v, v+1)
    (inMemIndex.go:539-541)."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_size")
    idx = RangeIndex(part, attribute="p_size", key="p_partkey", lbound=0, ubound=50)
    return idx.lookup_eq(42)


# ---------------------------------------------------------------------------
# Result cache (SURVEY §2.8)
# ---------------------------------------------------------------------------


@register(
    "ref_cache_topk",
    oracle="""
    SELECT o_custkey, sum(o_totalprice) AS spend
    FROM orders GROUP BY o_custkey
    ORDER BY spend DESC, o_custkey LIMIT 5
    """,
    tags=("parity", "cache"),
)
def ref_cache_topk(spark, sf_dir):
    """CacheQPU parity (cache/cache.go:81-153): first call misses and
    materializes; the returned result is served FROM the cache (second
    lookup), so the oracle hash-match proves cached results are
    byte-identical to recomputation. Invalidation is version-based
    (proteus_spark/cache.py) instead of the reference's race-prone
    first-notification evict (lruCache.go:69-103)."""
    from proteus_spark.cache import CachedEngine
    from proteus_spark.engine import Engine

    sql = """
        SELECT o_custkey, sum(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
        ORDER BY spend DESC, o_custkey LIMIT 5
    """
    ce = CachedEngine(Engine(spark, sf_dir))
    ce.query(sql).collect()  # miss -> materialize + store
    out = ce.query(sql)  # hit -> rebuilt from cached rows
    assert ce.cache.stats.hits == 1, "second lookup must be a cache hit"
    return out


# ---------------------------------------------------------------------------
# Declarative topology (the reference's deployment model, SURVEY §0/§3.3)
# ---------------------------------------------------------------------------


@register(
    "ref_topology_lobsters",
    oracle="""
    WITH rev AS (
      SELECT l_orderkey AS o_orderkey,
             sum(l_extendedprice * (1 - l_discount)) AS vote_sum
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT COALESCE(o.o_orderkey, r.o_orderkey) AS o_orderkey,
           round(COALESCE(r.vote_sum, 0.0), 4) AS vote_sum
    FROM orders o FULL OUTER JOIN rev r USING (o_orderkey)
    ORDER BY COALESCE(r.vote_sum, 0.0) DESC, 1 LIMIT 5
    """,
    tags=("parity", "topology"),
)
def ref_topology_lobsters(spark, sf_dir):
    """The sum-stories TOML deployment, declared as a topology document and
    built into ONE Catalyst plan (proteus_spark/topology.py; reference
    declares the same DAG across per-process TOML configs,
    configs/cloudserver-federation/localdev/sum-stories.toml)."""
    from proteus_spark.topology import LOBSTERS_EXAMPLE, build_topology

    nodes = build_topology(spark, sf_dir, LOBSTERS_EXAMPLE, register_views=False)
    return nodes["stories_top"].select(
        "o_orderkey", F.round("vote_sum", 4).alias("vote_sum")
    )


@register(
    "ref_topology_ycsb",
    oracle="""
    (SELECT p_partkey, p_size FROM part
     WHERE p_size >= 10 AND p_size < 25
     ORDER BY p_size, p_partkey LIMIT 20)
    UNION ALL
    (SELECT p_partkey, p_size FROM part
     WHERE p_size >= 25 AND p_size < 40
     ORDER BY p_size, p_partkey LIMIT 20)
    """,
    tags=("parity", "topology"),
)
def ref_topology_ycsb(spark, sf_dir):
    """The YCSB-style deployment from confs/: two range-scoped index
    shards behind a scatter-gather router (confs/index0.toml [0,50),
    confs/index1.toml [50,100), confs/router.toml), per-shard lookups
    capped at 20 (inMemIndex.go:245-247) — declared as one TOML document
    and built into one Catalyst plan."""
    from proteus_spark.topology import YCSB_EXAMPLE, build_topology

    nodes = build_topology(spark, sf_dir, YCSB_EXAMPLE, register_views=False)
    return nodes["router"].select("p_partkey", "p_size")


def _mock_ds_oracle() -> str:
    from proteus_spark.sources.mock import mock_table_oracle_sql

    return (
        "WITH "
        + mock_table_oracle_sql(1000)
        + "SELECT object_id, attribute0 FROM mock"
    )


@register(
    "ref_mock_datasource",
    oracle=_mock_ds_oracle,
    tags=("parity", "source"),
)
def ref_mock_datasource(spark, sf_dir):
    """The 'new datastore driver' extension point, exercised for real: the
    reference's mock store (mock/store.go:36-55) reimplemented as a Spark
    Python DataSource (sources/pyds.py) — partitioned executor-side row
    generation behind spark.read.format('proteus_mock'), value-checked
    against the DuckDB oracle that regenerates the identical table. The
    Spark counterpart of implementing the dataStore Go interface
    (datastoredriver.go:36-40)."""
    from proteus_spark.sources.pyds import register_mock_datasource

    fmt = register_mock_datasource(spark)
    return spark.read.format(fmt).option("n", 1000).load()


@register(
    "salted_join_orders",
    oracle="""
    SELECT o.o_orderkey, c.c_mktsegment AS segment,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("join", "skew"),
)
def salted_join_orders(spark, sf_dir):
    """Skew-safe salted equi-join: orders (the potentially hot-keyed fact
    side) salted over 16 buckets, the customer dim replicated per salt —
    the explicit hot-key fix when the dim can't broadcast and AQE's skew
    split isn't available. Result identical to the plain join (oracle is
    the plain join); salt is internal."""
    from proteus_spark.operators import salted_join

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    return salted_join(orders, cust, key="o_custkey", salt_buckets=16).select(
        "o_orderkey", "segment", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )


@register(
    "ref_mv_substitution",
    oracle="""
    SELECT l_orderkey AS story_id,
           CAST(SUM(l_quantity) AS DOUBLE) AS vote_sum
    FROM lineitem GROUP BY l_orderkey
    ORDER BY vote_sum DESC, story_id ASC LIMIT 5
    """,
    tags=("optimizer", "cache"),
)
def ref_mv_substitution(spark, sf_dir):
    """Automatic materialized-view substitution (SURVEY §4's one custom
    optimizer piece): the client writes the lobsters top-k against BASE
    tables; the engine recognizes — via Catalyst sameResult on analyzed
    plans, not string matching — that a registered sum view answers the
    aggregation core, peels the ORDER BY/LIMIT wrapper, and serves from
    the view snapshot. In the reference the client must name the view
    table because wiring IS the plan (sum.go:149-180); here the rewrite
    makes the topology transparent. The query asserts the substitution
    actually fired."""
    from proteus_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.register_materialized(
        "votes_sum",
        "SELECT l_orderkey AS story_id, "
        "CAST(SUM(l_quantity) AS DOUBLE) AS vote_sum "
        "FROM lineitem GROUP BY l_orderkey",
    )
    out = eng.query(
        "SELECT l_orderkey AS story_id, "
        "CAST(SUM(l_quantity) AS DOUBLE) AS vote_sum "
        "FROM lineitem GROUP BY l_orderkey "
        "ORDER BY vote_sum DESC, story_id ASC LIMIT 5"
    )
    assert eng.mvs.last_substitution == "votes_sum", "substitution did not fire"
    return out


@register(
    "ref_vectorclock_join",
    oracle="""
    SELECT o.o_orderkey,
           epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS vc_orders_us,
           epoch_us(CAST(l.max_ship AS TIMESTAMP)) AS vc_lineitem_us
    FROM orders o LEFT JOIN (
      SELECT l_orderkey, max(l_shipdate) AS max_ship
      FROM lineitem GROUP BY l_orderkey) l
    ON l.l_orderkey = o.o_orderkey
    """,
    tags=("streaming", "metadata"),
)
def ref_vectorclock_join(spark, sf_dir):
    """MAP-form vector clocks composed through a join: each side carries
    the reference's actual Vectorclock shape — map<source, ts>, one entry
    per source bucket (qpu.proto:97-99) — and the join merges them
    entry-wise (map_zip_with max, pure codegen). The scalar ``_ts``
    convention (ref_ts_projection) is the single-source projection of
    this; here the merged clock is keyed by BOTH upstreams, exactly what
    the reference surfaces per response record (qpuextapi.proto:33-38).
    Clock values derive from data columns (orderdate / max shipdate) so
    the oracle can recompute them."""
    from proteus_spark.sources.cdc import attach_vectorclock, merge_vectorclocks

    orders = attach_vectorclock(
        load(spark, sf_dir, "orders"), "orders", ts_col="o_orderdate"
    ).select("o_orderkey", F.col("_vc").alias("_vc_o"))
    li = attach_vectorclock(
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship")),
        "lineitem",
        ts_col="max_ship",
    ).select(F.col("l_orderkey").alias("o_orderkey"), F.col("_vc").alias("_vc_l"))
    merged = orders.join(li, "o_orderkey", "left").select(
        "o_orderkey",
        merge_vectorclocks(F.col("_vc_o"), F.col("_vc_l")).alias("_vc"),
    )
    return merged.select(
        "o_orderkey",
        F.element_at("_vc", F.lit("orders")).alias("vc_orders_us"),
        F.element_at("_vc", F.lit("lineitem")).alias("vc_lineitem_us"),
    )


@register(
    "ref_index_zorder",
    oracle="""
    SELECT event_id, user_id, value FROM events
    WHERE user_id >= 2 AND user_id < 8 AND value >= 100.0 AND value < 160.0
    """,
    tags=("index",),
)
def ref_index_zorder(spark, sf_dir):
    """2-D Z-order durable index lookup: both dimensions interleave into a
    Morton partition column, and a 2-D box query prunes to the
    intersecting z directories before re-applying the exact RANGE
    conjunction (queries.go:183-209) — the multi-attribute generalization
    of the 1-D sharded index+router deployment, whose router broadcasts
    to ALL shards regardless of predicate (router.go:50-59). Result ==
    brute-force conjunction (the oracle); pruning is plan-asserted in
    tests/test_plans.py."""
    import shutil
    import tempfile

    from proteus_spark.operators.index import ZOrderIndex2D

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = tempfile.mkdtemp(prefix="proteus_zidx_")
    try:
        idx = ZOrderIndex2D(
            ev, attr_a="user_id", attr_b="value", key="event_id", path=path,
            a_bounds=(0.0, 16.0), b_bounds=(0.0, 500.0),
        )
        out = idx.lookup_box(2, 8, 100.0, 160.0)
        # the index dir is cleaned in finally: spill the result to a
        # harness-owned parquet path instead of a driver collect()
        return spill(out)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register(
    "dq_validate_orders",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
    SELECT 'not_null(o_custkey)' AS rule,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS violations,
           n_rows, CAST(count(*) FILTER (WHERE o_custkey IS NULL) = 0 AS INTEGER) AS passed
    FROM orders, n GROUP BY n_rows
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
           n_rows, CAST(count(*) - count(DISTINCT o_orderkey) = 0 AS INTEGER)
    FROM orders, n GROUP BY n_rows
    UNION ALL
    SELECT 'in_range(o_totalprice, 0, 300000)',
           CAST(count(*) FILTER (WHERE NOT (o_totalprice >= 0 AND o_totalprice < 300000)
                                    OR o_totalprice IS NULL) AS BIGINT),
           n_rows,
           CAST(count(*) FILTER (WHERE NOT (o_totalprice >= 0 AND o_totalprice < 300000)
                                    OR o_totalprice IS NULL) = 0 AS INTEGER)
    FROM orders, n GROUP BY n_rows
    UNION ALL
    SELECT 'satisfies(o_orderstatus IN (''O'', ''F''))',
           CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F')
                                    OR o_orderstatus IS NULL) AS BIGINT),
           n_rows,
           CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F')
                                    OR o_orderstatus IS NULL) = 0 AS INTEGER)
    FROM orders, n GROUP BY n_rows
    """,
    tags=("quality",),
)
def dq_validate_orders(spark, sf_dir):
    """Data-quality expectations gate (deequ/dbt-test role; beyond the
    reference, whose only contract is the TOML type declaration): four
    declared rules — null check, key uniqueness, value range with the
    engine's [lb, ub) convention, domain membership — ALL evaluated in one
    aggregation pass and unpivoted via stack (operators/quality.py). The
    range and domain rules intentionally catch real violations (prices
    over 300k; status 'P')."""
    from proteus_spark.operators import quality as Q

    orders = load(spark, sf_dir, "orders")
    return Q.check_constraints(
        orders,
        [
            Q.not_null("o_custkey"),
            Q.unique("o_orderkey"),
            Q.in_range("o_totalprice", 0, 300000),
            Q.satisfies("o_orderstatus IN ('O', 'F')"),
        ],
    )


_BLOOM_CANDS = tuple(range(1, 11)) + (9999991, 9999992)


def _bloom_oracle() -> str:
    from proteus_spark.functions.texthash import hex_to_long_sql, md5_seeded_sql
    from proteus_spark.operators.bloom import (
        BLOOM_BITS,
        BLOOM_HASHES,
        WORD_BITS,
    )

    hx = ", ".join(
        f"{md5_seeded_sql('s', f'bloom{d}')} AS x{d}" for d in range(BLOOM_HASHES)
    )
    chx = ", ".join(
        f"{md5_seeded_sql('CAST(candidate AS VARCHAR)', f'bloom{d}')} AS x{d}"
        for d in range(BLOOM_HASHES)
    )
    grid = "\n      UNION ALL\n      ".join(
        f"SELECT month, {hex_to_long_sql(f'x{d}')} % {BLOOM_BITS} AS pos FROM hx"
        for d in range(BLOOM_HASHES)
    )
    pgrid = "\n      UNION ALL\n      ".join(
        f"SELECT candidate, {hex_to_long_sql(f'x{d}')} % {BLOOM_BITS} AS pos FROM chx"
        for d in range(BLOOM_HASHES)
    )
    cands = ", ".join(str(c) for c in _BLOOM_CANDS)
    return f"""
    WITH keys AS (
      SELECT CAST(o_custkey AS VARCHAR) AS s,
             strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month
      FROM orders),
    hx AS (SELECT month, {hx} FROM keys),
    grid AS (
      {grid}),
    masks AS (
      SELECT month, pos // {WORD_BITS} AS word,
             (CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INTEGER)) AS mask
      FROM grid),
    partial AS (
      SELECT month, word, bit_or(mask) AS bits FROM masks GROUP BY 1, 2),
    merged AS (SELECT word, bit_or(bits) AS bits FROM partial GROUP BY word),
    cand AS (SELECT unnest([{cands}]) AS candidate),
    chx AS (SELECT candidate, {chx} FROM cand),
    pgrid AS (
      {pgrid}),
    probe AS (
      SELECT candidate, pos // {WORD_BITS} AS word,
             CAST(pos % {WORD_BITS} AS INTEGER) AS bit
      FROM pgrid),
    hits AS (
      SELECT candidate,
             (COALESCE(m.bits, 0) >> bit) & 1 AS hit
      FROM probe LEFT JOIN merged m USING (word)),
    maybe AS (
      SELECT candidate, CAST(min(hit) AS INTEGER) AS maybe_present
      FROM hits GROUP BY candidate),
    actual AS (SELECT DISTINCT o_custkey AS candidate FROM orders)
    SELECT mb.candidate AS candidate, maybe_present,
           CAST(a.candidate IS NOT NULL AS INTEGER) AS actually_present,
           CAST(maybe_present >= CAST(a.candidate IS NOT NULL AS INTEGER)
                AS INTEGER) AS no_false_negative
    FROM maybe mb LEFT JOIN actual a ON a.candidate = mb.candidate
    """


@register(
    "agg_bloom_probe", oracle=_bloom_oracle, tags=("aggregate", "sketch", "join")
)
def agg_bloom_probe(spark, sf_dir):
    """Mergeable Bloom-filter membership — the semi-join pruning sketch:
    per-month partial filters bit_or-merge into one KB-sized (word, bits)
    relation; candidate keys probe it without touching orders. Integer
    bit arithmetic on portable hashes end-to-end, so DuckDB replays the
    filter bit-for-bit and the no-false-negative guarantee is checked
    per row (operators/bloom.py)."""
    from proteus_spark.operators import bloom as B

    orders = load(spark, sf_dir, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    filt = B.bloom_build(orders, "o_custkey", partial_by="month")
    cands = spark.createDataFrame(
        [(int(c),) for c in _BLOOM_CANDS], "candidate long"
    )
    probed = B.bloom_probe(cands, filt, "candidate")
    actual = (
        orders.select(F.col("o_custkey").alias("candidate"))
        .distinct()
        .withColumn("_a", F.lit(1))
    )
    out = probed.join(actual, "candidate", "left").select(
        "candidate",
        "maybe_present",
        F.coalesce(F.col("_a"), F.lit(0)).cast("integer").alias("actually_present"),
        (F.col("maybe_present") >= F.coalesce(F.col("_a"), F.lit(0)))
        .cast("integer")
        .alias("no_false_negative"),
    )
    assert out.filter(F.col("no_false_negative") == 0).count() == 0
    return out


@register(
    "dq_skew_report",
    oracle="""
    WITH pk AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
                FROM orders GROUP BY o_custkey),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                  CAST(max(n) AS BIGINT) AS max_n,
                  CAST(sum(n) AS BIGINT) AS total_rows FROM pk)
    SELECT key, n, n_keys, max_n, total_rows,
           round(CAST(total_rows AS DOUBLE) / n_keys, 6) AS avg_n,
           round(max_n / (CAST(total_rows AS DOUBLE) / n_keys), 6) AS skew_ratio
    FROM (SELECT * FROM pk ORDER BY n DESC, key LIMIT 10), st
    """,
    tags=("quality", "skew"),
)
def dq_skew_report(spark, sf_dir):
    """Key-skew diagnostic on orders.o_custkey: top-10 heavy hitters +
    global distribution stats (operators/quality.py::skew_report). The
    operational companion to the salted-join operator — run this first,
    salt when skew_ratio says so."""
    from proteus_spark.operators.quality import skew_report

    return skew_report(load(spark, sf_dir, "orders"), "o_custkey")
