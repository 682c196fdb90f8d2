"""Materialized-view substitution (plans/mvsub.py): Catalyst-sameResult
matching, top-k wrapper peeling, zero-false-positive fallthrough, and
live-provider freshness semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proteus_spark.engine import Engine

DEF_SQL = (
    "SELECT l_orderkey AS story_id, "
    "CAST(SUM(l_quantity) AS DOUBLE) AS vote_sum "
    "FROM lineitem GROUP BY l_orderkey"
)


@pytest.fixture()
def eng(spark, sf_dir):
    e = Engine(spark, sf_dir)
    e.register_materialized("votes_sum", DEF_SQL)
    return e


def test_exact_match_any_alias_case_whitespace(eng):
    df = eng.query(
        "select   l_orderkey as K, cast(sum(l_quantity) as double) V "
        "from lineitem group by l_orderkey"
    )
    assert eng.mvs.last_substitution == "votes_sum"
    # result carries the QUERY's aliases, not the view's
    assert df.columns == ["K", "V"]
    direct = eng.spark.sql(DEF_SQL)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, direct.collect()))


def test_topk_wrapper_served_from_view(eng):
    sql = DEF_SQL + " ORDER BY vote_sum DESC, story_id ASC LIMIT 5"
    df = eng.query(sql)
    assert eng.mvs.last_substitution == "votes_sum"
    assert [tuple(r) for r in df.collect()] == [
        tuple(r) for r in eng.spark.sql(sql).collect()
    ]


def test_different_aggregate_falls_through(eng):
    eng.query(
        "SELECT l_orderkey, CAST(SUM(l_extendedprice) AS DOUBLE) AS s "
        "FROM lineitem GROUP BY l_orderkey"
    )
    assert eng.mvs.last_substitution is None


def test_same_shape_different_table_falls_through(eng, spark):
    # same schema-shape aggregation over a DIFFERENT relation must not
    # collide (sameResult keys on relation identity, not plan shape)
    eng.query(
        "SELECT o_orderkey, CAST(SUM(o_totalprice) AS DOUBLE) AS s "
        "FROM orders GROUP BY o_orderkey"
    )
    assert eng.mvs.last_substitution is None


def test_expression_sort_key_falls_through(eng):
    # ORDER BY an expression is not expressible over the view's columns;
    # substitution must decline, not mis-serve
    df = eng.query(DEF_SQL + " ORDER BY vote_sum + 1 DESC LIMIT 5")
    assert eng.mvs.last_substitution is None
    assert df.count() == 5


def test_extra_filter_falls_through(eng):
    eng.query(
        "SELECT l_orderkey AS story_id, "
        "CAST(SUM(l_quantity) AS DOUBLE) AS vote_sum "
        "FROM lineitem WHERE l_quantity > 10 GROUP BY l_orderkey"
    )
    assert eng.mvs.last_substitution is None


def test_live_provider_serves_view_state(spark, sf_dir):
    """Provider-backed view: the engine serves whatever the view's CURRENT
    snapshot holds — the reference's freshness model (a maintained view
    may trail its base table)."""
    eng = Engine(spark, sf_dir)
    stale = spark.createDataFrame(
        [(1, 100.0)], "story_id long, vote_sum double"
    )
    eng.register_materialized("votes_sum", DEF_SQL, provider=lambda: stale)
    rows = eng.query(DEF_SQL).collect()
    assert eng.mvs.last_substitution == "votes_sum"
    assert [tuple(r) for r in rows] == [(1, 100.0)]


def test_query_unary_routes_through_substitution(eng):
    out = eng.query_unary(DEF_SQL + " ORDER BY vote_sum DESC, story_id ASC LIMIT 1")
    assert eng.mvs.last_substitution == "votes_sum"
    assert len(out) == 1 and "story_id" in out[0]


def test_streaming_sum_view_answers_base_table_aggregate(spark, sf_dir):
    """End-to-end: a LIVE SumView (continuously maintained from a CDC
    stream) registered as the materialized answer to the base-table
    aggregate — the full reference topology (scan -> sum QPU -> client
    query) expressed as stream + rewrite. The client's base-table SQL is
    served from streaming state, and the state matches the batch answer
    after catch-up."""
    from proteus_spark.sources import cdc
    from proteus_spark.streaming.views import SumView

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "value")
    ev.createOrReplaceTempView("events_base")
    src = cdc.stage_stream(spark, ev, chunks=3)
    view = SumView(
        spark, src.subscribe(), group_by="user_id", agg_attr="value",
        name="t_sum_mv", mode="append",
    )
    view.start()
    eng = Engine(spark)
    eng.register_materialized(
        "events_sum_view",
        "SELECT user_id, SUM(value) AS value_sum FROM events_base GROUP BY user_id",
        provider=lambda: view.snapshot().select("user_id", "value_sum"),
    )
    try:
        view.await_catch_up()
        got = eng.query(
            "SELECT user_id, SUM(value) AS value_sum "
            "FROM events_base GROUP BY user_id"
        )
        assert eng.mvs.last_substitution == "events_sum_view"
        a = {r["user_id"]: round(r["value_sum"], 4) for r in got.collect()}
        direct = ev.groupBy("user_id").sum("value").collect()
        b = {r[0]: round(r[1], 4) for r in direct}
        assert a == b
    finally:
        view.stop()
        cdc.cleanup(src)


def test_non_default_null_ordering_falls_through(eng):
    """An explicit NULLS clause that differs from Spark's default for the
    direction could reorder NULL-bearing results; substitution declines."""
    df = eng.query(DEF_SQL + " ORDER BY vote_sum DESC NULLS FIRST LIMIT 5")
    assert eng.mvs.last_substitution is None
    assert df.count() == 5
