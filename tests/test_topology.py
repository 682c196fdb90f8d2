"""TOML-declared topology parity: the reference's two canonical
deployments, declared the way the reference declares them (one operator
per node + connections; confs/*.toml, sum-stories.toml), built into one
Catalyst-optimized plan each.
"""

from __future__ import annotations

import pytest

from proteus_spark.topology import build_topology

LOBSTERS = """
[nodes.votes]
operator = "scan"
table = "lineitem"

[nodes.vote_col]
operator = "project"
input = "votes"
exprs = ["l_orderkey AS o_orderkey", "l_extendedprice * (1 - l_discount) AS vote"]

[nodes.vote_sum]
operator = "sum"
input = "vote_col"
group_by = "o_orderkey"
agg_attr = "vote"

[nodes.stories]
operator = "scan"
table = "orders"
columns = ["o_orderkey", "o_orderpriority"]

[nodes.stories_joined]
operator = "join"
inputs = ["stories", "vote_sum"]
key = "o_orderkey"
[nodes.stories_joined.defaults]
vote_sum = 0.0

[nodes.stories_top]
operator = "topk"
input = "stories_joined"
by = "vote_sum"
k = 5
tiebreak = ["o_orderkey"]
"""

from proteus_spark.topology import YCSB_EXAMPLE as YCSB  # noqa: E402


def test_lobsters_topology_matches_flagship(spark, sf_dir):
    """sum-stories.toml deployment == the flagship pipeline's answer."""
    from proteus_spark.registry import all_queries

    nodes = build_topology(spark, sf_dir, LOBSTERS)
    got = [
        (r["o_orderkey"], round(r["vote_sum"], 4))
        for r in nodes["stories_top"].collect()
    ]
    want = [
        (r["story_id"], round(r["vote_sum"], 4))
        for r in all_queries()["ref_lobsters_topk"](spark, sf_dir).collect()
    ]
    assert got == want
    # every node is queryable by name — GetConfig/spark.catalog parity
    assert spark.sql("SELECT count(*) FROM vote_sum").collect()[0][0] > 0


def test_ycsb_partitioned_index_router(spark, sf_dir):
    """confs/index0+index1+router deployment: two range-partitioned index
    shards behind a scatter-gather router == the capped per-shard lookups
    unioned (reference caps each lookup at 20, inMemIndex.go:245-247)."""
    nodes = build_topology(spark, sf_dir, YCSB)
    got = sorted(
        (r["p_partkey"], r["p_size"]) for r in nodes["router"].collect()
    )
    want = sorted(
        (r["p_partkey"], r["p_size"])
        for r in spark.sql(
            """
            (SELECT p_partkey, p_size FROM parts
             WHERE p_size >= 10 AND p_size < 25
             ORDER BY p_size, p_partkey LIMIT 20)
            UNION ALL
            (SELECT p_partkey, p_size FROM parts
             WHERE p_size >= 25 AND p_size < 40
             ORDER BY p_size, p_partkey LIMIT 20)
            """
        ).collect()
    )
    assert got == want and len(got) > 0


def test_topology_rejects_cycles_and_unknowns(spark, sf_dir):
    with pytest.raises(ValueError, match="cycle"):
        build_topology(
            spark,
            sf_dir,
            """
            [nodes.a]
            operator = "topk"
            input = "b"
            by = "x"
            [nodes.b]
            operator = "topk"
            input = "a"
            by = "x"
            """,
        )
    with pytest.raises(ValueError, match="not declared"):
        build_topology(
            spark,
            sf_dir,
            """
            [nodes.a]
            operator = "topk"
            input = "ghost"
            by = "x"
            """,
        )


def test_topology_cache_node(spark, sf_dir):
    """All 7 reference QPU classes are declarable: a cache node
    materializes its child and serves identical results."""
    toml_text = """
    [nodes.votes]
    operator = "scan"
    table = "lineitem"
    columns = ["l_orderkey", "l_quantity"]

    [nodes.vote_sum]
    operator = "sum"
    input = "votes"
    group_by = "l_orderkey"
    agg_attr = "l_quantity"

    [nodes.cached_sum]
    operator = "cache"
    input = "vote_sum"
    """
    built = build_topology(spark, sf_dir, toml_text)
    try:
        a = {r[0]: r[1] for r in built["vote_sum"].collect()}
        b = {r[0]: r[1] for r in built["cached_sum"].collect()}
        assert a == b and len(b) > 0
        assert built["cached_sum"].storageLevel.useMemory
    finally:
        built["cached_sum"].unpersist()
