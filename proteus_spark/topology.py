"""Declarative operator topologies — "the deployed DAG is the plan".

The reference has no planner: a deployment IS a set of TOML files, one per
QPU, each naming its operator class, its config, and its upstream
connections (internal/config/config.go:17-99; e.g. confs/index0.toml:
``operator = "inMemIndex"``, ``[IndexConfig] lbound/ubound``,
``[[connections]] address``). This module gives the same declarative
surface on Spark: one TOML document describes the operator DAG; building
it composes the corresponding DataFrame transforms in dependency order and
registers every node as a queryable view.

The crucial difference from the reference: here the declaration only
states WHAT each node computes — Catalyst still plans HOW (pushdown
through the whole composed tree, broadcast selection, partition pruning),
so a declared topology executes as ONE optimized plan instead of N
processes streaming records over gRPC.

Example (the reference's Lobsters deployment,
configs/cloudserver-federation/localdev/sum-stories.toml):

    [nodes.votes]
    operator = "scan"
    table = "lineitem"

    [nodes.vote_sum]
    operator = "sum"
    input = "votes"
    group_by = "l_orderkey"
    agg_attr = "vote"

    [nodes.stories_top]
    operator = "topk"
    input = "vote_sum"
    by = "vote_sum"
    k = 5
"""

from __future__ import annotations

import tomllib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
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
from proteus_spark.registry import load


def _pred(spec: dict):
    kind = spec["kind"]
    if kind == "eq":
        return eq(spec["attribute"], spec["value"])
    if kind == "range":
        return range_pred(spec["attribute"], spec.get("lbound"), spec.get("ubound"))
    if kind == "isnull":
        return is_null(spec["attribute"])
    if kind == "isnotnull":
        return is_not_null(spec["attribute"])
    raise ValueError(f"unknown predicate kind {kind!r}")


def build_topology(
    spark: SparkSession,
    sf_dir: str,
    toml_text: str,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Build every node of a TOML-declared topology; returns name -> DataFrame.

    Nodes are resolved in dependency order (inputs may appear in any
    textual order, like the reference's per-process configs). Supported
    operators mirror the reference's classes: scan, filter, sum, join,
    index, topk, router, project.
    """
    doc = tomllib.loads(toml_text)
    nodes: dict[str, dict] = doc.get("nodes", {})
    built: dict[str, DataFrame] = {}

    def dep_names(spec: dict) -> list[str]:
        if "input" in spec:
            return [spec["input"]]
        return list(spec.get("inputs", []))

    def build(name: str, stack: tuple = ()) -> DataFrame:
        if name in built:
            return built[name]
        if name in stack:
            raise ValueError(f"cycle in topology at {name!r}")
        spec = nodes.get(name)
        if spec is None:
            raise ValueError(f"node {name!r} not declared")
        ins = [build(d, stack + (name,)) for d in dep_names(spec)]
        op = spec["operator"]
        if op == "scan":
            df = load(spark, sf_dir, spec["table"])
            if "columns" in spec:
                df = df.select(*spec["columns"])
        elif op == "project":
            df = ins[0].selectExpr(*spec["exprs"])
        elif op == "filter":
            df = apply_predicates(ins[0], [_pred(p) for p in spec["predicates"]])
        elif op == "sum":
            df = sum_view(ins[0], spec["group_by"], spec["agg_attr"])
        elif op == "join":
            df = keyed_merge_join(
                ins[0], ins[1], key=spec["key"], defaults=spec.get("defaults", {})
            )
        elif op == "index":
            idx = RangeIndex(
                ins[0],
                attribute=spec["attribute"],
                key=spec["key"],
                lbound=spec["lbound"],
                ubound=spec["ubound"],
            )
            lb, ub = spec.get("lookup_lbound"), spec.get("lookup_ubound")
            df = idx.lookup_range(lb, ub)
        elif op == "topk":
            df = topk(
                ins[0],
                by=spec["by"],
                k=spec.get("k", 5),
                descending=spec.get("descending", True),
                tiebreak=spec.get("tiebreak", []),
            )
        elif op == "router":
            df = union_router(ins)
        elif op == "cache":
            # CacheQPU as a topology node (cache.go:81-153): materialize the
            # child once, serve repeat reads from memory. Spark's .cache()
            # is version-consistent within a session; the reference's
            # cross-update LRU + invalidation semantics live in
            # proteus_spark.cache.CachedEngine (keyed on source versions).
            df = ins[0].cache()
        else:
            raise ValueError(f"unknown operator {op!r} for node {name!r}")
        built[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
            from proteus_spark.registry import invalidate_view

            invalidate_view(spark, name)
        return df

    for n in nodes:
        build(n)
    return built


# The reference's Lobsters deployment as a topology document
# (configs/cloudserver-federation/localdev/sum-stories.toml shape).
LOBSTERS_EXAMPLE = """
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
columns = ["o_orderkey"]

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


# The YCSB-style deployment from the reference's confs/: two range-scoped
# index shards ([0,25) / [25,50) over p_size here; the reference uses
# attribute0 with [0,50)/[50,100) — confs/index0.toml, confs/index1.toml)
# behind a scatter-gather router (confs/router.toml). Each shard serves its
# configured lookup, capped at 20 records (inMemIndex.go:245-247); the
# router is a bag union.
YCSB_EXAMPLE = """
[nodes.parts]
operator = "scan"
table = "part"
columns = ["p_partkey", "p_size"]

[nodes.index0]
operator = "index"
input = "parts"
attribute = "p_size"
key = "p_partkey"
lbound = 0
ubound = 25
lookup_lbound = 10
lookup_ubound = 25

[nodes.index1]
operator = "index"
input = "parts"
attribute = "p_size"
key = "p_partkey"
lbound = 25
ubound = 50
lookup_lbound = 25
lookup_ubound = 40

[nodes.router]
operator = "router"
inputs = ["index0", "index1"]
"""
