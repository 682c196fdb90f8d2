"""Automatic materialized-view substitution.

In the reference, queries hit precomputed sum/join state because a human
WIRED the topology that way: the client asks the SumQPU's output table by
name and the QPU serves its in-memory groups (sum.go:149-180); there is no
rewriter because there is no planner. SURVEY §4 notes the one genuinely
custom optimizer piece a Spark port could add: answer a BASE-TABLE query
from a maintained view automatically, so clients need not know the
topology.

This module does that with zero false positives by reusing Catalyst's own
semantic-equality test instead of a hand-rolled SQL matcher:

- a view registers with its DEFINING SQL; the catalog keeps the ANALYZED
  logical plan (alias names, case, whitespace all normalized away by
  canonicalization inside ``sameResult``);
- an incoming query matches when its analyzed plan ``sameResult``s a
  registered definition — Catalyst's check, which accounts for relation
  identity (two same-schema parquet tables do NOT collide);
- additionally, a top-k wrapper — ORDER BY <output attrs> [ASC|DESC]
  LIMIT n over a matching core — is peeled off structurally
  (GlobalLimit/LocalLimit/Sort nodes) and re-applied to the view's
  snapshot, because top-k-over-view is the reference's flagship read
  (``ORDER BY vote_sum DESC LIMIT 5``, sqlparser_test.go:42-56). Sort
  keys that are not plain column references fall through to normal
  execution — substitution never guesses.

Freshness semantics are the reference's: the view serves its CURRENT
state, which may trail the base table — that is what a continuously
maintained view is for (Documentation.md materialized-view model).

At 100 TB this is the difference between a seconds-long re-aggregation of
the fact table and a millisecond read of a keyed state table.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class _MV:
    name: str
    jplan: object  # analyzed logical plan of the defining SQL
    provider: Callable[[], DataFrame]


def _analyzed(spark: SparkSession, sql: str):
    return spark.sql(sql)._jdf.queryExecution().analyzed()


def _cls(jnode) -> str:
    return jnode.getClass().getSimpleName()


def _unwrap_topk(jplan):
    """Peel GlobalLimit(LocalLimit(Sort(core))) / Sort(core) /
    GlobalLimit(LocalLimit(core)) off an analyzed plan.

    Returns (core_jplan, sort_keys, limit) where sort_keys is a list of
    (column_name, ascending) — or (jplan, None, None) when the top of the
    plan is not a recognizable top-k wrapper, and raises ValueError when a
    wrapper exists but is not expressible over the view's output columns
    (e.g. ORDER BY an expression), so callers fall back to normal
    execution rather than mis-serve."""
    limit = None
    node = jplan
    if _cls(node) == "GlobalLimit":
        limit = node.limitExpr().eval(None)
        if _cls(node.child()) != "LocalLimit":
            raise ValueError("GlobalLimit without LocalLimit")
        node = node.child().child()
    keys = None
    if _cls(node) == "Sort":
        keys = []
        it = node.order().iterator()
        while it.hasNext():
            so = it.next()
            child = so.child()
            if _cls(child) != "AttributeReference":
                raise ValueError("non-column sort key")
            asc = "Ascending" in so.direction().toString()
            # re-application uses Spark's DEFAULT null placement (asc ->
            # NULLS FIRST, desc -> NULLS LAST); an explicit non-default
            # NULLS clause would reorder differently, so decline rather
            # than mis-serve
            nulls = so.nullOrdering().toString()
            if (asc and nulls != "NullsFirst") or (not asc and nulls != "NullsLast"):
                raise ValueError("non-default null ordering")
            keys.append((child.name(), asc))
        node = node.child()
    return node, keys, limit


class MVCatalog:
    """Registered materialized views + the substitution attempt."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._views: list[_MV] = []
        self.last_substitution: str | None = None

    def register(
        self,
        name: str,
        defining_sql: str,
        provider: Callable[[], DataFrame] | None = None,
    ) -> None:
        """Register ``name`` as a materialized view answering
        ``defining_sql``. ``provider`` returns the CURRENT snapshot (a
        streaming view's ``snapshot()``); default materializes the
        defining query once, eagerly, as a static snapshot."""
        jplan = _analyzed(self.spark, defining_sql)
        if provider is None:
            # materialize eagerly but DISTRIBUTED (persist + force): a
            # driver-side collect of a large view would OOM exactly where
            # an MV matters most
            snap = self.spark.sql(defining_sql).persist()
            snap.count()
            provider = lambda: snap  # noqa: E731
        self._views.append(_MV(name=name, jplan=jplan, provider=provider))

    def try_substitute(self, df: DataFrame) -> DataFrame | None:
        """Return ``df`` served from a registered view, or None.

        The match is on the ANALYZED plan: exact semantic equality
        (Catalyst ``sameResult``) of the query — or of its core under a
        peelable ORDER-BY/LIMIT wrapper — with a view's defining plan.
        The substituted result carries the QUERY's output column names
        (aliases differ freely; canonicalization ignores them)."""
        self.last_substitution = None
        if not self._views:
            return None
        jplan = df._jdf.queryExecution().analyzed()
        try:
            core, keys, limit = _unwrap_topk(jplan)
        except ValueError:
            return None
        for mv in self._views:
            if not core.sameResult(mv.jplan):
                continue
            snap = mv.provider()
            if snap is None:
                continue
            out = snap
            if keys is not None:
                # sort keys name view OUTPUT columns; the view snapshot
                # carries its defining query's output names, which map
                # positionally onto the core's output (sameResult
                # guarantees semantically-equal output lists)
                it = core.output().iterator()
                core_names = []
                while it.hasNext():
                    core_names.append(it.next().name())
                rename = dict(zip(core_names, snap.columns))
                try:
                    cols = [
                        F.col(rename[n]).asc() if asc else F.col(rename[n]).desc()
                        for n, asc in keys
                    ]
                except KeyError:
                    continue
                out = out.orderBy(*cols)
            if limit is not None:
                out = out.limit(int(limit))
            self.last_substitution = mv.name
            return out.toDF(*df.columns)
        return None
