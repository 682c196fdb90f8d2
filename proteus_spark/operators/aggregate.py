"""Aggregation operators.

Reference parity: the SumQPU maintains ``SUM(aggAttr) GROUP BY groupByAttr``
over one input table; the output table is renamed ``<table>_sum`` and the
aggregate column ``<attr>_sum`` (reference:
internal/qpu_classes/sum/sum.go:108-121,158-160; config
internal/libqpu/types.go:137-141). Sum is the only aggregate in the
reference's enum (types.go:188-194); Spark gives the full set for free, so
``agg_view`` exposes count/avg/min/max/distinct as first-class citizens.

Scale notes: ``groupBy().agg()`` compiles to partial (map-side) aggregation
+ a single hash-partitioned exchange on the group key + final aggregation —
exactly the incremental-total structure the reference hand-rolls per delta
(sum.go:250-285), but shuffle-parallel and codegen'd. Low-cardinality group
keys at 100 TB are safe: partial aggregation collapses rows before the
shuffle, so exchange volume is O(#groups x #map tasks), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sum_view(
    df: DataFrame,
    group_by: str,
    agg_attr: str,
    carry: list[str] | None = None,
) -> DataFrame:
    """SumQPU semantics: one row per group with ``<attr>_sum``.

    ``carry`` columns reproduce the reference's group-metadata
    carry-through — non-aggregated attributes of the group kept on the group
    row (sum.go:251-274). The reference keeps the *last-seen* record's
    values, which is arrival-order-dependent; we use ``max`` for a
    deterministic equivalent (documented deviation, SURVEY §7.4).
    """
    aggs = [F.sum(agg_attr).alias(f"{agg_attr}_sum")]
    for c in carry or []:
        aggs.append(F.max(c).alias(c))
    return df.groupBy(group_by).agg(*aggs)


def agg_view(
    df: DataFrame,
    group_by: list[str],
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Full aggregation surface (beyond-reference; SURVEY §2.4 notes the
    reference lacks COUNT/AVG/MIN/MAX/DISTINCT — Spark has them built in).

    ``specs``: output_name -> (function, column); function in
    {sum,count,avg,min,max,count_distinct,approx_count_distinct}.
    """
    fns = {
        "sum": F.sum,
        "count": F.count,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count_distinct": F.countDistinct,
        "approx_count_distinct": F.approx_count_distinct,
    }
    aggs = [fns[fn](col).alias(name) for name, (fn, col) in specs.items()]
    return df.groupBy(*group_by).agg(*aggs)


def salted_sum_view(
    df: DataFrame,
    group_by: str,
    agg_attr: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted SUM for skewed group keys.

    At 100 TB a handful of hot keys can pin a shuffle partition to one
    reducer; AQE's skew handling splits skewed JOIN partitions but a
    skewed AGGREGATION key still lands on one task after the exchange.
    Classic fix: shuffle on (key, salt) first — hot keys fan out over
    ``salt_buckets`` reducers — then combine the per-salt partials with a
    second (now uniform, #keys x buckets rows) aggregation.

    Results are identical to ``sum_view`` (sums re-associate); the oracle
    for any query using this is the plain GROUP BY. Worth it only when the
    key distribution is actually skewed — two exchanges beat one saturated
    straggler, not one healthy exchange.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(group_by, "_salt").agg(
        F.sum(agg_attr).alias("_partial")
    )
    return partial.groupBy(group_by).agg(
        F.sum("_partial").alias(f"{agg_attr}_sum")
    )
