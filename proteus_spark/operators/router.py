"""Router / scatter-gather union.

Reference parity: the RouterQPU fans a query out to ALL adjacent QPUs
concurrently and concatenates their record lists — a bag UNION ALL with no
pruning (reference: internal/qpu_classes/router/router.go:43-78; the
router broadcasts to every child regardless of the predicate —
router.go:50-59).

Spark shape: ``unionByName`` over the shard DataFrames. Spark's scheduler
*is* the router — each shard scans in parallel tasks — and, unlike the
reference, a predicate on the partition column actually prunes shards
(partition pruning / parquet min-max skipping), which is the behavior you
want at 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_router(children: list[DataFrame], allow_missing: bool = False) -> DataFrame:
    """Bag-union of child results (router.go:43-78). ``allow_missing``
    fills absent columns with NULL when shards drifted."""
    if not children:
        raise ValueError("router requires at least one child")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), children
    )
