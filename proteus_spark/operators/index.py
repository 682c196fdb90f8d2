"""Secondary-index operator.

Reference parity: the InMemIndex QPU maintains a B-tree over one int
attribute within a configured value range [lbound, ubound) and answers EQ
and range lookups from it (reference:
internal/qpu_classes/inMemIndex/inMemIndex.go:453-617 (btree),
139-154 (range subscription), 519-550 (lookup)); a Mongo-backed durable
variant exists (internal/qpu_classes/index/index.go:232-268,281-339).
Partitioned deployments put two index shards behind a router
(confs/index0.toml [0,50), confs/index1.toml [50,100)).

Spark shape: a user-managed index structure is unnecessary — the scan-time
equivalents are (a) range partitioning so a predicate prunes whole
partitions, and (b) parquet min-max row-group skipping, both driven by the
same ``filter`` expression. ``RangeIndex`` materializes a range-partitioned,
range-sorted copy of the input keyed on the attribute (the analogue of
"build the index"), and serves lookups with reference semantics:

- EQ lookup: the reference implements EQ as the degenerate range
  [v, v+1) over int keys (inMemIndex.go:539-541)
- results capped at 20 records (inMemIndex.go:245-247) — generalized to a
  configurable ``lookup_limit`` (the hardcode is called out in SURVEY §7.4);
  we order by the indexed attribute then key for a deterministic cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proteus_spark.operators.filters import range_pred

DEFAULT_LOOKUP_LIMIT = 20  # reference hardcode: inMemIndex.go:245-247


class RangeIndex:
    def __init__(
        self,
        df: DataFrame,
        attribute: str,
        key: str,
        lbound=None,
        ubound=None,
        num_partitions: int | None = None,
        materialize: bool = True,
    ):
        """Build the "index": restrict to [lbound, ubound) (the configured
        index responsibility range — config.go:330-369), range-partition by
        the attribute, sort within partitions, and cache.

        On a cluster this would be a bucketed/Z-ordered table; in-session,
        ``repartitionByRange`` + ``sortWithinPartitions`` + ``cache`` gives
        the same pruning/locality properties.
        """
        self.attribute = attribute
        self.key = key
        scoped = df.filter(range_pred(attribute, lbound, ubound))
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        self._data = scoped.repartitionByRange(n, F.col(attribute)).sortWithinPartitions(
            attribute, key
        )
        if materialize:
            self._data = self._data.cache()

    def lookup_eq(self, value, limit: int | None = DEFAULT_LOOKUP_LIMIT) -> DataFrame:
        """EQ lookup = degenerate range [v, v+1) on int attributes
        (inMemIndex.go:539-541)."""
        return self.lookup_range(value, value + 1, limit=limit)

    def lookup_range(
        self, lbound=None, ubound=None, limit: int | None = DEFAULT_LOOKUP_LIMIT
    ) -> DataFrame:
        """Range lookup [lbound, ubound) (queries.go:183-209 bounds
        semantics), deterministic cap ordered by (attribute, key)."""
        out = self._data.filter(range_pred(self.attribute, lbound, ubound))
        if limit is not None:
            out = out.orderBy(self.attribute, self.key).limit(limit)
        return out

    def dataframe(self) -> DataFrame:
        return self._data


class DurableRangeIndex:
    """Durable index variant (reference: the Mongo-backed IndexQPU,
    internal/qpu_classes/index/index.go:232-268,281-339): the index IS a
    range-bucket-partitioned parquet table on disk.

    ``bucket = floor(attribute / bucket_width)`` becomes the physical
    partition column, so a lookup's bounds translate to a partition-filter
    list and Spark prunes whole directories before any IO — the at-rest
    analogue of the in-memory variant's repartitionByRange (at deployment
    scale: a partitioned/Z-ordered lake table maintained by the streaming
    upsert path). Files are sorted within partitions on (attribute, key)
    so row-group min-max stats skip within the surviving buckets too.
    """

    BUCKET_COL = "_idx_bucket"

    def __init__(
        self,
        df: DataFrame,
        attribute: str,
        key: str,
        path: str,
        bucket_width: int = 10,
        lbound=None,
        ubound=None,
    ):
        self.attribute = attribute
        self.key = key
        self.path = path
        self.bucket_width = bucket_width
        scoped = df.filter(range_pred(attribute, lbound, ubound))
        (
            scoped.withColumn(
                self.BUCKET_COL, F.floor(F.col(attribute) / bucket_width)
            )
            .repartition(F.col(self.BUCKET_COL))
            .sortWithinPartitions(attribute, key)
            .write.mode("overwrite")
            .partitionBy(self.BUCKET_COL)
            .parquet(path)
        )
        self._spark = df.sparkSession

    def lookup_range(
        self, lbound=None, ubound=None, limit: int | None = DEFAULT_LOOKUP_LIMIT
    ) -> DataFrame:
        df = self._spark.read.parquet(self.path)
        out = df.filter(range_pred(self.attribute, lbound, ubound))
        # translate the value bounds to partition-column bounds so the
        # filter lands in PartitionFilters (directory pruning)
        if lbound is not None:
            out = out.filter(
                F.col(self.BUCKET_COL) >= (int(lbound) // self.bucket_width)
            )
        if ubound is not None:
            out = out.filter(
                F.col(self.BUCKET_COL) <= (int(ubound) // self.bucket_width)
            )
        out = out.drop(self.BUCKET_COL)
        if limit is not None:
            out = out.orderBy(self.attribute, self.key).limit(limit)
        return out

    def lookup_eq(self, value, limit: int | None = DEFAULT_LOOKUP_LIMIT) -> DataFrame:
        return self.lookup_range(value, value + 1, limit=limit)
