"""Custom Python DataSource — the 'new datastore driver' extension point.

The reference's source plane is extended by implementing the ``dataStore``
Go interface (GetSnapshot/SubscribeOps,
internal/qpu_classes/datastore_driver/datastoredriver.go:36-40) and
registering it with the driver QPU. Spark 4's Python DataSource API is the
exact counterpart: subclass ``DataSource``/``DataSourceReader``, register
on the session, and ``spark.read.format(name)`` plans partitioned reads
through it like any built-in source — partition pruning, AQE, and the rest
of Catalyst apply downstream.

``register_mock_datasource`` reimplements the reference's mock datastore
(1000 objects, ``attribute0`` uniform [0,100) —
datastore_driver/mock/store.go:36-55) as a REAL pluggable source: rows are
generated per input partition ON EXECUTORS (the md5-derived attribute is
computed in Python here, matching functions/texthash.py bit-for-bit), so a
billion-object mock scales across the cluster like a real connector. The
DuckDB oracle (sources.mock.mock_table_oracle_sql) regenerates the
identical table, so the custom-source path is value-checked end to end.

The classes are defined INSIDE the factory so cloudpickle ships them BY
VALUE to executor workers — a module-level class pickles by reference and
breaks when the driver runs from a cwd where ``proteus_spark`` is not
importable (the external harness does exactly that).
"""

from __future__ import annotations


def register_mock_datasource(spark) -> str:
    """Register the ``proteus_mock`` format on the session (idempotent);
    returns the format name."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Range(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class MockStoreReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.num_partitions = int(options.get("numPartitions", 8))

        def partitions(self):
            per = max(1, -(-self.n // self.num_partitions))
            return [
                _Range(i, min(i + per, self.n)) for i in range(0, self.n, per)
            ]

        def read(self, partition):
            # executor-side row generation; md5 identical to
            # functions/texthash.py portable_hash_sql (seed 'mock',
            # first 12 hex chars)
            import hashlib

            for i in range(partition.start, partition.end):
                oid = f"object{i}"
                hx = hashlib.md5(f"mock|{oid}".encode()).hexdigest()
                yield (oid, int(hx[:12], 16) % 100)

    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class MockStoreStreamReader(SimpleDataSourceStreamReader):
        """SubscribeOps parity (mysql/store.go:117-151): the mock store as
        a rate-limited op feed — each micro-batch emits the next ``rate``
        objects until all ``n`` have streamed. Offsets are plain row
        indices, so restarts resume exactly (the binlog-position model)."""

        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.rate = int(options.get("rowsPerBatch", 250))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            import hashlib

            lo = start["pos"]
            hi = min(lo + self.rate, self.n)
            rows = []
            for i in range(lo, hi):
                oid = f"object{i}"
                hx = hashlib.md5(f"mock|{oid}".encode()).hexdigest()
                rows.append((oid, int(hx[:12], 16) % 100))
            return iter(rows), {"pos": hi}

        def readBetweenOffsets(self, start, end):
            it, _ = self.read(start)
            return it

    class MockStoreDataSource(DataSource):
        """spark.read.format("proteus_mock").option("n", 1000).load() or
        spark.readStream.format("proteus_mock").load() for the op feed."""

        @classmethod
        def name(cls) -> str:
            return "proteus_mock"

        def schema(self) -> str:
            return "object_id string, attribute0 int"

        def reader(self, schema):
            return MockStoreReader(self.options)

        def simpleStreamReader(self, schema):
            return MockStoreStreamReader(self.options)

    spark.dataSource.register(MockStoreDataSource)
    return "proteus_mock"
