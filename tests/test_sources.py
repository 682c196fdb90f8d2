"""Batch source drivers (SURVEY §2.1): JDBC reader configuration and the
S3-style object scan (binaryFile + metadata manifest) on a local dir."""

from __future__ import annotations

import pytest

from proteus_spark.sources.batch import JDBCTableSource, S3ObjectSource, parquet_source


def test_jdbc_options_plain():
    src = JDBCTableSource(url="jdbc:mysql://db:3306/proteus", table="stories")
    opts = src.options()
    assert opts["url"].startswith("jdbc:mysql")
    assert opts["dbtable"] == "stories"
    assert "partitionColumn" not in opts


def test_jdbc_options_partitioned_scan():
    src = JDBCTableSource(
        url="jdbc:mysql://db:3306/proteus",
        table="votes",
        partition_column="story_id",
        num_partitions=64,
        lower=0,
        upper=1_000_000,
    )
    opts = src.options()
    assert opts["numPartitions"] == "64"
    assert opts["partitionColumn"] == "story_id"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"


def test_jdbc_partitioned_requires_bounds():
    src = JDBCTableSource(
        url="jdbc:x", table="t", partition_column="k"
    )
    with pytest.raises(ValueError, match="lower"):
        src.options()


def test_jdbc_reader_builds(spark):
    # reader construction must not require a live database
    JDBCTableSource(url="jdbc:mysql://db/x", table="t").reader(spark)


@pytest.fixture(scope="module")
def object_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bucket")
    (d / "a.txt").write_bytes(b"alpha")
    (d / "b.txt").write_bytes(b"beta-beta")
    (d / "c.bin").write_bytes(b"\x00\x01")
    return d


def test_s3_scan_objects_only(spark, object_dir):
    rows = S3ObjectSource(path=str(object_dir)).objects(spark).collect()
    assert len(rows) == 3
    got = {r.path.rsplit("/", 1)[-1]: r for r in rows}
    assert got["a.txt"].length == 5
    assert bytes(got["b.txt"].content) == b"beta-beta"


def test_s3_scan_with_manifest_attributes(spark, object_dir):
    # the x-amz-meta-* stand-in: per-object attributes in a manifest table
    manifest = spark.createDataFrame(
        [
            (f"file:{object_dir}/a.txt", "en", 1),
            (f"file:{object_dir}/b.txt", "de", 2),
        ],
        "object_path string, lang string, attribute0 int",
    )
    src = S3ObjectSource(path=str(object_dir), path_glob="*.txt", manifest=manifest)
    df = src.scan(spark, with_content=False)
    assert "content" not in df.columns
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert len(rows) == 2  # glob filtered c.bin out
    assert rows["a.txt"].lang == "en" and rows["a.txt"].attribute0 == 1
    assert rows["b.txt"].lang == "de"


def test_parquet_source_schema_contract(spark, sf_dir):
    from proteus_spark.schema import TESTDATA_SCHEMAS

    df = parquet_source(
        spark, f"{sf_dir}/orders.parquet", TESTDATA_SCHEMAS.get("orders")
    )
    assert df.count() > 0
    with pytest.raises(ValueError, match="schema drift"):
        parquet_source(
            spark, f"{sf_dir}/orders.parquet", TESTDATA_SCHEMAS.get("customer")
        )


def test_corpus_source_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """JSONL corpus ingest: explicit schema, no inference pass, columns
    prune to the fields a query touches."""
    import json as _json

    from proteus_spark.sources.batch import corpus_source

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).collect()
    path = tmp_path / "corpus.jsonl"
    with open(path, "w") as f:
        for r in docs:
            f.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"],
                                 "lang": r["lang"]}) + "\n")
    df = corpus_source(
        spark, str(path), fmt="jsonl",
        schema="doc_id long, text string, lang string",
    )
    assert df.count() == 50
    got = {r["doc_id"]: r["text"] for r in df.collect()}
    assert got == {r["doc_id"]: r["text"] for r in docs}
    # explicit schema -> no inference job; projection prunes to one field
    assert df.select("text").schema.fieldNames() == ["text"]


def test_corpus_source_requires_schema(spark, tmp_path):
    import pytest as _pytest

    from proteus_spark.sources.batch import corpus_source

    with _pytest.raises(ValueError, match="explicit schema"):
        corpus_source(spark, str(tmp_path), fmt="jsonl")


def test_debezium_parse_envelope_ops(spark):
    """Envelope -> canonical delta mapping: c/r -> STATE, u -> UPDATEDELTA
    (old+new images), d -> DELETE tombstone; ts_ms -> _ts micros; key
    resolves from after when present, else before (delete)."""
    from pyspark.sql import types as T

    from proteus_spark.sources.debezium import parse_envelope

    row_schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    lines = spark.createDataFrame(
        [
            ('{"payload":{"before":null,"after":{"k":1,"v":10.0},'
             '"op":"c","ts_ms":1000}}',),
            ('{"payload":{"before":{"k":1,"v":10.0},"after":{"k":1,"v":25.0},'
             '"op":"u","ts_ms":2000}}',),
            ('{"payload":{"before":{"k":2,"v":7.0},"after":null,'
             '"op":"d","ts_ms":3000}}',),
            ('{"payload":{"before":null,"after":{"k":3,"v":1.5},'
             '"op":"r","ts_ms":4000}}',),
        ],
        "value string",
    )
    out = {r["op_type"]: r for r in
           parse_envelope(lines, row_schema, ["k"], "v").collect()}
    assert out["STATE"]["k"] in (1, 3) and out["STATE"]["old_value"] is None
    u = out["UPDATEDELTA"]
    assert (u["k"], u["old_value"], u["new_value"], u["_ts"]) == (1, 10.0, 25.0, 2_000_000)
    d = out["DELETE"]
    assert (d["k"], d["old_value"], d["new_value"]) == (2, 7.0, None)


def test_debezium_parse_envelope_flattened(spark):
    """schemas.enable=false layout (no payload wrapper) parses identically."""
    from pyspark.sql import types as T

    from proteus_spark.sources.debezium import parse_envelope

    row_schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    lines = spark.createDataFrame(
        [('{"before":{"k":5,"v":2.0},"after":{"k":5,"v":4.0},'
          '"op":"u","ts_ms":9000}',)],
        "value string",
    )
    r = parse_envelope(lines, row_schema, ["k"], "v").collect()[0]
    assert (r["k"], r["op_type"], r["old_value"], r["new_value"], r["_ts"]) == (
        5, "UPDATEDELTA", 2.0, 4.0, 9_000_000)


def test_incremental_scan_bookmark(spark, tmp_path):
    """File-bookmark incremental ingest: batch 2 reads ONLY files that
    landed after batch 1 committed; an uncommitted batch re-delivers
    (at-least-once); an empty poll returns None."""
    from proteus_spark.sources.incremental import IncrementalScan

    d = str(tmp_path / "landing")
    import os

    os.makedirs(d)

    def land(name, vals):
        spark.createDataFrame([(v,) for v in vals], "x bigint").coalesce(
            1
        ).write.parquet(str(tmp_path / "stg"))
        src = next(
            f for f in os.listdir(tmp_path / "stg") if f.endswith(".parquet")
        )
        os.replace(str(tmp_path / "stg" / src), os.path.join(d, name))
        import shutil as _sh

        _sh.rmtree(tmp_path / "stg")

    scan = IncrementalScan(spark, d)
    land("a.parquet", [1, 2])
    df, files = scan.new_files()
    assert files == ["a.parquet"] and df.count() == 2
    # not committed -> re-delivered
    df2, files2 = scan.new_files()
    assert files2 == ["a.parquet"]
    scan.commit(files2)
    assert scan.new_files() == (None, [])
    land("b.parquet", [3])
    df3, files3 = scan.new_files()
    assert files3 == ["b.parquet"]
    assert sorted(r["x"] for r in df3.collect()) == [3]
    scan.commit(files3)
    assert scan.new_files() == (None, [])


def test_compact_table_preserves_content_and_prunes(spark, tmp_path):
    """Small-file compaction: 16 files fold to 1, content identical, and
    with a sort key the output files carry disjoint ranges (footer stats
    prune range predicates post-compaction)."""
    from proteus_spark.sources.incremental import compact_table

    d = str(tmp_path / "t")
    spark.range(10_000).selectExpr("id AS k", "id * 2 AS v").repartition(
        16
    ).write.parquet(d)
    import os

    assert sum(1 for f in os.listdir(d) if f.endswith(".parquet")) == 16
    before = spark.read.parquet(d).selectExpr("sum(k)", "count(*)").collect()
    n = compact_table(spark, d, target_mb=512, sort_col="k")
    assert n == 1
    after = spark.read.parquet(d).selectExpr("sum(k)", "count(*)").collect()
    assert before == after


def test_jdbc_live_partitioned_scan_embedded_derby(spark, tmp_path):
    """LIVE end-to-end JDBC scan — no mocking: an embedded Derby database
    (the JDBC engine Spark ships for its Hive metastore) is created,
    populated, and read back through JDBCTableSource with a partitioned
    range scan. Pins the three things the reference's MySQL driver path
    must deliver at scale (store.go:154-247 reads on ONE connection):
    - the scan splits into num_partitions parallel range queries;
    - contents round-trip exactly;
    - predicate pushdown reaches the remote SQL (the filter shows as a
      pushed filter on the JDBC scan node, not a Spark-side Filter only).
    """
    from proteus_spark.sources.batch import JDBCTableSource

    db = str(tmp_path / "derbydb")
    jvm = spark._jvm
    con = jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};create=true")
    try:
        st = con.createStatement()
        st.executeUpdate("CREATE TABLE T (K INT PRIMARY KEY, V DOUBLE)")
        ps = con.prepareStatement("INSERT INTO T VALUES (?, ?)")
        for i in range(100):
            ps.setInt(1, i)
            ps.setDouble(2, i * 0.5)
            ps.executeUpdate()
    finally:
        con.close()

    src = JDBCTableSource(
        url=f"jdbc:derby:{db}",
        table="T",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        partition_column="K",
        num_partitions=4,
        lower=0,
        upper=100,
    )
    df = src.snapshot(spark)
    assert df.rdd.getNumPartitions() == 4
    got = sorted((r["K"], r["V"]) for r in df.collect())
    assert got == [(i, i * 0.5) for i in range(100)]

    filtered = df.filter("K >= 50").select("V")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(K,50)" in plan  # pushed to the JDBC source
    assert filtered.count() == 50


def test_debezium_transport_contract_kafka_vs_file(spark):
    """The Kafka and file transports share ONE parse path (decode_records):
    a Kafka-shaped record frame (value BINARY plus topic/partition/offset/
    timestamp columns, exactly what readStream.format('kafka') yields) and
    a file-shaped frame (value STRING) produce byte-identical canonical
    deltas. This pins the only part of the Kafka leg the sandbox can't
    exercise live (no broker ships here): everything after .load() is this
    tested function."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from proteus_spark.sources.debezium import decode_records

    row_schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    envelopes = [
        '{"payload":{"before":null,"after":{"k":1,"v":10.0},"op":"c","ts_ms":1000}}',
        '{"payload":{"before":{"k":1,"v":10.0},"after":{"k":1,"v":25.0},"op":"u","ts_ms":2000}}',
        '{"payload":{"before":{"k":2,"v":7.0},"after":null,"op":"d","ts_ms":3000}}',
    ]
    file_shaped = spark.createDataFrame([(e,) for e in envelopes], "value string")
    kafka_shaped = spark.createDataFrame(
        [
            (None, e.encode("utf-8"), "dbserver.db.t", i % 2, i, None)
            for i, e in enumerate(envelopes)
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    cols = ["k", "op_type", "old_value", "new_value", "_ts"]
    via_file = sorted(
        tuple(r[c] for c in cols)
        for r in decode_records(file_shaped, row_schema, ["k"], "v").collect()
    )
    via_kafka = sorted(
        tuple(r[c] for c in cols)
        for r in decode_records(kafka_shaped, row_schema, ["k"], "v").collect()
    )
    assert via_file == via_kafka and len(via_file) == 3

    # and the file STREAM transport routes through the same seam: its plan
    # contains the same from_json parse of a cast value column
    import inspect

    from proteus_spark.sources import debezium as dz

    assert "decode_records" in inspect.getsource(dz.stream_envelopes)
    assert "decode_records" in inspect.getsource(dz.kafka_envelopes)


def test_python_datasource_mock_batch(spark):
    """Custom Python DataSource (the reference's dataStore extension
    point): partitioned executor-side generation matches the
    Catalyst-expression mock table bit-for-bit."""
    from proteus_spark.sources.mock import mock_table
    from proteus_spark.sources.pyds import register_mock_datasource

    fmt = register_mock_datasource(spark)
    df = spark.read.format(fmt).option("n", 500).option("numPartitions", 4).load()
    assert df.rdd.getNumPartitions() == 4
    a = sorted((r[0], r[1]) for r in df.collect())
    b = sorted((r[0], r[1]) for r in mock_table(spark, 500).collect())
    assert a == b


def test_python_datasource_mock_stream(spark, tmp_path):
    """The streaming half (SubscribeOps parity): the op feed replays all n
    objects across rate-limited micro-batches; the converged set equals
    the batch table."""
    from proteus_spark.sources.mock import mock_table
    from proteus_spark.sources.pyds import register_mock_datasource

    fmt = register_mock_datasource(spark)
    stream = (
        spark.readStream.format(fmt)
        .option("n", 400)
        .option("rowsPerBatch", 150)
        .load()
    )
    outdir = str(tmp_path / "mock_stream_out")

    def capture(batch, epoch):
        batch.write.mode("append").parquet(outdir)

    q = stream.writeStream.outputMode("append").foreachBatch(capture).start()
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            import os

            if os.path.isdir(outdir):
                try:
                    if spark.read.parquet(outdir).count() >= 400:
                        break
                except Exception:
                    pass
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted((r[0], r[1]) for r in spark.read.parquet(outdir).collect())
    exp = sorted((r[0], r[1]) for r in mock_table(spark, 400).collect())
    assert got == exp


def test_vectorclock_merge_semantics(spark):
    """Entry-wise max with disjoint keys kept and NULL (outer-missing)
    sides folding as empty — qpu.proto:97-99 composition."""
    from pyspark.sql import functions as F

    from proteus_spark.sources.cdc import merge_vectorclocks

    df = spark.createDataFrame(
        [
            ({"a": 10}, {"a": 20, "b": 5}),  # shared key -> max; new key kept
            ({"a": 30}, None),  # missing side -> identity
        ],
        "x map<string,bigint>, y map<string,bigint>",
    )
    out = [
        dict(r[0])
        for r in df.select(merge_vectorclocks(F.col("x"), F.col("y"))).collect()
    ]
    assert out == [{"a": 20, "b": 5}, {"a": 30}]


def test_minilog_stage_partitions_by_key_and_offsets_are_dense(spark, tmp_path):
    """Producer contract: partition = pmod(xxhash64(key), N) — per-key
    records land in ONE partition (Kafka's ordering unit) — and offsets
    are dense line indices per partition summing to the record count."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(200).select(
        (F.col("id") % 13).cast("string").alias("key"),
        F.concat(F.lit("v"), F.col("id")).alias("value"),
    )
    topic = str(tmp_path / "topic")
    ends = minilog.stage_topic(df, topic, partitions=4)
    assert sum(ends.values()) == 200
    # re-derive each key's partition and check all copies agree
    import json

    seen: dict = {}
    for p in range(4):
        for f in minilog._segment_files(topic, p):
            for line in open(f):
                k = json.loads(line)["key"]
                assert seen.setdefault(k, p) == p, f"key {k} split across partitions"


def test_minilog_restart_resumes_from_checkpoint_offsets(spark, tmp_path):
    """The broker-consumption guarantee the file transport cannot test:
    per-partition offsets ride the streaming checkpoint, so a consumer
    stopped MID-LOG resumes where it left off — every record delivered,
    nothing re-read except (at most) the one in-flight micro-batch Spark
    replays into foreachBatch (offsets are WAL-logged before processing,
    committed after)."""
    import time

    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(400).select(
        (F.col("id") % 10).cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=4)
    minilog.register_log_datasource(spark)
    ckpt = str(tmp_path / "ckpt")

    def reader():
        return (
            spark.readStream.format("proteus_log")
            .option("path", topic)
            .option("partitions", "4")
            .option("maxRecordsPerTrigger", "30")
            .load()
        )

    rows: list = []

    def sink(b, e):
        rows.extend((r["partition"], r["offset"], r["value"]) for r in b.collect())

    q = (
        reader().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .start()
    )
    # stop mid-log: wait until some (not all) records consumed
    deadline = time.time() + 60
    while len(rows) < 60 and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    consumed_first = len(rows)
    assert 0 < consumed_first < 400, "test needs a mid-log stop"

    q2 = (
        reader().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()

    unique = {(p, o) for p, o, _ in rows}
    assert len(unique) == 400, f"lost records: {400 - len(unique)}"
    # duplicates only from the single replayed in-flight batch
    assert len(rows) - len(unique) <= 4 * 30, "more than one batch replayed"
    # and values round-trip exactly once per (partition, offset)
    by_po = {}
    for p, o, v in rows:
        assert by_po.setdefault((p, o), v) == v


def test_minilog_empty_topic_streams_zero_rows(spark, tmp_path):
    """An empty topic (no partition dirs yet) must stream cleanly: zero
    batches with rows, offsets stay at 0, no crash — a consumer can start
    before its producer, the normal broker deployment order."""
    from proteus_spark.sources import minilog

    topic = str(tmp_path / "empty_topic")
    minilog.register_log_datasource(spark)
    rows: list = []
    q = (
        spark.readStream.format("proteus_log")
        .option("path", topic)
        .option("partitions", "4")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, e: rows.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert rows == []
    assert minilog.end_offsets(topic, 4) == {0: 0, 1: 0, 2: 0, 3: 0}


def test_minilog_append_epoch_replay_is_dropped(spark, tmp_path):
    """Producer-side exactly-once: re-publishing an epoch whose segments
    already exist is a wholesale no-op (returns False, no duplicate
    records) — the guard that makes a replayed foreachBatch export safe,
    mirroring the LSM commit's epoch high-water mark."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    topic = str(tmp_path / "topic")
    df = spark.range(50).select(
        (F.col("id") % 7).cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    assert minilog.append_epoch(df, topic, epoch=0) is True
    first = minilog.end_offsets(topic, 4)
    assert sum(first.values()) == 50
    # replay the same epoch: dropped wholesale
    assert minilog.append_epoch(df, topic, epoch=0) is False
    assert minilog.end_offsets(topic, 4) == first
    # a NEW epoch appends, and its segments sort after epoch 0's
    assert minilog.append_epoch(df.limit(10), topic, epoch=1) is True
    assert sum(minilog.end_offsets(topic, 4).values()) == 60
    import os

    for p in range(4):
        files = [os.path.basename(f) for f in minilog._segment_files(topic, p)]
        assert files == sorted(files)


@pytest.mark.parametrize("partitions,nkeys", [(1, 1), (3, 2), (5, 40)])
def test_minilog_consume_equals_produced_multiset(
    spark, tmp_path, partitions, nkeys
):
    """Shape sweep: single-partition topics, more partitions than keys
    (some partitions empty forever), and high key fan-out all deliver the
    exact produced multiset with dense offsets."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(120).select(
        (F.col("id") % nkeys).cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    ends = minilog.stage_topic(df, topic, partitions=partitions)
    assert sum(ends.values()) == 120
    minilog.register_log_datasource(spark)
    rows: list = []
    q = (
        spark.readStream.format("proteus_log")
        .option("path", topic)
        .option("partitions", str(partitions))
        .option("maxRecordsPerTrigger", "37")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, e: rows.extend(
            (r["partition"], r["offset"], r["value"]) for r in b.collect()
        ))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(v for _, _, v in rows) == sorted(str(i) for i in range(120))
    # offsets dense per partition
    by_p: dict = {}
    for p, o, _ in rows:
        by_p.setdefault(p, []).append(o)
    for p, offs in by_p.items():
        assert sorted(offs) == list(range(len(offs)))


def test_minilog_two_independent_consumers_fan_out(spark, tmp_path):
    """Broker fan-out: two consumers with separate checkpoints each read
    the FULL topic independently (consuming is non-destructive; offsets
    are per-consumer state, not log state)."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(90).select(
        (F.col("id") % 9).cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=4)
    minilog.register_log_datasource(spark)

    def consume(ckpt):
        rows: list = []
        q = (
            spark.readStream.format("proteus_log")
            .option("path", topic)
            .option("partitions", "4")
            .load()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda b, e: rows.extend(r["value"] for r in b.collect()))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return rows

    a = consume(str(tmp_path / "ckpt_a"))
    b = consume(str(tmp_path / "ckpt_b"))
    exp = sorted(str(i) for i in range(90))
    assert sorted(a) == exp and sorted(b) == exp


def test_densify_fires_on_dumps_not_on_well_split_sources(spark, tmp_path):
    """The densify trigger must consider available SCAN parallelism, not
    just row-group size: a single-group dump (driver-testdata shape) gets
    the repartition; a source already laid out as many multi-group files
    (real lake-writer shape) must NOT pay an extra full-table exchange —
    measured at a 100x replica, that needless roundRobin carried all 60M
    filtered rows (tpch_q1 20.2s -> 11.7s once skipped)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from proteus_spark import registry

    par = spark.sparkContext.defaultParallelism
    n = registry._DENSIFY_MIN_ROWS + 1

    # shape A: one file, one huge row group — the degenerate dump
    d_a = tmp_path / "dump"; d_a.mkdir()
    t = pa.table({"x": list(range(n))})
    pq.write_table(t, str(d_a / "a.parquet"), row_group_size=n)

    # shape B: >= par/2 files, EACH with one >=threshold row group — the
    # groups count (not group size) must be what disarms the trigger
    d_b = tmp_path / "split"; d_b.mkdir()
    files = max(2, par // 2)
    for i in range(files):
        chunk = pa.table({"x": list(range(i * n, i * n + n))})
        pq.write_table(chunk, str(d_b / f"b{i}.parquet"), row_group_size=n)

    def parts(path):
        registry._split_cache.pop(str(path), None)
        df = spark.read.parquet(str(path))
        worst, groups = registry._scan_shape(str(path))
        return worst, groups

    worst_a, groups_a = parts(d_a)
    assert worst_a >= registry._DENSIFY_MIN_ROWS and groups_a == 1
    # dump: condition fires
    assert worst_a >= registry._DENSIFY_MIN_ROWS and groups_a < max(2, par // 2)
    worst_b, groups_b = parts(d_b)
    assert worst_b >= registry._DENSIFY_MIN_ROWS  # groups ARE big...
    assert groups_b >= max(2, par // 2)  # ...but the scan is already wide
    # well-split: condition must NOT fire even though groups are big
    assert not (
        worst_b >= registry._DENSIFY_MIN_ROWS and groups_b < max(2, par // 2)
    )


def test_minilog_partial_epoch_crash_recovers_all_records(spark, tmp_path):
    """Crash between partition renames (ADVICE r5): an epoch published to
    only SOME partitions has no commit marker, so (a) consumers never see
    the partial segments, and (b) the replayed epoch republishes IN FULL
    instead of being dropped — no records are permanently lost."""
    import os

    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    topic = str(tmp_path / "topic")
    df = spark.range(80).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    assert minilog.append_epoch(df, topic, epoch=0) is True
    committed = minilog.end_offsets(topic, 4)
    assert sum(committed.values()) == 80

    # simulate the crash: epoch 1's segments land in SOME partitions but
    # the process dies before the marker write
    assert minilog.append_epoch(df, topic, epoch=1) is True
    os.remove(os.path.join(topic, "_epoch-00000001.committed"))
    removed = 0
    for p in (2, 3):
        d = os.path.join(topic, f"p={p}")
        for f in os.listdir(d):
            if f.startswith("part-e00000001"):
                os.remove(os.path.join(d, f))
                removed += 1
    assert removed > 0  # the crash scenario is real in this layout

    # uncommitted segments are invisible to consumers (read-committed)
    assert minilog.end_offsets(topic, 4) == committed

    # the replayed epoch republishes in full — every record present once
    assert minilog.append_epoch(df, topic, epoch=1) is True
    assert sum(minilog.end_offsets(topic, 4).values()) == 160
    # and a second replay of the now-committed epoch is dropped
    assert minilog.append_epoch(df, topic, epoch=1) is False
    assert sum(minilog.end_offsets(topic, 4).values()) == 160


def test_minilog_consumer_discovers_partitions_beyond_option(spark, tmp_path):
    """A consumer configured with FEWER partitions than the topic has on
    disk must still read the higher p=N dirs (ADVICE r5): partition count
    is the producer's layout truth, discovered by globbing p=* dirs."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(100).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=6)
    minilog.register_log_datasource(spark)
    rows: list = []
    q = (
        spark.readStream.format("proteus_log")
        .option("path", topic)
        .option("partitions", "2")  # stale/misconfigured: fewer than disk
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda b, e: rows.extend(r["value"] for r in b.collect())
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(rows) == sorted(str(i) for i in range(100))


def test_spill_dir_count_is_bounded(spark):
    """Repeated harness runs in one process must not accrete spill dirs
    monotonically (VERDICT r5): spills live under ONE session root and the
    oldest are reclaimed beyond the FIFO cap. Reclaimed dirs keep only a
    sentinel file naming the policy + the PROTEUS_SPILL_KEEP knob, so a
    late re-evaluation fails diagnosably (ADVICE r6)."""
    import os

    from pyspark.sql import functions as F

    from proteus_spark import registry

    keep = registry._spill_keep()
    for i in range(keep + 20):
        out = registry.spill(
            spark.range(3).select((F.col("id") + i).alias("v"))
        )
        assert out.count() == 3
    assert registry._spill_root is not None

    def data_files(d):
        p = os.path.join(registry._spill_root, d)
        return [f for f in os.listdir(p) if f.endswith(".parquet") or f.startswith("part-")]

    dirs = [
        d
        for d in os.listdir(registry._spill_root)
        if os.path.isdir(os.path.join(registry._spill_root, d))
    ]
    live = [d for d in dirs if data_files(d)]
    reclaimed = [d for d in dirs if not data_files(d)]
    assert len(live) <= keep
    # sentinel dirs are themselves bounded (ADVICE r7): >= 20 reclaims
    # happened above, but only the most recent _SENTINEL_KEEP keep their
    # marker dir — older ones are removed outright, so TOTAL directory
    # count is bounded in a long-lived process
    assert 1 <= len(reclaimed) <= registry._SENTINEL_KEEP
    assert len(dirs) <= keep + registry._SENTINEL_KEEP
    for d in reclaimed:
        assert registry._RECLAIM_SENTINEL in os.listdir(
            os.path.join(registry._spill_root, d)
        )
    # the newest spill is still readable (bound reclaims OLDEST first)
    assert out.count() == 3


def test_spill_keep_env_knob(spark, monkeypatch):
    """PROTEUS_SPILL_KEEP overrides the FIFO bound (ADVICE r6)."""
    from proteus_spark import registry

    monkeypatch.setenv("PROTEUS_SPILL_KEEP", "7")
    assert registry._spill_keep() == 7
    monkeypatch.setenv("PROTEUS_SPILL_KEEP", "not-a-number")
    assert registry._spill_keep() == registry._SPILL_KEEP_DEFAULT
    monkeypatch.delenv("PROTEUS_SPILL_KEEP")
    assert registry._spill_keep() == registry._SPILL_KEEP_DEFAULT


def test_spill_zero_rows_returns_empty_with_schema(spark):
    """The zero-row spill path returns an empty frame with the original
    schema — and ONLY that case; real read failures are not masked."""
    from pyspark.sql import functions as F

    from proteus_spark import registry

    src = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).filter(F.col("k") < 0)
    out = registry.spill(src)
    assert out.count() == 0
    # parquet round-trips drop non-null flags; names+types must hold
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in src.schema
    ]


def test_consumer_group_splits_partitions_exactly_once(spark, tmp_path):
    """Two group members own disjoint partition sets that cover the topic;
    their polls together deliver the exact produced multiset — each
    partition consumed by exactly one member (the Kafka group
    contract)."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(120).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=4)
    gdir = str(tmp_path / "group")

    a = minilog.ConsumerGroup(topic, gdir, "member-a").join()
    b = minilog.ConsumerGroup(topic, gdir, "member-b").join()
    # a joined before b -> a saw generation bump; re-sync via retry
    import pytest as _pytest

    def poll_retry(m):
        try:
            return m.poll()
        except minilog.RebalanceError:
            return m.poll()

    ra, rb = poll_retry(a), poll_retry(b)
    pa = {p for _, _, p, _ in ra}
    pb = {p for _, _, p, _ in rb}
    assert pa.isdisjoint(pb)
    assert set(a.assignment()) | set(b.assignment()) == {0, 1, 2, 3}
    got = sorted(v for _, v, _, _ in ra + rb)
    assert got == sorted(str(i) for i in range(120))
    a.commit()
    b.commit()
    # committed offsets belong to the group: a re-poll returns nothing new
    assert poll_retry(a) == [] and poll_retry(b) == []


def test_consumer_group_rebalance_resumes_from_group_offsets(spark, tmp_path):
    """A member leaves mid-consumption: the survivor's next poll raises
    RebalanceError, the retry sees the widened assignment and resumes the
    departed member's partitions from the GROUP's committed offsets — the
    handoff loses nothing and re-delivers nothing."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(100).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=4)
    gdir = str(tmp_path / "group")

    a = minilog.ConsumerGroup(topic, gdir, "member-a").join()
    b = minilog.ConsumerGroup(topic, gdir, "member-b").join()

    def poll_retry(m, **kw):
        try:
            return m.poll(**kw)
        except minilog.RebalanceError:
            return m.poll(**kw)

    # b consumes PART of its partitions (rate-limited), commits, leaves
    rb = poll_retry(b, max_records=10)
    b.commit()
    seen = [v for _, v, _, _ in rb]
    b.leave()

    # survivor rebalances to own everything; resumes b's partitions at
    # the group's committed offsets
    ra = poll_retry(a)
    assert set(a.assignment()) == {0, 1, 2, 3}
    seen += [v for _, v, _, _ in ra]
    a.commit()
    assert sorted(seen) == sorted(str(i) for i in range(100))
    assert poll_retry(a) == []


def test_consumer_group_stale_member_commit_is_fenced(spark, tmp_path):
    """Zombie fencing: a member that polled under generation G cannot
    commit after the generation moves — it gets RebalanceError, never a
    silent double-commit of partitions it no longer owns."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(40).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=4)
    gdir = str(tmp_path / "group")

    a = minilog.ConsumerGroup(topic, gdir, "member-a").join()
    a.poll()
    # membership changes AFTER the poll (a new member joins)
    minilog.ConsumerGroup(topic, gdir, "member-b").join()
    with _pytest.raises(minilog.RebalanceError):
        a.commit()
    # nothing was committed for any partition
    assert all(a.committed(p) == 0 for p in range(4))
    # ADVICE r6: the failed commit ADOPTED the new generation, so a
    # naive catch-and-retry commit() without a fresh poll must be a
    # NO-OP — the discarded poll's offsets must never become durable
    # (they would make every new owner skip those records)
    a.commit()
    assert all(a.committed(p) == 0 for p in range(4))
    # after a fresh poll under the new generation, commit works again
    recs = a.poll()
    a.commit()
    assert {p for _, _, p, _ in recs} == set(a.assignment())
    assert all(a.committed(p) > 0 for p in a.assignment())


def test_consumer_group_randomized_model(spark, tmp_path):
    """Randomized protocol check (the test_lsm_randomized_* pattern):
    a seeded sequence of join / leave / poll+commit ops — including
    membership changes deliberately injected BETWEEN a poll and its
    commit — must deliver the produced multiset exactly once into the
    set of successfully-committed polls. Fenced commits discard their
    poll (redelivered to the next owner); group offsets never overlap."""
    import random

    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    rnd = random.Random(7)
    n_records, n_parts = 200, 5
    df = spark.range(n_records).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=n_parts)
    gdir = str(tmp_path / "group")

    next_id = [0]

    def new_member():
        m = minilog.ConsumerGroup(
            topic, gdir, f"m{next_id[0]:02d}"
        ).join()
        next_id[0] += 1
        return m

    live = [new_member(), new_member()]
    consumed: list[str] = []

    def poll_retry(m, **kw):
        try:
            return m.poll(**kw)
        except minilog.RebalanceError:
            return m.poll(**kw)

    for _ in range(60):
        op = rnd.random()
        if op < 0.15 and len(live) < 4:
            live.append(new_member())
        elif op < 0.25 and len(live) > 1:
            live.pop(rnd.randrange(len(live))).leave()
        else:
            m = rnd.choice(live)
            recs = poll_retry(m, max_records=rnd.randint(1, 7))
            if rnd.random() < 0.2 and len(live) < 5:
                # membership moves between poll and commit: the commit
                # MUST be fenced, and the poll's records are discarded
                # (the next owner re-polls them from the group offsets)
                live.append(new_member())
                import pytest as _pytest

                with _pytest.raises(minilog.RebalanceError):
                    m.commit()
            else:
                m.commit()
                consumed.extend(v for _, v, _, _ in recs)

    # drain: every member empties its assignment (retrying across any
    # final rebalances), so the union covers all partitions
    for m in live:
        while True:
            recs = poll_retry(m, max_records=50)
            if not recs:
                break
            m.commit()
            consumed.extend(v for _, v, _, _ in recs)

    assert sorted(consumed, key=int) == [str(i) for i in range(n_records)]


def test_compact_topic_latest_per_key_and_tombstone_purge(spark, tmp_path):
    """Log-compaction bootstrap: the compacted topic retains exactly the
    LATEST record per key (epoch order), optionally purging DELETE
    tombstones; a consumer's LWW reconstruction over the compacted topic
    equals the one over the full history, with strictly fewer records."""
    import json as _json

    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    topic = str(tmp_path / "topic")

    def epoch_df(rows):
        return spark.createDataFrame(rows, "key string, value string")

    # epoch 0: keys 0..9 at v0; epoch 1: keys 0..4 re-published at v1;
    # epoch 2: keys 8,9 tombstoned
    assert minilog.append_epoch(
        epoch_df([(str(k), _json.dumps({"k": k, "v": f"v0-{k}"})) for k in range(10)]),
        topic, epoch=0,
    )
    assert minilog.append_epoch(
        epoch_df([(str(k), _json.dumps({"k": k, "v": f"v1-{k}"})) for k in range(5)]),
        topic, epoch=1,
    )
    assert minilog.append_epoch(
        epoch_df([(str(k), _json.dumps({"k": k, "_op": "DELETE"})) for k in (8, 9)]),
        topic, epoch=2,
    )
    assert sum(minilog.end_offsets(topic, 4).values()) == 17

    def lww(path):
        rec = spark.read.text(
            [f for p in range(4) for f in minilog._segment_files(path, p)]
        ).select(
            F.from_json(
                "value", "key string, value string, epoch long"
            ).alias("r")
        )
        return {
            r["key"]: r["v"]
            for r in rec.groupBy("r.key")
            .agg(F.max_by(F.col("r.value"), F.col("r.epoch")).alias("v"))
            .collect()
        }

    full = lww(topic)

    compacted = str(tmp_path / "compacted")
    ends = minilog.compact_topic(spark, topic, compacted)
    assert sum(ends.values()) == 10  # one record per key survived
    assert lww(compacted) == full   # reconstruction unchanged

    purged = str(tmp_path / "purged")
    ends2 = minilog.compact_topic(spark, topic, purged, drop_tombstones=True)
    assert sum(ends2.values()) == 8
    keys = set(lww(purged))
    assert keys == {str(k) for k in range(8)}

    # the compacted topic is a valid topic: the streaming source reads it
    minilog.register_log_datasource(spark)
    rows: list = []
    q = (
        spark.readStream.format("proteus_log")
        .option("path", purged)
        .option("partitions", "4")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, e: rows.extend(r["key"] for r in b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(rows) == sorted(str(k) for k in range(8))


def test_consumer_group_session_timeout_eviction(spark, tmp_path):
    """Heartbeat liveness: a member that stops heartbeating is evicted by
    the coordinator sweep (one generation bump), and the survivor
    rebalances to own the dead member's partitions — resuming them from
    the group's committed offsets."""
    import time as _time

    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(60).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=4)
    gdir = str(tmp_path / "group")

    a = minilog.ConsumerGroup(topic, gdir, "member-a").join()
    b = minilog.ConsumerGroup(topic, gdir, "member-b").join()

    def poll_retry(m, **kw):
        try:
            return m.poll(**kw)
        except minilog.RebalanceError:
            return m.poll(**kw)

    # b consumes part of its share, commits, then goes silent
    seen = [v for _, v, _, _ in poll_retry(b, max_records=5)]
    b.commit()

    _time.sleep(0.6)
    a.heartbeat()  # a stays live; b's stamp ages out
    assert a.expired_members(0.5) == ["member-b"]
    assert minilog.ConsumerGroup(topic, gdir, "coordinator",
                                 partitions=4).sweep_expired(0.5) == ["member-b"]
    assert "member-b" not in a.members()

    # survivor rebalances to everything and finishes without loss/dup
    seen += [v for _, v, _, _ in poll_retry(a)]
    a.commit()
    assert set(a.assignment()) == {0, 1, 2, 3}
    assert sorted(seen, key=int) == [str(i) for i in range(60)]


def test_minilog_epoch_crash_at_every_point_recovers(spark, tmp_path):
    """Exhaustive crash-point enumeration for epoch publication: for every
    k in 0..partitions, simulate a crash after exactly k partition renames
    (no marker written). Invariants at every k: (a) the partial epoch is
    INVISIBLE to consumers (read-committed), (b) the replay republishes it
    in full, (c) content lands exactly once. Together with the atomic
    marker this makes publication all-or-nothing at every possible crash
    point."""
    import os

    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    parts = 4
    df = spark.range(64).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    for k in range(parts + 1):
        topic = str(tmp_path / f"topic_k{k}")
        assert minilog.append_epoch(df, topic, epoch=0, partitions=parts)
        base = minilog.end_offsets(topic, parts)
        assert sum(base.values()) == 64

        # publish epoch 1 fully, then rewind to "crashed after k renames":
        # strip the marker and epoch-1 segments from partitions >= k
        assert minilog.append_epoch(df, topic, epoch=1, partitions=parts)
        os.remove(os.path.join(topic, "_epoch-00000001.committed"))
        for p in range(k, parts):
            d = os.path.join(topic, f"p={p}")
            for f in os.listdir(d):
                if f.startswith("part-e00000001"):
                    os.remove(os.path.join(d, f))

        # (a) uncommitted segments are invisible at every crash point
        assert minilog.end_offsets(topic, parts) == base
        # (b) replay republishes in full; (c) content exactly once
        assert minilog.append_epoch(df, topic, epoch=1, partitions=parts)
        assert sum(minilog.end_offsets(topic, parts).values()) == 128
        assert (
            minilog.append_epoch(df, topic, epoch=1, partitions=parts)
            is False
        )


def test_stream_reader_assigned_partitions_subset(spark, tmp_path):
    """Kafka's assign() surface on the embedded-log stream reader: a
    reader given assignedPartitions plans and fetches ONLY those
    partitions — the consumer-group member's data plane (the group
    coordinates assignment; Spark moves the bytes)."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(80).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=4)
    minilog.register_log_datasource(spark)

    def consume(parts):
        rows = []
        q = (
            spark.readStream.format(minilog.FORMAT_NAME)
            .option("path", topic)
            .option("partitions", "4")
            .option("assignedPartitions", ",".join(map(str, parts)))
            .load()
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, e: rows.extend(
                (r["value"], r["partition"]) for r in b.collect()
            ))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return rows

    got_a = consume([0, 2])
    got_b = consume([1, 3])
    assert {p for _, p in got_a} <= {0, 2}
    assert {p for _, p in got_b} <= {1, 3}
    # the two disjoint assignments cover the topic exactly once
    assert sorted(v for v, _ in got_a + got_b) == sorted(
        str(i) for i in range(80)
    )


def test_consumer_group_commit_offsets_is_fenced(spark, tmp_path):
    """commitSync(offsets) overload: explicit offsets commit only for
    owned partitions under the current generation — an unowned partition
    or a stale generation raises BEFORE any offset file is written."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(40).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    ends = minilog.stage_topic(df, topic, partitions=4)
    gdir = str(tmp_path / "group")

    a = minilog.ConsumerGroup(topic, gdir, "member-a").join()
    b = minilog.ConsumerGroup(topic, gdir, "member-b").join()
    try:
        a.poll()  # b's join moved the generation: first poll rebalances
    except minilog.RebalanceError:
        a.poll()  # retry under the adopted generation
    with _pytest.raises(minilog.RebalanceError):
        a.commit_offsets(ends)  # includes b's partitions
    assert all(a.committed(p) == 0 for p in range(4))
    own = {p: ends[p] for p in a.assignment()}
    a.commit_offsets(own)
    for p, end in own.items():
        assert a.committed(p) == end
    # b's partitions untouched by a's commit
    for p in b.assignment():
        assert b.committed(p) == 0


def test_broker_protocol_and_network_stream(spark, tmp_path):
    """Network transport (the round-7 leg): the Broker's line-delimited
    JSON protocol serves offset discovery (ListOffsets shape) and bounded
    range fetches (Fetch shape) over real TCP; the stream reader with
    brokerHost/brokerPort consumes the topic WITHOUT touching segment
    files, matches the filesystem read exactly, and resumes from its
    checkpoint across a query restart — over the wire."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(60).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    ends = minilog.stage_topic(df, topic, partitions=3)
    with minilog.Broker(topic) as b:
        # protocol: ends + fetch + error surface
        got = minilog.broker_request(b.host, b.port, {"op": "ends", "partitions": 3})
        assert {int(k): v for k, v in got["ends"].items()} == ends
        r = minilog.broker_fetch(b.host, b.port, 0, 1, 3)
        assert [off for _, _, off in r] == [1, 2]
        assert "error" in minilog.broker_request(
            b.host, b.port, {"op": "nope"}
        )

        minilog.register_log_datasource(spark)
        rows = []
        ckpt = str(tmp_path / "ckpt")

        def consume(max_per_trigger):
            q = (
                spark.readStream.format(minilog.FORMAT_NAME)
                .option("path", topic)
                .option("partitions", "3")
                .option("maxRecordsPerTrigger", str(max_per_trigger))
                .option("brokerHost", b.host)
                .option("brokerPort", str(b.port))
                .load()
                .writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .foreachBatch(
                    lambda bdf, e: rows.extend(r["value"] for r in bdf.collect())
                )
                .start()
            )
            q.processAllAvailable()
            q.stop()

        consume(7)   # multi-trigger rate-limited consumption over TCP
        n_first = len(rows)
        assert n_first == 60
        consume(7)   # restart from the checkpoint: nothing re-delivered
        assert len(rows) == n_first
        assert sorted(rows) == sorted(str(i) for i in range(60))


def test_broker_index_cache_locked_bounded_and_evicts_stale_keys(tmp_path):
    """The broker's per-segment byte-offset index cache (ADVICE r7): (a)
    concurrent first reads of one segment index it exactly once (the
    per-cache lock serializes indexing); (b) when a segment file grows —
    re-keying on (size, mtime) — the superseded key is dropped on insert;
    (c) total retained index bytes are capped FIFO."""
    import threading

    from proteus_spark.sources.minilog import _IndexCache, _segment_stats

    seg = tmp_path / "seg-0.jsonl"
    seg.write_bytes(b"a\nbb\nccc\n")

    cache = _IndexCache()
    builds = []
    orig_open = open

    def counting_open(path, mode="r", *a, **kw):
        if str(path) == str(seg) and "b" in mode:
            builds.append(1)
        return orig_open(path, mode, *a, **kw)

    import builtins

    builtins.open, saved = counting_open, builtins.open
    try:
        threads = [
            threading.Thread(target=lambda: _segment_stats(str(seg), cache))
            for _ in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        builtins.open = saved
    assert sum(builds) == 1  # indexed once despite 8 concurrent readers
    n, idx = _segment_stats(str(seg), cache)
    assert n == 3 and list(idx) == [0, 2, 5, 9]

    # (b) the head segment grows -> new (size, mtime) key; stale key evicted
    seg.write_bytes(b"a\nbb\nccc\ndddd\n")
    n2, _ = _segment_stats(str(seg), cache)
    assert n2 == 4
    assert len([k for k in cache if k[0] == str(seg)]) == 1

    # (c) byte cap: tiny budget forces FIFO eviction down to the newest
    cache.max_bytes = 64  # one index is 5 longs = 40 bytes
    for i in range(5):
        other = tmp_path / f"seg-{i + 1}.jsonl"
        other.write_bytes(b"x\n" * (i + 2))
        _segment_stats(str(other), cache)
    total = sum(len(v[1]) * 8 for v in cache.values())
    assert total <= 64 or len(cache) == 1


def test_broker_fetch_pools_connections_and_survives_restart(spark, tmp_path):
    """VERDICT r7 #5a: consumers hold ONE pooled connection per (process,
    broker) instead of dialing per fetch — repeated fetch/ends exchanges
    accept exactly one TCP connection broker-side. A broker restart makes
    the pooled connection stale: the next exchange retries once on a
    fresh dial and succeeds (no manual pool reset required)."""
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(30).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=2)

    b = minilog.Broker(topic).start()
    try:
        for i in range(5):
            assert minilog.broker_fetch(b.host, b.port, 0, i, i + 2)
        minilog.broker_request(b.host, b.port, {"op": "ends", "partitions": 2})
        assert b.connections == 1, f"expected 1 pooled conn, {b.connections}"
        port = b.port
    finally:
        b.stop()

    # restart on the SAME port: the pooled connection is now stale
    b2 = minilog.Broker(topic, port=port).start()
    try:
        r = minilog.broker_fetch(b2.host, b2.port, 0, 0, 3)
        assert [off for _, _, off in r] == [0, 1, 2]
        assert b2.connections == 1
    finally:
        b2.stop()


def test_broker_truncated_log_fails_fetch_loudly(spark, tmp_path):
    """VERDICT r7 #5b — the embedded-log analogue of Kafka's
    OFFSET_OUT_OF_RANGE: a consumer's planned range comes from previously
    discovered ends; if the segment store lost its tail underneath (broker
    restart wiped segments, manual truncation), the fetch must FAIL with a
    clear error, not silently return a short range."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(40).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    ends = minilog.stage_topic(df, topic, partitions=2)
    with minilog.Broker(topic) as b:
        n0 = ends[0]
        assert len(minilog.broker_fetch(b.host, b.port, 0, 0, n0)) == n0

        # truncate partition 0's tail: drop its last segment file
        d = os.path.join(topic, "p=0")
        segs = sorted(f for f in os.listdir(d) if f.startswith("part-"))
        os.remove(os.path.join(d, segs[-1]))

        with _pytest.raises(RuntimeError, match="offset out of range"):
            minilog.broker_fetch(b.host, b.port, 0, 0, n0)


def test_filesystem_reader_truncated_store_fails_loudly(spark, tmp_path):
    """The filesystem transport honors the same OFFSET_OUT_OF_RANGE
    contract as the broker: an executor whose planned range the segment
    store can no longer serve raises instead of emitting a silently short
    batch."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from proteus_spark.sources import minilog

    df = spark.range(24).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=2)
    minilog.register_log_datasource(spark)
    Reader = minilog.register_log_datasource.classes["reader"]

    reader = Reader({"path": topic, "partitions": "2"})
    ends = reader._ends()
    parts = reader.partitions(
        {str(p): 0 for p in range(2)}, {str(p): e for p, e in ends.items()}
    )

    def n_rows(it):
        # the reader yields Arrow RecordBatches (tuples only as fallback)
        return sum(getattr(item, "num_rows", 1) for item in it)

    # full read against the intact store succeeds
    assert sum(n_rows(reader.read(part)) for part in parts) == 24

    # truncate p=0's tail, then drain the SAME planned ranges
    d = os.path.join(topic, "p=0")
    segs = sorted(f for f in os.listdir(d) if f.startswith("part-"))
    os.remove(os.path.join(d, segs[-1]))
    bad = [part for part in parts if part.p == 0]
    with _pytest.raises(RuntimeError, match="offset out of range"):
        for part in bad:
            for _ in reader.read(part):
                pass


def _hand_topic(root, counts: dict[int, int], start: int = 0):
    """Build a topic store by hand (no Spark): ``counts[p]`` JSON records
    per partition, values v{p}-{i}, one bulk segment per call (named so
    successive calls append in sorted order)."""
    import json
    import os

    for p, n in counts.items():
        d = os.path.join(root, f"p={p}")
        os.makedirs(d, exist_ok=True)
        seq = len([f for f in os.listdir(d) if f.startswith("part-")])
        with open(os.path.join(d, f"part-{seq:05d}"), "w") as fh:
            for i in range(start, start + n):
                fh.write(
                    json.dumps({"key": str(i), "value": f"v{p}-{i}"}) + "\n"
                )


def test_follower_replicates_incrementally_and_promotes(tmp_path):
    """Broker replication (beyond-reference hardening): a Follower
    replicates a leader's committed records over the same framed wire
    protocol consumers use, tails new segments INCREMENTALLY (no
    re-fetch of already-replicated offsets), survives its own restart by
    recovering offsets from the replica dir, and after leader loss
    promotes to a Broker serving the identical committed prefix."""
    from proteus_spark.sources import minilog

    topic = str(tmp_path / "topic")
    _hand_topic(topic, {0: 5, 1: 3})
    rep = str(tmp_path / "replica")
    with minilog.Broker(topic) as leader:
        f = minilog.Follower(leader.host, leader.port, rep, partitions=2)
        f.catch_up()
        assert minilog.end_offsets(rep, 2) == {0: 5, 1: 3}
        assert minilog._read_range(rep, 0, 0, 5, {}) == minilog._read_range(
            topic, 0, 0, 5, {}
        )
        # leader grows: the next pass replicates ONLY the delta (one new
        # replica segment per touched partition, offsets advance)
        _hand_topic(topic, {0: 2}, start=5)
        assert f.poll_once() == 2
        assert f.replicated[0] == 7
        assert len(minilog._segment_files(rep, 0)) == 2
        # restart-resume: a fresh Follower over the same dir recovers the
        # replicated offsets from disk and finds nothing new
        f2 = minilog.Follower(leader.host, leader.port, rep, partitions=2)
        assert f2.replicated == {0: 7, 1: 3}
        assert f2.poll_once() == 0
    # leader dead: promote the replica and serve the identical prefix
    with f.promote() as promoted:
        got = minilog.broker_request(
            promoted.host, promoted.port, {"op": "ends", "partitions": 2}
        )
        assert {int(k): v for k, v in got["ends"].items()} == {0: 7, 1: 3}
        recs = minilog.broker_fetch(promoted.host, promoted.port, 0, 0, 7)
        assert [v for _, v, _ in recs] == [
            f"v0-{i}" for i in range(7)
        ]


def test_follower_failover_lag_surfaces_as_offset_out_of_range(tmp_path):
    """A replica that lagged the leader at failover serves only its
    committed prefix: a consumer whose planned range outruns the replica
    gets the loud offset-out-of-range error (the truncation contract),
    never silently shifted records. The background tail records the
    leader-loss error without killing promotion."""
    import time

    import pytest as _pytest

    from proteus_spark.sources import minilog

    topic = str(tmp_path / "topic")
    _hand_topic(topic, {0: 6})
    rep = str(tmp_path / "replica")
    leader = minilog.Broker(topic).start()
    try:
        f = minilog.Follower(
            leader.host, leader.port, rep, partitions=1, poll_interval=0.05
        ).start()
        t0 = time.monotonic()
        while f.replicated.get(0, 0) < 6 and time.monotonic() - t0 < 10:
            time.sleep(0.02)
        assert f.replicated.get(0, 0) == 6
        f.stop()  # follower pauses; leader keeps accepting records
        _hand_topic(topic, {0: 4}, start=6)
    finally:
        leader.stop()  # leader dies with the replica 4 records behind
    with f.promote() as promoted:
        assert minilog.broker_fetch(promoted.host, promoted.port, 0, 0, 6)
        with _pytest.raises(RuntimeError, match="offset out of range"):
            minilog.broker_fetch(promoted.host, promoted.port, 0, 6, 10)


def test_follower_lag_reporting_and_promote_error_classes(tmp_path):
    """Follower observability (socket-level): (a) ``lag()`` reports the
    per-partition leader-end minus replicated-offset signal a deployment
    alerts on BEFORE failover loses the tail — caught-up 0, behind by
    the exact delta after the leader grows, 0 again after catch_up, and
    raising once the leader is unreachable (no well-defined lag); (b)
    promote() CLASSIFIES pending background-tail errors instead of
    swallowing them: a non-leader-loss error (protocol/disk) refuses
    promotion and chains the original, force=True overrides, while the
    OSError family (the expected leader-death trigger) still promotes
    cleanly."""
    import pytest as _pytest

    from proteus_spark.sources import minilog

    topic = str(tmp_path / "topic")
    _hand_topic(topic, {0: 5, 1: 3})
    rep = str(tmp_path / "replica")
    leader = minilog.Broker(topic).start()
    try:
        f = minilog.Follower(leader.host, leader.port, rep, partitions=2)
        f.catch_up()
        assert f.lag() == {0: 0, 1: 0}
        _hand_topic(topic, {0: 4, 1: 1}, start=5)
        assert f.lag() == {0: 4, 1: 1}  # behind by exactly the delta
        f.catch_up()
        assert f.lag() == {0: 0, 1: 0}
        # (b) a pending NON-leader-loss error refuses promotion, chains
        # the original, and force=True overrides after inspection
        f.error = RuntimeError("replication fetch failed: boom")
        with _pytest.raises(RuntimeError, match="refusing to promote") as ei:
            f.promote()
        assert isinstance(ei.value.__cause__, RuntimeError)
        assert "boom" in str(ei.value.__cause__)
        forced = f.promote(force=True)
        assert isinstance(forced, minilog.Broker)
        # the expected leader-loss class (OSError) promotes cleanly
        f.error = ConnectionRefusedError("leader gone")
        assert isinstance(f.promote(), minilog.Broker)
        f.error = None
    finally:
        leader.stop()
    # leader unreachable: lag is undefined -> the call itself raises
    with _pytest.raises(Exception):
        f.lag()


def test_follower_refuses_forked_history(tmp_path):
    """An unclean leader restart that LOST committed records must not be
    replicated over: a replica that finds itself ahead of its leader
    refuses (fork refusal), and promote() re-raises rather than serving
    the forked history as if it were clean."""
    import os

    import pytest as _pytest

    from proteus_spark.sources import minilog

    topic = str(tmp_path / "topic")
    _hand_topic(topic, {0: 5})
    rep = str(tmp_path / "replica")
    with minilog.Broker(topic) as leader:
        f = minilog.Follower(leader.host, leader.port, rep, partitions=1)
        f.catch_up()
    # unclean restart: the leader's store loses its only segment
    seg = minilog._segment_files(topic, 0)[-1]
    os.remove(seg)
    with minilog.Broker(topic) as reborn:
        f2 = minilog.Follower(reborn.host, reborn.port, rep, partitions=1)
        with _pytest.raises(RuntimeError, match="refusing to fork"):
            f2.poll_once()
        f2.error = RuntimeError("refusing to fork history (recorded)")
        with _pytest.raises(RuntimeError, match="refusing to fork"):
            f2.promote()


def test_stream_consumer_resumes_on_promoted_replica(spark, tmp_path):
    """Failover END-TO-END through the Spark reader: a checkpointed
    stream consumer drains the leader, the topic then grows, the
    follower replicates the delta, the leader dies, and the SAME
    checkpoint resumes against the PROMOTED replica — offsets are
    per-partition line indices, identical on leader and replica by
    construction, so the consumer delivers exactly the new records (no
    re-delivery, no gaps). This is the property replication exists for:
    a broker is interchangeable with its replica mid-consumption."""
    from proteus_spark.sources import minilog

    topic = str(tmp_path / "topic")
    _hand_topic(topic, {0: 10, 1: 8})
    rep = str(tmp_path / "replica")
    ckpt = str(tmp_path / "ckpt")
    minilog.register_log_datasource(spark)
    rows = []

    def consume(host, port):
        q = (
            spark.readStream.format(minilog.FORMAT_NAME)
            .option("path", topic)
            .option("partitions", "2")
            .option("brokerHost", host)
            .option("brokerPort", str(port))
            .load()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda bdf, e: rows.extend(r["value"] for r in bdf.collect())
            )
            .start()
        )
        q.processAllAvailable()
        q.stop()

    leader = minilog.Broker(topic).start()
    try:
        f = minilog.Follower(leader.host, leader.port, rep, partitions=2)
        f.catch_up()
        consume(leader.host, leader.port)  # phase 1: drain via the leader
        assert len(rows) == 18
        _hand_topic(topic, {0: 5}, start=10)  # the topic grows
        f.catch_up()  # replica captures the delta before the crash
    finally:
        leader.stop()  # leader dies
    # the leader's STORE loses the delta segment too — the only copy of
    # records 10-14 is now the replica, so phase 2 passing proves the
    # consumer read them over the wire from the promoted broker, not
    # from the filesystem path option
    import os as _os

    _os.remove(minilog._segment_files(topic, 0)[-1])
    with f.promote() as promoted:
        # same checkpoint, new broker: exactly the delta arrives.
        # NOTE the reader's offset planning goes through the broker's
        # `ends` op — the promoted replica serves it from its own store.
        consume(promoted.host, promoted.port)
    assert len(rows) == 23
    assert sorted(rows) == sorted(
        [f"v0-{i}" for i in range(15)] + [f"v1-{i}" for i in range(8)]
    )


def test_corpus_source_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC corpus ingest: self-describing columnar format (schema
    optional); an explicit schema acts as a projection/validation
    contract — extra columns in the files are pruned away."""
    from proteus_spark.sources.batch import corpus_source

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    path = str(tmp_path / "corpus_orc")
    docs.write.orc(path)  # writes all 5 columns
    df = corpus_source(spark, path, fmt="orc")
    assert df.count() == 50
    assert set(df.columns) == set(docs.columns)
    pruned = corpus_source(
        spark, path, fmt="orc", schema="doc_id long, text string"
    )
    assert pruned.columns == ["doc_id", "text"]
    got = {r["doc_id"]: r["text"] for r in pruned.collect()}
    assert got == {r["doc_id"]: r["text"] for r in docs.collect()}


def test_minilog_offset_discovery_is_index_served(spark, tmp_path, monkeypatch):
    """r11: producer-written count index (the Kafka model — the broker
    side knows its own end offsets). stage_topic writes
    _base-counts.json, append_epoch's commit marker carries its epoch's
    per-segment counts; with every segment indexed, offset discovery
    must succeed WITHOUT opening a single segment — pinned by making the
    line-scan fallback raise."""
    from proteus_spark.sources import minilog

    df = spark.createDataFrame(
        [(str(i), f"v{i}") for i in range(40)], "key string, value string"
    )
    topic = str(tmp_path / "topic")
    ends = minilog.stage_topic(df, topic, partitions=4)
    assert sum(ends.values()) == 40

    epoch_df = spark.createDataFrame(
        [(str(i), f"e{i}") for i in range(10)], "key string, value string"
    )
    assert minilog.append_epoch(epoch_df, topic, epoch=1, partitions=4)

    side = minilog._producer_counts(topic, {})
    # every committed segment on disk is covered by the index
    all_segs = {
        f"p={p}/{f.rsplit('/', 1)[-1]}"
        for p in range(4)
        for f in minilog._segment_files(topic, p)
    }
    assert all_segs and all_segs == set(side), (all_segs, set(side))
    # index values are the truth (independent recount before the patch)
    truth = {
        rel: minilog._count_lines(f"{topic}/{rel}") for rel in all_segs
    }
    assert side == truth

    def boom(fp):  # any fallback line-scan means the index was bypassed
        raise AssertionError(f"segment opened for counting: {fp}")

    monkeypatch.setattr(minilog, "_count_lines", boom)
    assert sum(minilog.end_offsets(topic, 4).values()) == 50


def test_minilog_follower_persists_replica_count_index(spark, tmp_path):
    """A Follower learns each replicated segment's count from the fetch
    header it already received; it must persist that as
    _replica-counts.json so the replica's own offset discovery (and its
    restart's end_offsets) is index-served too."""
    from proteus_spark.sources import minilog

    df = spark.createDataFrame(
        [(str(i), f"v{i}") for i in range(30)], "key string, value string"
    )
    topic = str(tmp_path / "leader")
    minilog.stage_topic(df, topic, partitions=2)
    replica = str(tmp_path / "replica")
    with minilog.Broker(topic) as b:
        f = minilog.Follower(b.host, b.port, replica, partitions=2)
        moved = f.poll_once()
        assert moved == 30
    side = minilog._producer_counts(replica, {})
    segs = {
        f"p={p}/{fp.rsplit('/', 1)[-1]}"
        for p in range(2)
        for fp in minilog._segment_files(replica, p)
    }
    assert segs and segs == set(side)
    assert sum(side.values()) == 30
    assert sum(minilog.end_offsets(replica, 2).values()) == 30


def test_log_datasource_pickles_without_module_reference(spark, tmp_path):
    """The closure-pickling rule, pinned (r11 regression: a nested
    reader method referenced a MODULE-level helper and every
    proteus_log query died in the Python worker with
    ModuleNotFoundError when the driver ran from a foreign cwd): the
    registered DataSource class and its reader must cloudpickle and
    UNPICKLE in an interpreter whose sys.path does NOT contain the
    repo. The subprocess also exercises a reader method end-to-end so
    a by-reference global in any method body fails the test, not just
    one in the class graph."""
    import subprocess
    import sys
    import textwrap

    from pyspark.serializers import CloudPickleSerializer

    from proteus_spark.sources import minilog

    df = spark.createDataFrame(
        [(str(i), f"v{i}") for i in range(12)], "key string, value string"
    )
    topic = str(tmp_path / "topic")
    minilog.stage_topic(df, topic, partitions=2)

    minilog.register_log_datasource(spark)
    ds_cls = minilog.register_log_datasource.classes["datasource"]
    blob = CloudPickleSerializer().dumps(ds_cls)
    blob_path = tmp_path / "ds.pkl"
    blob_path.write_bytes(blob)

    script = textwrap.dedent(
        f"""
        import pickle, sys
        sys.path = [p for p in sys.path if "repo" not in p]
        for mod in list(sys.modules):
            if mod.startswith("proteus_spark"):
                del sys.modules[mod]
        blob = open({str(blob_path)!r}, "rb").read()
        ds_cls = pickle.loads(blob)
        ds = ds_cls({{"path": {topic!r}, "partitions": "2"}})
        r = ds.streamReader(None)
        ends = r.latestOffset()
        total = sum(int(v) for v in ends.values())
        assert total == 12, ends
        print("OK", total)
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd="/tmp",
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "OK 12" in out.stdout


def test_minilog_index_matches_line_truth_across_lifecycle(spark, tmp_path):
    """Property-style lifecycle check for the r11 producer-written count
    index: across a staged bulk load + several epochs of varying sizes
    (including an empty partition and a replayed epoch), the index-served
    end_offsets must equal a from-scratch line recount at every step."""
    from proteus_spark.sources import minilog

    topic = str(tmp_path / "t")
    sizes = [17, 5, 40]
    df = spark.createDataFrame(
        [(str(i), f"v{i}") for i in range(23)], "key string, value string"
    )
    minilog.stage_topic(df, topic, partitions=3)

    def truth():
        out = {}
        for p in range(3):
            out[p] = sum(
                minilog._count_lines(f)
                for f in minilog._segment_files(topic, p)
            )
        return out

    assert minilog.end_offsets(topic, 3) == truth()
    for ep, n in enumerate(sizes, start=1):
        edf = spark.createDataFrame(
            [(str(i % 7), f"e{ep}-{i}") for i in range(n)],
            "key string, value string",
        )
        assert minilog.append_epoch(edf, topic, epoch=ep, partitions=3)
        # replay of a committed epoch must be a no-op for offsets
        assert not minilog.append_epoch(edf, topic, epoch=ep, partitions=3)
        assert minilog.end_offsets(topic, 3) == truth()
    # the index covers every committed segment (no fallback needed)
    side = minilog._producer_counts(topic, {})
    segs = {
        f"p={p}/{f.rsplit('/', 1)[-1]}"
        for p in range(3)
        for f in minilog._segment_files(topic, p)
    }
    assert segs == set(side)


def test_sidecar_cache_bounded_across_topic_lifetimes(tmp_path, monkeypatch):
    """ADVICE r11: the producer-counts sidecar cache must not grow without
    bound across topic lifetimes. Two bounds: (a) per visit, keys for a
    topic's VANISHED sources are evicted (marker cleanup on a live
    topic); (b) globally, the cache is LRU-capped, so cycling many temp
    topics sheds dead topics' entries while hot topics' survive."""
    import json as _json

    from proteus_spark.sources import minilog

    def mk_topic(name: str, counts: dict) -> str:
        d = tmp_path / name
        d.mkdir()
        (d / "_base-counts.json").write_text(_json.dumps({"counts": counts}))
        return str(d)

    import os as _os

    def n_entries(c: dict) -> int:
        return sum(len(v) for v in c.values())

    cache: dict = {}
    hot = mk_topic("hot", {"p=0/part-00000": 3})
    hot_topic = _os.path.join(hot, "")
    assert minilog._producer_counts(hot, cache) == {"p=0/part-00000": 3}
    assert n_entries(cache) == 1

    # (a) vanished-source eviction on the next visit of the SAME topic
    marker = _os.path.join(hot, "_epoch-00000001.committed")
    with open(marker, "w") as fh:
        _json.dump({"counts": {"p=0/part-e00000001-x": 2}}, fh)
    side = minilog._producer_counts(hot, cache)
    assert side["p=0/part-e00000001-x"] == 2 and n_entries(cache) == 2
    _os.remove(marker)
    assert "p=0/part-e00000001-x" not in minilog._producer_counts(hot, cache)
    assert n_entries(cache) == 1  # the dead marker's entry is gone

    # (b) global LRU cap across topic lifetimes, hot topic survives
    monkeypatch.setattr(minilog, "_SIDECAR_CACHE_MAX", 8)
    for i in range(30):
        minilog._producer_counts(mk_topic(f"t{i}", {"p=0/s": i}), cache)
        minilog._producer_counts(hot, cache)  # keep the hot topic hot
    assert n_entries(cache) <= 8
    assert hot_topic in cache  # topic-LRU kept the hot topic, shed dead
    assert _os.path.join(hot, "_base-counts.json") in cache[hot_topic]


def test_sidecar_cache_thread_safe_and_no_self_thrash(tmp_path, monkeypatch):
    """Review r12 #1/#4 regressions: (a) concurrent _producer_counts
    calls over one shared cache (the Broker's handler threads) must not
    race the eviction sweep / LRU pop (unguarded, an insert during the
    sweep raises RuntimeError 'dictionary changed size during
    iteration'); (b) a single topic with MORE sources than the base cap
    must keep ALL its entries cached after a visit — a fixed cap would
    evict the visit's own earliest markers every call, re-parsing them
    per trigger forever."""
    import json as _json
    import os
    import threading as _th

    from proteus_spark.sources import minilog

    def mk_topic(name: str, n_markers: int) -> str:
        d = tmp_path / name
        d.mkdir()
        (d / "_base-counts.json").write_text(
            _json.dumps({"counts": {"p=0/part-0": 1}})
        )
        for i in range(n_markers):
            (d / f"_epoch-{i:08d}.committed").write_text(
                _json.dumps({"counts": {f"p=0/part-e{i:08d}-x": 1}})
            )
        return str(d)

    # (b) no self-thrash: 20 markers >> base cap 8; after one visit every
    # source is still cached (the cap floors at 2x the largest topic)
    monkeypatch.setattr(minilog, "_SIDECAR_CACHE_MAX", 8)
    cache: dict = {}
    big = mk_topic("big", 20)
    big_topic = os.path.join(big, "")
    side = minilog._producer_counts(big, cache)
    assert len(side) == 21
    assert len(cache[big_topic]) == 21  # nothing self-evicted

    # (b') no CROSS-topic thrash (ADVICE r12): interleaved visits of a
    # SMALL topic through the same shared cache must not trim the live
    # big topic's entries back under the base cap — the regression would
    # silently re-parse all 21 marker JSONs on every big-topic trigger
    small = mk_topic("small", 2)
    for _ in range(3):
        minilog._producer_counts(small, cache)
        assert len(cache[big_topic]) == 21, "small visit evicted big topic"
        big_entries_before = dict(cache[big_topic])
        minilog._producer_counts(big, cache)
        # IDENTITY, not equality: a re-parse produces ==-equal fresh
        # tuples — only `is` proves the entries were served from cache
        assert all(
            cache[big_topic][k] is big_entries_before[k]
            for k in big_entries_before
        )
        assert set(cache[big_topic]) == set(big_entries_before)

    # (a) thread safety: 4 threads hammer DIFFERENT topics through ONE
    # shared cache while markers keep appearing; any iteration race
    # raises RuntimeError and fails the thread
    topics = [mk_topic(f"c{i}", 6) for i in range(4)]
    errors: list[BaseException] = []

    def hammer(t: str) -> None:
        try:
            for j in range(60):
                if j % 10 == 0:  # keep mutating the topic mid-visits
                    with open(
                        os.path.join(t, f"_epoch-{900 + j:08d}.committed"),
                        "w",
                    ) as fh:
                        _json.dump(
                            {"counts": {f"p=0/part-e{900 + j:08d}-x": 1}}, fh
                        )
                minilog._producer_counts(t, cache)
        except BaseException as exc:  # noqa: BLE001 — recorded for assert
            errors.append(exc)

    threads = [_th.Thread(target=hammer, args=(t,)) for t in topics]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert errors == [], errors
