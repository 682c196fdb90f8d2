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
