"""Result-cache semantics (SURVEY §2.8): LRU order, version invalidation,
hit/miss accounting, and end-to-end parity through CachedEngine.

Reference behaviors mirrored: LRU move-to-back on access + evict-oldest
(lruCache.go:16-155), invalidation on source update notification
(cache/cache.go:126-136), cached result == recomputed result.
"""

from __future__ import annotations

import pytest

from proteus_spark.cache import (
    CachedEngine,
    ResultCache,
    normalize_sql,
    referenced_tables,
)
from proteus_spark.engine import Engine

TABLES = {"orders", "lineitem", "customer"}


def test_normalize_sql():
    assert normalize_sql("SELECT  *\n FROM t ;") == "select * from t"
    assert normalize_sql("select * from t") == normalize_sql("SELECT * FROM T")


def test_referenced_tables_token_match():
    assert referenced_tables("SELECT * FROM orders o", TABLES) == ("orders",)
    assert referenced_tables(
        "SELECT * FROM orders JOIN lineitem ON o_orderkey = l_orderkey", TABLES
    ) == ("lineitem", "orders")
    # 'corders' must not match 'orders' (token, not substring)
    assert referenced_tables("SELECT * FROM corders", TABLES) == ()


def test_lru_eviction_order():
    c = ResultCache(capacity=2)
    c.put("q1", TABLES, None, [1])
    c.put("q2", TABLES, None, [2])
    assert c.get("q1", TABLES) is not None  # touch q1 -> q2 is now oldest
    c.put("q3", TABLES, None, [3])  # evicts q2
    assert c.stats.evictions == 1
    assert c.get("q2", TABLES) is None
    assert c.get("q1", TABLES) is not None
    assert c.get("q3", TABLES) is not None


def test_version_invalidation():
    c = ResultCache()
    c.put("SELECT * FROM orders", TABLES, None, [1])
    c.put("SELECT * FROM customer", TABLES, None, [2])
    assert c.get("SELECT * FROM orders", TABLES).rows == [1]
    c.bump("orders")  # the update notification
    assert c.stats.invalidations == 1
    assert c.get("SELECT * FROM orders", TABLES) is None  # stale -> miss
    assert c.get("SELECT * FROM customer", TABLES).rows == [2]  # untouched


def test_uncacheable_large_result():
    c = ResultCache(max_rows=2)
    c.put("q", TABLES, None, [1, 2, 3])
    assert c.stats.uncacheable == 1
    assert len(c) == 0


def test_subscriber_callback_bumps():
    c = ResultCache()
    c.put("SELECT * FROM orders", TABLES, None, [1])
    cb = c.subscriber("orders")
    cb(None, 0)  # (delta_df, epoch) from a streaming view
    assert c.get("SELECT * FROM orders", TABLES) is None


@pytest.fixture(scope="module")
def cached_engine(spark, sf_dir):
    return CachedEngine(Engine(spark, sf_dir))


SQL = "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus"


def test_hit_returns_identical_result(cached_engine):
    first = sorted(map(tuple, cached_engine.query(SQL).collect()))
    assert cached_engine.cache.stats.misses >= 1
    second = sorted(map(tuple, cached_engine.query(SQL).collect()))
    assert cached_engine.cache.stats.hits >= 1
    assert first == second
    # schema must survive the round-trip through cached rows
    assert [f.name for f in cached_engine.query(SQL).schema.fields] == [
        "o_orderstatus",
        "n",
    ]


def test_invalidate_recomputes(cached_engine):
    cached_engine.query(SQL).collect()
    h0 = cached_engine.cache.stats.hits
    cached_engine.invalidate("orders")
    cached_engine.query(SQL).collect()  # stale key -> recompute
    assert cached_engine.cache.stats.hits == h0
    cached_engine.query(SQL).collect()  # fresh key -> hit again
    assert cached_engine.cache.stats.hits == h0 + 1


def test_query_unary_data_transfer_metric(spark, sf_dir):
    from proteus_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    rows = eng.query_unary("SELECT r_regionkey, r_name FROM region")
    rep = eng.stats.data_transfer()
    assert rep["responses"] == 1
    expect = sum(len(k) + len(v) for rec in rows for k, v in rec.items())
    assert rep["total_bytes"] == expect > 0


def test_latency_records_execution_not_plan_build(spark, sf_dir):
    """The recorded latency must cover actual execution (reference
    end-to-end definition, metrics.go:78-101) — a lazy plan build is ~0ms
    and would make every percentile meaningless."""
    from proteus_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.query("SELECT sum(l_quantity) AS s FROM lineitem")  # lazy: no record
    assert eng.stats.latencies_ms == []
    eng.query_unary("SELECT sum(l_quantity) AS s FROM lineitem")
    assert len(eng.stats.latencies_ms) == 1
    assert eng.stats.latencies_ms[0] > 1.0  # real work, not plan build
    assert eng.stats.percentiles()["p50"] > 1.0


def test_over_limit_miss_probes_without_full_collect(spark, sf_dir):
    """A miss whose result exceeds max_rows must NOT materialize the full
    result on the driver: the probe collects at most max_rows+1 rows and
    the entry is refused up front."""
    from unittest.mock import patch

    from proteus_spark.cache import CachedEngine
    from proteus_spark.engine import Engine

    try:  # Spark 4: instances are the classic subclass, which overrides
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - older pyspark
        from pyspark.sql import DataFrame

    eng = CachedEngine(Engine(spark, sf_dir), max_rows=10)
    collected: list[int] = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        collected.append(len(rows))
        return rows

    with patch.object(DataFrame, "collect", spy):
        df = eng.query("SELECT o_orderkey FROM orders")  # way over 10 rows
    assert max(collected) <= 11  # only the LIMIT 11 probe ever collected
    assert eng.cache.stats.uncacheable == 1
    assert len(eng.cache) == 0
    assert df.count() > 11  # the caller still gets the full lazy result
