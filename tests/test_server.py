"""HTTP serving surface (SURVEY §2.11 network leg): the stdlib wrapper
over Engine must carry the reference's client semantics — GetConfig
table advertisement, QueryUnary stringified records, the seq-id'd
STATE*/END_OF_STREAM record stream, latency/data-transfer metrics, and
gRPC-status-style error mapping — over real sockets."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from proteus_spark.engine import Engine
from proteus_spark.server import QueryServer


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _post(url: str, obj):
    req = urllib.request.Request(
        url,
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_http_config_advertises_tables(engine):
    with QueryServer(engine) as url:
        cfg = _get(url + "/config")
        assert "lineitem" in cfg["tables"] and "orders" in cfg["tables"]


def test_http_query_unary_matches_module_api(engine):
    sql = (
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    with QueryServer(engine) as url:
        got = _post(url + "/query", {"sql": sql})["records"]
    assert got == engine.query_unary(sql)
    assert all(isinstance(v, str) for rec in got for v in rec.values())


def test_http_query_stream_seq_ids_and_eos(engine):
    with QueryServer(engine) as url:
        req = urllib.request.Request(
            url + "/query_stream",
            data=json.dumps(
                {"sql": "SELECT r_name FROM region ORDER BY r_name"}
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] == "application/x-ndjson"
            lines = [json.loads(ln) for ln in r.read().splitlines()]
    assert [ln["seq"] for ln in lines] == list(range(len(lines)))
    assert [ln["type"] for ln in lines[:-1]] == ["STATE"] * (len(lines) - 1)
    assert lines[-1]["type"] == "END_OF_STREAM" and lines[-1]["record"] is None
    assert lines[0]["record"]["r_name"] == "AFRICA"


def test_http_errors_map_to_400(engine):
    with QueryServer(engine) as url:
        for bad in (
            {"sql": "SELECT * FROM no_such_table"},
            {"sql": "SELEKT nonsense"},
            {},
        ):
            req = urllib.request.Request(
                url + "/query", data=json.dumps(bad).encode(), method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=60)
            assert ei.value.code == 400
            assert "error" in json.loads(ei.value.read())


def test_http_metrics_exposes_latency_and_transfer(engine):
    with QueryServer(engine) as url:
        _post(url + "/query", {"sql": "SELECT count(*) AS n FROM nation"})
        m = _get(url + "/metrics")
    assert "p50" in m["query_latency_ms"]
    assert m["data_transfer"]["total_bytes"] > 0


def test_http_concurrent_clients(engine):
    """Parallel clients execute concurrent Spark jobs (the threaded-server
    contract matching parallel gRPC streams against the reference)."""
    import threading

    results: list = []
    with QueryServer(engine) as url:

        def hit(k):
            out = _post(
                url + "/query",
                {"sql": f"SELECT {k} AS k, count(*) AS n FROM customer"},
            )
            results.append((k, out["records"][0]["k"]))

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    assert sorted(results) == [(i, str(i)) for i in range(6)]
