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


def test_http_query_stream_with_live_view_pushes_updates(spark, engine):
    """QuerySubscribe over the wire: a named live view keeps the NDJSON
    stream open past END_OF_STREAM — new micro-batches arrive as
    UPDATEDELTA records with continuing seq ids, and the stream closes
    after the quiet timeout."""
    import json as _json
    import threading
    import urllib.request

    from proteus_spark.sources import cdc
    from proteus_spark.streaming.views import SumView

    ev = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (1, 5.0)], "user_id bigint, value double"
    )
    src = cdc.stage_stream(spark, ev, chunks=2)
    view = SumView(
        spark, src.subscribe(), group_by="user_id", agg_attr="value",
        name="t_http_stream", mode="append",
    ).start()
    try:
        view.await_catch_up()
        engine.register_view("vhttp", view.snapshot())
        lines: list = []
        got_eos = threading.Event()
        with QueryServer(engine, views={"live": view}) as url:

            def consume():
                # wide quiet window (a loaded host can take >8s to land
                # the appended file's micro-batch after END_OF_STREAM) +
                # client-side break after the one expected delta, so the
                # test never waits out the quiet tail
                req = urllib.request.Request(
                    url + "/query_stream",
                    data=_json.dumps(
                        {
                            "sql": "SELECT * FROM vhttp ORDER BY user_id",
                            "view": "live",
                            "updates_timeout": 60.0,
                        }
                    ).encode(),
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=120) as r:
                    for raw in r:
                        lines.append(_json.loads(raw))
                        if lines[-1]["type"] == "END_OF_STREAM":
                            got_eos.set()
                        elif lines[-1]["type"] == "UPDATEDELTA":
                            break  # bounded consumer: close client-side

            t = threading.Thread(target=consume, daemon=True)
            t.start()
            assert got_eos.wait(timeout=60)
            # a new delta lands while the HTTP stream is open
            spark.createDataFrame(
                [(2, 7.0)], "user_id bigint, value double"
            ).coalesce(1).write.mode("append").parquet(src.path)
            view._query.processAllAvailable()
            t.join(timeout=60)
            assert not t.is_alive()

        types = [ln["type"] for ln in lines]
        assert types[: len(types) - 1].count("STATE") == 2
        assert "END_OF_STREAM" in types
        assert types[-1] == "UPDATEDELTA"
        assert [ln["seq"] for ln in lines] == list(range(len(lines)))
        upd = lines[-1]["record"]
        assert upd["user_id"] == "2" and upd["value_sum"] == "27.0"

        # unknown view name -> 400, not a hang
        import urllib.error

        req = urllib.request.Request(
            url + "/query_stream",
            data=_json.dumps({"sql": "SELECT 1", "view": "nope"}).encode(),
            method="POST",
        )
        with QueryServer(engine, views={"live": view}) as url2:
            req = urllib.request.Request(
                url2 + "/query_stream",
                data=_json.dumps(
                    {"sql": "SELECT 1 AS x", "view": "nope"}
                ).encode(),
                method="POST",
            )
            import pytest as _pytest

            with _pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400
    finally:
        view.stop()
        cdc.cleanup(src)


def test_http_forged_content_length_rejected_and_server_survives(engine):
    """The HTTP transport's intake bound (the wire/h2 rule applied here,
    r11): a forged multi-GB Content-Length must be rejected with 400
    BEFORE any body read drives an allocation, and a fresh request must
    serve normally."""
    import socket

    from proteus_spark import server as srv_mod

    with QueryServer(engine) as url:
        host, port = url.split("//", 1)[1].rstrip("/").split(":")
        sk = socket.create_connection((host, int(port)), timeout=10)
        sk.sendall(
            b"POST /query HTTP/1.1\r\n"
            b"Host: x\r\n"
            b"Content-Type: application/json\r\n"
            + f"Content-Length: {srv_mod.MAX_REQUEST_BODY + 1}\r\n".encode()
            + b"\r\n"
        )  # no body follows — the length alone must trigger the reject
        sk.settimeout(10)
        status = sk.recv(65536).split(b"\r\n", 1)[0]
        sk.close()
        assert b"400" in status, status
        # negative length must be rejected too (rfile.read(-1) would
        # buffer the peer's bytes until EOF — the same unbounded read)
        sk2 = socket.create_connection((host, int(port)), timeout=10)
        sk2.sendall(
            b"POST /query HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: -1\r\n\r\n"
        )
        sk2.settimeout(10)
        status2 = sk2.recv(65536).split(b"\r\n", 1)[0]
        sk2.close()
        assert b"400" in status2, status2
        ok = _post(f"{url}/query", {"sql": "SELECT 1 AS one"})
        assert ok["records"] == [{"one": "1"}]
