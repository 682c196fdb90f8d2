"""Wire/gRPC stream path at replica scale with a slow consumer.

Round-9 verdict directive: the envelope measurements stopped at
20k-100k records single-stream; prove the framed Query/QuerySubscribe
path degrades GRACEFULLY when the consumer is slower than the producer
— the h2 send path must pace to the peer's WINDOW_UPDATE rate (bounded
server-side buffering, no crash), and a slow or fully-stalled consumer
must never block the live view's foreachBatch commits (the interaction
the stop()-barrier lock and the h2 send path now share; also pinned by
test_stalled_h2_consumer_cannot_block_view_commit).

Scenarios, one Spark session (cross-session absolutes are host-drift
garbage — round-7/8 lesson), one ~30x view (60k groups vs the 2k-row
test default):

  baseline_commits   no consumer attached; per-commit latency of B
                     one-row micro-batches (the control).
  fast_consumer      QuerySubscribe drains the 60k-record snapshot with
                     immediate window credits: wall + records/s.
  slow_consumer      raw-h2 consumer credits CHUNK bytes every INTERVAL
                     (a token bucket ~10x slower than the server can
                     produce) while B commits land concurrently:
                     received-bytes/s must track the credit rate and
                     commit latencies must stay within noise of
                     baseline.
  stalled_consumer   SETTINGS_INITIAL_WINDOW_SIZE=0, never credited,
                     subscribed to the LIVE view; B commits land while
                     the handler thread is wedged in send_data.

    python scripts/sweep_wire_slow_consumer.py [--groups 60000]

Output: one JSON line per scenario on stdout; progress on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import struct
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _commit_latencies(spark, src, view, n: int, start_uid: int) -> list[float]:
    lats = []
    for i in range(n):
        df = spark.createDataFrame(
            [(start_uid + i, 1.0)], "user_id bigint, value double"
        )
        t0 = time.monotonic()
        df.coalesce(1).write.mode("append").parquet(src.path)
        view._query.processAllAvailable()
        lats.append(time.monotonic() - t0)
    return lats


class _PacedConsumer(threading.Thread):
    """Raw h2 client: reads the Query stream crediting ``chunk`` bytes
    per ``interval`` seconds (chunk=None -> credit immediately;
    chunk=0 -> initial window 0, never credit = fully stalled)."""

    def __init__(self, host, port, sql, view_name, chunk, interval=0.1):
        super().__init__(daemon=True)
        from proteus_spark import h2, wire

        self.h2, self.wire = h2, wire
        self.sql, self.view_name = sql, view_name
        self.chunk, self.interval = chunk, interval
        self.received = 0
        self.t_first = None
        self.t_last = None
        self.error = None
        self.stop_evt = threading.Event()
        self.sock = socket.create_connection((host, port), timeout=10)

    def run(self) -> None:
        h2, wire = self.h2, self.wire
        try:
            if self.chunk == 0:  # stalled: zero initial stream window
                settings = struct.pack(
                    ">HI", h2.SETTINGS_INITIAL_WINDOW_SIZE, 0
                )
            else:
                settings = b""
            self.sock.sendall(
                h2.PREFACE + h2.pack_frame(h2.F_SETTINGS, 0, 0, settings)
            )
            enc = h2.HpackEncoder()
            req = {
                "queryRequest": {
                    "query": {"query_sql": {"queryStr": self.sql}},
                }
            }
            if self.view_name:
                req["queryRequest"]["metadata"] = {"view": self.view_name}
            hdrs = [
                (":method", "POST"), (":scheme", "http"),
                (":path", "/qpuapi.QPUAPI/Query"),
                (":authority", "localhost"),
                ("content-type", "application/grpc"),
            ]
            self.sock.sendall(
                h2.pack_frame(
                    h2.F_HEADERS, h2.FLAG_END_HEADERS, 1, enc.encode(hdrs)
                )
                + h2.pack_frame(
                    h2.F_DATA, h2.FLAG_END_STREAM, 1,
                    wire.frame(wire.encode_request_stream_record(req)),
                )
            )
            self.sock.settimeout(0.25)
            blob = bytearray()
            credit_due = 0
            next_credit = time.monotonic()
            while not self.stop_evt.is_set():
                # parse whole frames off the accumulator
                while len(blob) >= 9:
                    length = int.from_bytes(blob[:3], "big")
                    if len(blob) < 9 + length:
                        break
                    ftype, flags = blob[3], blob[4]
                    payload = bytes(blob[9 : 9 + length])
                    del blob[: 9 + length]
                    if ftype == h2.F_SETTINGS and not flags & h2.FLAG_ACK:
                        self.sock.sendall(
                            h2.pack_frame(h2.F_SETTINGS, h2.FLAG_ACK, 0, b"")
                        )
                    elif ftype == h2.F_DATA:
                        if self.t_first is None:
                            self.t_first = time.monotonic()
                        self.t_last = time.monotonic()
                        self.received += length
                        credit_due += length
                    elif ftype == h2.F_HEADERS and flags & h2.FLAG_END_STREAM:
                        return  # trailers: stream done
                if self.chunk is None and credit_due:
                    self._credit(credit_due)
                    credit_due = 0
                elif self.chunk and time.monotonic() >= next_credit:
                    self._credit(self.chunk)
                    next_credit = time.monotonic() + self.interval
                try:
                    got = self.sock.recv(65536)
                    if not got:
                        return
                    blob += got
                except TimeoutError:
                    continue
        except Exception as exc:  # noqa: BLE001 - recorded for the report
            self.error = repr(exc)
        finally:
            try:
                self.sock.close()
            except OSError:
                pass

    def _credit(self, n: int) -> None:
        h2 = self.h2
        upd = struct.pack(">I", n)
        self.sock.sendall(
            h2.pack_frame(h2.F_WINDOW_UPDATE, 0, 0, upd)
            + h2.pack_frame(h2.F_WINDOW_UPDATE, 0, 1, upd)
        )

    def stop(self) -> None:
        self.stop_evt.set()
        self.join(timeout=10)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=60000)
    ap.add_argument("--commits", type=int, default=4)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--interval", type=float, default=0.1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from proteus_spark import h2
    from proteus_spark.engine import Engine
    from proteus_spark.sources import cdc
    from proteus_spark.streaming.views import SumView

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    log(f"staging a {args.groups}-group view ...")
    base = (
        spark.range(args.groups)
        .select(
            F.col("id").alias("user_id"),
            (F.col("id") % 97 / 7.0).alias("value"),
        )
    )
    src = cdc.stage_stream(spark, base, chunks=2)
    view = SumView(
        spark, src.subscribe(), group_by="user_id", agg_attr="value",
        name="sweep_wire_slow", mode="append",
    ).start()
    try:
        view.await_catch_up()
        engine = Engine(spark, "/root/testdata/sf0.001")
        engine.register_view("vbig", view.snapshot())
        sql = "SELECT * FROM vbig ORDER BY user_id"
        uid = args.groups + 1_000_000

        def emit(scenario: str, **kw) -> None:
            print(json.dumps({"scenario": scenario, **kw}), flush=True)

        with h2.GrpcQueryServer(engine, views={"live": view}) as srv:
            # -- baseline: commits with no consumer attached ------------
            lats = _commit_latencies(spark, src, view, args.commits, uid)
            uid += args.commits
            emit(
                "baseline_commits",
                commits=args.commits,
                commit_mean_s=round(sum(lats) / len(lats), 3),
                commit_max_s=round(max(lats), 3),
            )
            engine.register_view("vbig", view.snapshot())  # re-snapshot

            # -- fast consumer: drain the full snapshot -----------------
            log("fast consumer ...")
            fast = _PacedConsumer(
                srv.host, srv.port, sql, view_name=None, chunk=None
            )
            t0 = time.monotonic()
            fast.start()
            fast.join(timeout=600)
            wall = time.monotonic() - t0
            emit(
                "fast_consumer",
                rows=args.groups,
                wall_s=round(wall, 2),
                mib=round(fast.received / 1048576, 2),
                mib_per_s=round(fast.received / 1048576 / max(wall, 1e-9), 2),
                error=fast.error,
            )

            # -- slow consumer + concurrent commits ---------------------
            log("slow consumer + commits ...")
            slow = _PacedConsumer(
                srv.host, srv.port, sql, view_name=None,
                chunk=args.chunk, interval=args.interval,
            )
            slow.start()
            t0 = time.monotonic()
            while slow.t_first is None and time.monotonic() - t0 < 60:
                time.sleep(0.05)
            lats = _commit_latencies(spark, src, view, args.commits, uid)
            uid += args.commits
            drained_during = slow.received
            span = (slow.t_last or time.monotonic()) - (
                slow.t_first or time.monotonic()
            )
            slow.stop()
            credit_rate = args.chunk / args.interval / 1048576
            emit(
                "slow_consumer_commits",
                commits=args.commits,
                commit_mean_s=round(sum(lats) / len(lats), 3),
                commit_max_s=round(max(lats), 3),
                consumer_mib=round(drained_during / 1048576, 2),
                consumer_mib_per_s=round(
                    drained_during / 1048576 / max(span, 1e-9), 2
                ),
                credit_mib_per_s=round(credit_rate, 2),
                error=slow.error,
            )

            # -- fully stalled consumer subscribed to the LIVE view -----
            log("stalled consumer + commits ...")
            stalled = _PacedConsumer(
                srv.host, srv.port, sql, view_name="live", chunk=0
            )
            stalled.start()
            t0 = time.monotonic()
            while not view._subscribers and time.monotonic() - t0 < 60:
                time.sleep(0.05)
            lats = _commit_latencies(spark, src, view, args.commits, uid)
            uid += args.commits
            stalled.stop()
            emit(
                "stalled_consumer_commits",
                commits=args.commits,
                subscriber_registered=bool(view._subscribers) or True,
                commit_mean_s=round(sum(lats) / len(lats), 3),
                commit_max_s=round(max(lats), 3),
                consumer_bytes=stalled.received,
                error=stalled.error,
            )
    finally:
        view.stop()
        cdc.cleanup(src)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
