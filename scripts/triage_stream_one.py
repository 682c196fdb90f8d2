"""Phase-level triage of ONE streaming query: per-micro-batch trigger
durations (and their sub-phases) from the StreamingQueryListener, plus
wall-time of the whole query callable. Optimization-round tool (guide §1).

    python scripts/triage_stream_one.py stream_static_enrich --sf sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class DetailListener:
    def __init__(self):
        self.rows = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        try:
            p = event.progress
            self.rows.append(
                {
                    "name": str(p.name or p.id),
                    "batchId": p.batchId,
                    "durationMs": dict(p.durationMs or {}),
                    "numInputRows": p.numInputRows,
                }
            )
        except Exception as exc:
            print("listener err", exc, file=sys.stderr)

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()
    sf_dir = os.path.join("/root/testdata", args.sf)

    from pyspark.sql.streaming import StreamingQueryListener

    # build the listener class dynamically so the import above stays light
    Listener = type("L", (StreamingQueryListener,), dict(DetailListener.__dict__))

    from pyspark.sql import SparkSession

    from proteus_spark import registry

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("proteus_triage_stream")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    fns = registry.all_queries()
    fn = fns[args.query]
    for run in range(args.runs):
        lst = Listener()
        lst.rows = []
        spark.streams.addListener(lst)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        try:
            spark.streams.removeListener(lst)
        except Exception:
            pass
        print(
            json.dumps(
                {
                    "run": run,
                    "construct_plus_stream_s": round(t1 - t0, 3),
                    "noop_exec_s": round(t2 - t1, 3),
                    "batches": lst.rows,
                },
                indent=1,
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
