"""Per-query wall-time profile of the stream_* family (and any --only set).

Optimization-round triage (guide §1): runs each query in a driver-faithful
plain session at the given SF, one untimed warm-up run of the FIRST query
only (session warm-up), then N timed runs per query; prints per-query
best/median and a total. Streaming queries run real micro-batch pipelines,
so these are end-to-end wall times (staging + run + final read), the same
unit the full-registry gate pays.

    python scripts/profile_streams.py --sf sf0.01 --runs 2
    python scripts/profile_streams.py --sf sf0.01 --only stream_sum_view ...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--tag", default="streaming")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1")
    sf_dir = os.path.join("/root/testdata", args.sf)

    from pyspark.sql import SparkSession

    from proteus_spark import registry

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("proteus_profile_streams")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    specs = registry._ordered()
    if args.only:
        unknown = set(args.only) - set(specs)
        if unknown:
            ap.error(f"unknown queries: {sorted(unknown)}")
        names = [n for n in specs if n in set(args.only)]
    else:
        names = [n for n, s in specs.items() if args.tag in s.tags]

    fns = registry.all_queries()
    out: dict[str, dict] = {}
    total = 0.0
    for i, name in enumerate(names):
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if i == 0:  # session warm-up absorbs JVM/codegen first-run cost
            fns[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        runs = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fns[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        best = min(runs)
        total += best
        out[name] = {
            "best": round(best, 3),
            "median": round(statistics.median(runs), 3),
            "runs": [round(r, 3) for r in runs],
        }
        print(f"# {name}: best {best:.3f}s runs {[round(r,3) for r in runs]}",
              file=sys.stderr)
    print(json.dumps({"sf": args.sf, "total_best": round(total, 2),
                      "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
