"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed twice: a warm-up is NOT used (cold numbers are
honest), but a tiny count() pre-touches the session so JVM startup isn't
attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from proteus_spark import registry  # noqa: E402
from proteus_spark.session import build_session  # noqa: E402

HEADLINE = [
    "ref_lobsters_topk",
    "ref_join_merge",
    "ref_sum_view",
    "ref_topk_orders",
    "ref_range_filter",
    "ref_index_range",
    "ref_router_union",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="proteus_spark_bench", cores=cpus)
    spark.range(1).count()  # session warm-up (JVM, not query work)

    fns = registry.all_queries()
    names = [n for n in HEADLINE if n in fns]
    # include any registered benchmark-tagged queries beyond the headline
    for n, spec in sorted(registry.QUERIES.items()):
        if "bench" in spec.tags and n not in names:
            names.append(n)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = fns[name](spark, sf_dir)
        # noop sink forces full evaluation of every output column
        # (count() alone would let Catalyst prune the projection).
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        print(f"# {name}: done in {dt:.3f}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
