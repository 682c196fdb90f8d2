"""Round-15 full-registry optimization sweep (guide §1).

Every registered query, at the given SF: construction time, best-of-2
execution (noop sink), and plan-shape counters (Exchange, join strategies,
CartesianProduct, Python-eval nodes, Sorts). The checklist source for
OPTIMIZATION_r15.md — finds scale anti-patterns OUTSIDE the headline set.

    python scripts/sweep_registry_plans.py --sf sf0.01 > sweep.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_stats(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "bhj": len(re.findall(r"BroadcastHashJoin", text)),
        "smj": len(re.findall(r"SortMergeJoin", text)),
        "shj": len(re.findall(r"ShuffledHashJoin", text)),
        "bnl": len(re.findall(r"BroadcastNestedLoopJoin", text)),
        "cartesian": len(re.findall(r"CartesianProduct", text)),
        "python_eval": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
                r"FlatMapGroupsInPandas",
                text,
            )
        ),
        "sorts": len(re.findall(r"\bSort\b", text)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    sf_dir = os.path.join("/root/testdata", args.sf)

    from proteus_spark import registry
    from proteus_spark.session import build_session

    spark = build_session(app_name="r15_sweep", cores=args.cores)
    spark.range(1).count()

    fns = registry.all_queries()
    names = args.only or list(fns)
    for name in names:
        spark.sparkContext.setJobDescription(f"r15 sweep: {name}")
        rec: dict = {"query": name}
        try:
            t0 = time.perf_counter()
            df = fns[name](spark, sf_dir)
            rec["construct_s"] = round(time.perf_counter() - t0, 3)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            rec["plan"] = plan_stats(plan)
            runs = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                d2 = fns[name](spark, sf_dir)
                d2.write.mode("overwrite").format("noop").save()
                runs.append(round(time.perf_counter() - t0, 3))
            rec["best_s"] = min(runs)
            rec["runs"] = runs
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            rec["error"] = str(exc)[:300]
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
