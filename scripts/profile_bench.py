"""Round-15 optimization profiler (guide §1).

For each headline/bench query: capture `.explain("formatted")` into
plans/r15/<name>_<label>.txt, split the measured time into DataFrame
CONSTRUCTION (Python + analysis) vs EXECUTION (noop sink), and count the
plan's Exchange / join-strategy / Python-eval nodes so plan-shape claims
in OPTIMIZATION_r15.md trace back to committed artifacts.

    python scripts/profile_bench.py before            # all bench queries
    python scripts/profile_bench.py after --only tpch_q1

One JSON line per query on stdout; plans land in plans/r15/.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_NAMES = [
    "ref_lobsters_topk", "ref_join_merge", "ref_sum_view", "ref_topk_orders",
    "ref_range_filter", "ref_index_range", "ref_router_union",
    "asof_join_latest_order", "llm_decontaminate", "llm_dedup_exact_substring",
    "llm_dedup_minhash_lsh", "llm_pack_sequences", "llm_sim_bruteforce",
    "llm_sim_mips_banded", "tpch_q1", "tpch_q10", "tpch_q21", "tpch_q3",
    "tpch_q5", "tpch_q6", "tpch_q9",
]


def plan_stats(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "bhj": len(re.findall(r"BroadcastHashJoin", text)),
        "smj": len(re.findall(r"SortMergeJoin", text)),
        "shj": len(re.findall(r"ShuffledHashJoin", text)),
        "bnl": len(re.findall(r"BroadcastNestedLoopJoin", text)),
        "cartesian": len(re.findall(r"CartesianProduct", text)),
        "python_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", text)
        ),
        "sorts": len(re.findall(r"\bSort\b", text)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("label", help="plan file suffix, e.g. before/after")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--plans-dir", default="plans/r16",
                    help="repo-relative dir for the plan captures")
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1")

    from proteus_spark import registry
    from proteus_spark.session import build_session

    spark = build_session(app_name="r15_profile", cores=args.cores)
    spark.range(1).count()
    warm = "/root/testdata/sf0.001/region.parquet"
    if os.path.exists(warm) and warm not in args.sf_dir:
        spark.read.parquet(warm).count()

    fns = registry.all_queries()
    names = args.only or [n for n in BENCH_NAMES if n in fns]
    unknown = [n for n in names if n not in fns]
    if unknown:
        ap.error(
            f"unknown queries: {unknown} — valid names come from "
            "registry.all_queries()"
        )
    plans_dir = Path(REPO) / args.plans_dir
    plans_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = fns[name]
        spark.sparkContext.setJobDescription(f"r15 {args.label}: {name}")
        # construction time (Python + analysis), measured cold-ish
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        t_construct = time.perf_counter() - t0
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        (plans_dir / f"{name}_{args.label}.txt").write_text(plan)
        # warm-up + timed executions of the full query (construct+run, the
        # bench's own unit) and execution-only on the prebuilt df
        runs_full, runs_exec = [], []
        for i in range(args.runs + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            d2 = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            d2.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            if i:  # first is warm-up
                runs_full.append(round(t2 - t0, 4))
                runs_exec.append(round(t2 - t1, 4))
        print(json.dumps({
            "query": name,
            "construct_s": round(t_construct, 4),
            "best_full_s": min(runs_full),
            "best_exec_s": min(runs_exec),
            "runs_full": runs_full,
            "plan": plan_stats(plan),
        }), flush=True)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
