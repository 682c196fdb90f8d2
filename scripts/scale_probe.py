"""Scale-credibility probe (VERDICT r15 item 6, optimization r16).

The driver's 8-vs-32-core scaling block cannot distinguish a parallel
plan from a serial one at sf0.1 because every input table is a SINGLE
parquet row group (one scan task regardless of core count). This probe
rewrites lineitem with small row groups — the layout any real lake
writer produces — into a THROWAWAY temp SF dir (other tables symlinked),
then times scan-heavy queries with the noop sink at the given core
count. Run it once per core count and compare:

    python scripts/scale_probe.py --cores 32
    python scripts/scale_probe.py --cores 8

Non-headline evidence only: bench.py and its env contract are untouched;
the rewritten layout lives in a temp dir and is deleted afterwards. The
probe recomputes everything from parquet on every run (no caching).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_QUERIES = ["tpch_q1", "tpch_q6", "tpch_q9"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--sf", default="sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--row-group-rows", type=int, default=16_000,
                    help="~38 groups for sf0.1 lineitem (600k rows)")
    ap.add_argument("--replicate", type=int, default=1,
                    help="write lineitem N times over — at sf0.1 the raw "
                    "table is ~11 MB, far too little work for ANY layout "
                    "to show parallel speedup (whole-scan CPU ~ms; job "
                    "overhead dominates). Replication scales the per-core "
                    "work so the probe measures the PLAN's scalability, "
                    "not the fixture's size. Throwaway probe data only; "
                    "results are never compared to an oracle.")
    args = ap.parse_args()
    src_dir = os.path.join("/root/testdata", args.sf)

    import pyarrow.parquet as pq

    probe_dir = tempfile.mkdtemp(prefix="proteus_scale_probe_")
    try:
        # symlink every table, rewrite lineitem with small row groups
        for name in os.listdir(src_dir):
            src = os.path.join(src_dir, name)
            dst = os.path.join(probe_dir, name)
            if name == "lineitem.parquet":
                files = (
                    [os.path.join(src, f) for f in os.listdir(src)
                     if f.endswith(".parquet")]
                    if os.path.isdir(src) else [src]
                )
                tables = [pq.read_table(f) for f in files]
                os.makedirs(dst)
                i = 0
                for _ in range(args.replicate):
                    for t in tables:
                        pq.write_table(
                            t, os.path.join(dst, f"part-{i:03d}.parquet"),
                            row_group_size=args.row_group_rows,
                        )
                        i += 1
                groups = sum(
                    pq.ParquetFile(os.path.join(dst, f)).metadata.num_row_groups
                    for f in os.listdir(dst)
                )
                print(f"# rewrote lineitem: {groups} row groups", file=sys.stderr)
            else:
                os.symlink(src, dst)

        from pyspark.sql import SparkSession

        from proteus_spark import registry

        spark = (
            SparkSession.builder.master(f"local[{args.cores}]")
            .appName("proteus_scale_probe")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", str(args.cores))
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1).count()

        fns = registry.all_queries()
        out = {"cores": args.cores, "sf": args.sf,
               "row_group_rows": args.row_group_rows, "queries": {}}
        for name in PROBE_QUERIES:
            spark.sparkContext.setJobDescription(f"scale_probe:{name}")
            fns[name](spark, probe_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # untimed warm-up
            runs = []
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fns[name](spark, probe_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 3))
            out["queries"][name] = {"best": min(runs), "runs": runs}
            print(f"# {name}@{args.cores}c: {runs}", file=sys.stderr)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
