"""DSIR selection sweep — the linearity check for the round-9 addition.

dsir_select's claimed scale shape (llmops/text.py): two linear passes
over the corpus (bucket counting, then scoring against a broadcast
<=4096-row log-ratio frame) + a top-k. This sweep replicates the sf0.1
documents table Nx (perturbed doc_ids, same text — the feature pass cost
depends on token volume, not content) and times the full selection at
1x / 30x / 100x interleaved in ONE session (cross-session absolutes are
host-drift garbage — round-7/8 lesson). A superlinear ratio here means
a shuffle grew with something other than the corpus.

    python scripts/sweep_dsir.py [--mults 1 30 100] [--reps 2]

Output: one JSON line per cell on stdout; progress on stderr.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", type=int, nargs="*", default=[1, 30, 100])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from proteus_spark.llmops.text import dsir_select
    from proteus_spark.registry import load

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, args.sf_dir, "documents")
    base_n = docs.count()
    root = tempfile.mkdtemp(prefix="dsir_sweep_")
    paths = {}
    for mult in args.mults:
        rep = (
            docs.crossJoin(spark.range(mult).select(F.col("id").alias("_cp")))
            .select(
                (F.col("doc_id") * mult + F.col("_cp")).alias("doc_id"),
                "text",
                "lang",
            )
            .repartition(args.cores)  # r5 lesson: never one giant file
        )
        path = os.path.join(root, f"m{mult}")
        rep.write.parquet(path)
        paths[mult] = path
        print(f"# built {mult}x ({base_n * mult} docs)", file=sys.stderr)

    for rep_i in range(args.reps):
        for mult in args.mults:
            d = spark.read.parquet(paths[mult])
            t0 = time.monotonic()
            out = dsir_select(d).collect()
            dt = time.monotonic() - t0
            print(
                json.dumps(
                    {
                        "op": "dsir_select",
                        "mult": mult,
                        "docs": base_n * mult,
                        "rep": rep_i,
                        "sec": round(dt, 1),
                        "selected": len(out),
                    }
                ),
                flush=True,
            )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
