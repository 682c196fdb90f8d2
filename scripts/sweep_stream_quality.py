"""stream_quality_gate sweep — linearity check for the round-11 addition.

The on-ingest quality gate's claimed scale shape (llmops/text.py::
quality_score_against): the classifier trains ONCE on the lake (one
codegen scan + a 6-value exact integer-micro aggregation per GD round),
the six round-6 weights freeze, and per micro-batch the scorer is a PURE
Catalyst projection over quality_features — six literals, zero shuffle,
no model join (plan-pinned by test_quality_gate_scoring_is_zero_shuffle)
— so end-to-end cost must be linear in arriving volume and independent
of everything else. This sweep trains the weights ONCE on the sf0.1 lake
slice, replicates the ARRIVING stream Nx (perturbed doc_ids, same text),
replays it as 4 micro-batches through the same foreachBatch pipeline the
registered query runs, and times end-to-end at 1x / 30x / 100x
interleaved in ONE session (cross-session absolutes are host-drift
garbage — round-7/8 lesson). A superlinear ratio means a per-batch
shuffle appeared where the plan test says none exists.

    python scripts/sweep_stream_quality.py [--mults 1 30 100] [--reps 2]

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

    from proteus_spark.llmops.text import (
        quality_features,
        quality_score_against,
        train_quality_classifier,
    )
    from proteus_spark.registry import load
    from proteus_spark.sources import cdc

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, args.sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    lake = docs.filter(F.col("doc_id") % 4 == 0)
    arriving_base = docs.filter(F.col("doc_id") % 4 != 0)
    n_arr = arriving_base.count()

    t0 = time.monotonic()
    w, _ = train_quality_classifier(quality_features(lake))
    print(
        f"# weights frozen on lake slice in {time.monotonic() - t0:.1f}s: "
        f"{w}",
        file=sys.stderr,
    )

    root = tempfile.mkdtemp(prefix="stream_quality_sweep_")
    paths = {}
    for mult in args.mults:
        rep = arriving_base
        if mult > 1:
            rep = (
                arriving_base.crossJoin(
                    spark.range(mult).select(F.col("id").alias("_cp"))
                )
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
        print(f"# built {mult}x ({n_arr * mult} arriving)", file=sys.stderr)

    for rep_i in range(args.reps):
        for mult in args.mults:
            arriving = spark.read.parquet(paths[mult])
            src = cdc.stage_stream(spark, arriving, chunks=4)
            outdir = tempfile.mkdtemp(prefix="stream_quality_sink_")

            def on_batch(batch, epoch):
                quality_score_against(batch, w).write.mode("append").parquet(
                    outdir
                )

            t0 = time.monotonic()
            query = (
                src.subscribe(max_files_per_trigger=1)
                .writeStream.outputMode("append")
                .foreachBatch(on_batch)
                .queryName("sweep_stream_quality")
                .start()
            )
            try:
                query.processAllAvailable()
            finally:
                query.stop()
                cdc.cleanup(src)
            dt = time.monotonic() - t0
            out = spark.read.parquet(outdir)
            n_out = out.count()
            n_kept = out.filter("kept = 1").count()
            shutil.rmtree(outdir, ignore_errors=True)
            print(
                json.dumps(
                    {
                        "op": "stream_quality_gate",
                        "mult": mult,
                        "arriving_docs": n_arr * mult,
                        "rep": rep_i,
                        "sec": round(dt, 1),
                        "scored_rows": n_out,
                        "kept_rows": n_kept,
                    }
                ),
                flush=True,
            )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
