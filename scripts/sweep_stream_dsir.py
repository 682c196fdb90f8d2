"""stream_dsir_ingest sweep — linearity check for the round-10 addition.

The on-ingest DSIR scorer's claimed scale shape (llmops/text.py::
dsir_score_against): per micro-batch, one bigram explode + a BROADCAST
join to the frozen <=4096-row model + one per-doc aggregation — linear in
arriving tokens, independent of lake size. This sweep freezes the model
ONCE on the sf0.1 lake, replicates the ARRIVING stream Nx (perturbed
doc_ids, same text), replays it as 4 micro-batches through the same
foreachBatch pipeline the registered query runs, and times end-to-end at
1x / 30x (optionally 100x) interleaved in ONE session (cross-session
absolutes are host-drift garbage — round-7/8 lesson). A superlinear
ratio means a per-batch shuffle grew with something other than the
arriving volume.

    python scripts/sweep_stream_dsir.py [--mults 1 30] [--reps 2]

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
    ap.add_argument("--mults", type=int, nargs="*", default=[1, 30])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from proteus_spark.llmops.text import dsir_model, dsir_score_against
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
    base_n = docs.count()
    model = dsir_model(docs).cache()
    model.count()  # frozen once on the lake, like the registered query
    print(f"# model frozen on {base_n} lake docs", file=sys.stderr)

    root = tempfile.mkdtemp(prefix="stream_dsir_sweep_")
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
        print(f"# built {mult}x ({base_n * mult} arriving docs)", file=sys.stderr)

    for rep_i in range(args.reps):
        for mult in args.mults:
            arriving = spark.read.parquet(paths[mult])
            src = cdc.stage_stream(spark, arriving, chunks=4)
            outdir = tempfile.mkdtemp(prefix="stream_dsir_sink_")

            def on_batch(batch, epoch):
                scored = dsir_score_against(batch, model)
                scored.select(
                    "doc_id",
                    "llr_micros",
                    "n_bigrams",
                    (F.col("llr_micros") > 0).cast("long").alias("kept"),
                ).write.mode("append").parquet(outdir)

            t0 = time.monotonic()
            query = (
                src.subscribe(max_files_per_trigger=1)
                .writeStream.outputMode("append")
                .foreachBatch(on_batch)
                .queryName("sweep_stream_dsir")
                .start()
            )
            try:
                query.processAllAvailable()
            finally:
                query.stop()
                cdc.cleanup(src)
            dt = time.monotonic() - t0
            n_out = spark.read.parquet(outdir).count()
            shutil.rmtree(outdir, ignore_errors=True)
            print(
                json.dumps(
                    {
                        "op": "stream_dsir_ingest",
                        "mult": mult,
                        "arriving_docs": base_n * mult,
                        "rep": rep_i,
                        "sec": round(dt, 1),
                        "scored_rows": n_out,
                    }
                ),
                flush=True,
            )
    model.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
