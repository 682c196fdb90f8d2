"""stream_lsh_dedup_ingest sweep — linearity check for the round-10
addition.

The on-ingest near-dup gate's claimed scale shape
(llmops/dedup.py::lsh_match_against): per micro-batch, shingle + minhash
+ band the ARRIVING docs (linear in arriving tokens), BROADCAST the
batch's band table into an equi-join against the frozen lake band
table, then one small per-doc aggregation. Two axes:

- ARRIVING volume (the stream's throughput axis): lake frozen at 1x,
  arriving replicated 1x / 30x / 100x (perturbed doc_ids, same text),
  replayed as 4 micro-batches — must be linear in arriving volume.
- LAKE size (the honest residual): at a fixed 1x arriving stream, the
  lake band table at 1x vs 10x. Locally the broadcast join SCANS the
  cached lake table per batch, so per-batch cost has a term linear in
  |lake|; in a deployment the lake side is a maintained table bucketed
  on (band, bv) so the probe prunes to matching buckets. The sweep
  MEASURES the local term instead of hiding it.

All cells interleave in ONE session (cross-session absolutes are
host-drift garbage — round-7/8 lesson).

    python scripts/sweep_stream_lsh.py [--mults 1 30 100] [--reps 2]

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
    ap.add_argument("--lake-mults", type=int, nargs="*", default=[10])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from proteus_spark.llmops.dedup import (
        lsh_band_table,
        lsh_match_against,
        minhash_signatures,
        shingles,
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
    n_lake, n_arr = lake.count(), arriving_base.count()

    def freeze_lake(mult: int):
        src = lake
        if mult > 1:
            src = lake.crossJoin(
                spark.range(mult).select(F.col("id").alias("_cp"))
            ).select(
                (F.col("doc_id") * mult + F.col("_cp")).alias("doc_id"),
                "text",
                "lang",
            )
        lb = (
            lsh_band_table(minhash_signatures(shingles(src, distinct=False)))
            .withColumnRenamed("doc_id", "lake_id")
            .cache()
        )
        n = lb.count()
        print(f"# lake {mult}x frozen: {n} band rows", file=sys.stderr)
        return lb

    root = tempfile.mkdtemp(prefix="stream_lsh_sweep_")
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

    def run_cell(tag, lake_bands, arr_path, mult, lake_mult, rep_i):
        arriving = spark.read.parquet(arr_path)
        src = cdc.stage_stream(spark, arriving, chunks=4)
        outdir = tempfile.mkdtemp(prefix="stream_lsh_sink_")

        def on_batch(batch, epoch):
            lsh_match_against(batch, lake_bands).write.mode(
                "append"
            ).parquet(outdir)

        t0 = time.monotonic()
        query = (
            src.subscribe(max_files_per_trigger=1)
            .writeStream.outputMode("append")
            .foreachBatch(on_batch)
            .queryName("sweep_stream_lsh")
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
        n_dup = out.filter("is_dup = 1").count()
        shutil.rmtree(outdir, ignore_errors=True)
        print(
            json.dumps(
                {
                    "op": "stream_lsh_dedup_ingest",
                    "axis": tag,
                    "arriving_mult": mult,
                    "lake_mult": lake_mult,
                    "arriving_docs": n_arr * mult,
                    "lake_docs": n_lake * lake_mult,
                    "rep": rep_i,
                    "sec": round(dt, 1),
                    "gated_rows": n_out,
                    "flagged_dups": n_dup,
                }
            ),
            flush=True,
        )

    lb1 = freeze_lake(1)
    for rep_i in range(args.reps):
        for mult in args.mults:
            run_cell("arriving", lb1, paths[mult], mult, 1, rep_i)
    for lm in args.lake_mults:
        lbn = freeze_lake(lm)
        for rep_i in range(args.reps):
            run_cell("lake", lbn, paths[args.mults[0]], args.mults[0], lm, rep_i)
        lbn.unpersist()
    lb1.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
