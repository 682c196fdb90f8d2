"""On-ingest SemDeDup gate sweep — pre-registration scale check for the
round-12 candidate (the stream_quality / stream_dsir convention: the
sweep ships WITH the machinery, before the query registers).

Claimed scale shape (llmops/similarity.py::semdedup_match_against): per
micro-batch, assign arriving vectors to the broadcast frozen centroids
(one codegen pass), BROADCAST the assigned+normalized batch into the
cluster equi-join against the frozen lake index, then one per-vector
aggregation. Two axes:

- ARRIVING volume: lake frozen at 1x, arriving replicated 1x/30x/100x
  (perturbed vec_ids, same embeddings), replayed as 4 micro-batches —
  must be linear in arriving volume.
- LAKE size (the honest residual, same as the LSH gate's): the
  broadcast join scans the cached lake index per batch, so per-batch
  cost has a term linear in |lake|; the deployment answer is the SAME
  partitioned-table probe already demonstrated twice
  (dedup.lsh_lake_write / similarity.ivf_index_write — the lake index
  partitions on bucket and the batch's assigned buckets prune the
  scan). The sweep measures the local term instead of hiding it.

All cells interleave in ONE session (cross-session absolutes are
host-drift garbage — round-7/8 lesson).

    python scripts/sweep_stream_semdedup.py [--mults 1 30 100] [--reps 2]

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
    ap.add_argument(
        "--bucketed",
        action="store_true",
        help="serve the lake from the PARTITIONED table "
        "(semdedup_lake_write + semdedup_match_against_bucketed — the "
        "registered stream_semdedup_ingest path) instead of a cached "
        "DataFrame; cells additionally record the lake bytes on disk",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from proteus_spark.llmops.similarity import (
        semdedup_lake_index,
        semdedup_lake_write,
        semdedup_match_against,
        semdedup_match_against_bucketed,
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

    emb = load(spark, args.sf_dir, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id") < 10).cache()
    cents.count()
    lake = emb.filter(F.col("vec_id") % 4 == 0)
    arriving_base = emb.filter(F.col("vec_id") % 4 != 0)
    n_lake, n_arr = lake.count(), arriving_base.count()

    def replicate(df, mult):
        if mult == 1:
            return df
        return (
            df.crossJoin(spark.range(mult).select(F.col("id").alias("_cp")))
            .select(
                (F.col("vec_id") * mult + F.col("_cp")).alias("vec_id"),
                "embedding",
            )
            .repartition(args.cores)  # r5 lesson: never one giant file
        )

    lake_root = tempfile.mkdtemp(prefix="stream_semdedup_lake_")

    def _dir_bytes(path: str) -> int:
        total = 0
        for dp, _dn, fns in os.walk(path):
            for f in fns:
                try:
                    total += os.path.getsize(os.path.join(dp, f))
                except OSError:
                    pass
        return total

    def freeze_lake(mult):
        """Returns (lake_side, lake_bytes): a cached DataFrame (default)
        or a partitioned-table scan resolved once (--bucketed, the
        registered serving path)."""
        idx = semdedup_lake_index(replicate(lake, mult), cents)
        if args.bucketed:
            path = os.path.join(lake_root, f"lake{mult}")
            semdedup_lake_write(idx, path)
            served = spark.read.parquet(path)
            nbytes = _dir_bytes(path)
            print(
                f"# lake {mult}x written partitioned: "
                f"{served.count()} index rows, {nbytes / 1e6:.1f} MB",
                file=sys.stderr,
            )
            return served, nbytes
        idx = idx.cache()
        n = idx.count()
        print(f"# lake {mult}x frozen: {n} index rows", file=sys.stderr)
        return idx, None

    root = tempfile.mkdtemp(prefix="stream_semdedup_sweep_")
    paths = {}
    for mult in args.mults:
        path = os.path.join(root, f"m{mult}")
        replicate(arriving_base, mult).write.parquet(path)
        paths[mult] = path
        print(f"# built {mult}x ({n_arr * mult} arriving)", file=sys.stderr)

    def run_cell(tag, lake_idx, arr_path, mult, lake_mult, rep_i, lake_bytes):
        arriving = spark.read.parquet(arr_path)
        src = cdc.stage_stream(spark, arriving, chunks=4)
        outdir = tempfile.mkdtemp(prefix="stream_semdedup_sink_")
        gate = (
            semdedup_match_against_bucketed
            if args.bucketed
            else semdedup_match_against
        )

        def on_batch(batch, epoch):
            gate(batch, lake_idx, cents).write.mode("append").parquet(outdir)

        t0 = time.monotonic()
        query = (
            src.subscribe(max_files_per_trigger=1)
            .writeStream.outputMode("append")
            .foreachBatch(on_batch)
            .queryName("sweep_stream_semdedup")
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
                    "op": "stream_semdedup_ingest",
                    "axis": tag,
                    "arriving_mult": mult,
                    "lake_mult": lake_mult,
                    "arriving_vecs": n_arr * mult,
                    "lake_vecs": n_lake * lake_mult,
                    "rep": rep_i,
                    "sec": round(dt, 1),
                    "gated_rows": n_out,
                    "flagged_dups": n_dup,
                    "served": "bucketed" if args.bucketed else "cached",
                    "lake_bytes": lake_bytes,
                }
            ),
            flush=True,
        )

    idx1, bytes1 = freeze_lake(1)
    for rep_i in range(args.reps):
        for mult in args.mults:
            run_cell("arriving", idx1, paths[mult], mult, 1, rep_i, bytes1)
    for lm in args.lake_mults:
        idxn, bytesn = freeze_lake(lm)
        for rep_i in range(args.reps):
            run_cell(
                "lake", idxn, paths[args.mults[0]], args.mults[0], lm,
                rep_i, bytesn,
            )
        if not args.bucketed:
            idxn.unpersist()
    if not args.bucketed:
        idx1.unpersist()
    cents.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(lake_root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
