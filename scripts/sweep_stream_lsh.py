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
- BUCKETED lake (--bucketed; VERDICT r10 #4): the deployment answer
  DEMONSTRATED — lsh_lake_write persists the lake band table
  partitioned on bk = pmod(hash(band, bv), N) with N scaled to the
  lake (constant partition size), lsh_match_against_bucketed statically
  prunes each probe to the trickle's matched partitions, and the cells
  record bytes-under-matched-partitions vs lake-total alongside
  wall-clock. Measured at sf0.1 (lake 1x/10x/100x, 64-doc trickle,
  3 reps): probe FLAT at 0.8-1.1s / 0.7-0.9s / 0.8-0.9s with matched
  bytes 1.10 MB / 0.96 MB / 0.31 MB while the lake grows
  4.9 -> 38.8 -> 93.9 MB — the linear lake term is gone.

All cells interleave in ONE session (cross-session absolutes are
host-drift garbage — round-7/8 lesson).

    python scripts/sweep_stream_lsh.py [--mults 1 30 100] [--reps 2]
    python scripts/sweep_stream_lsh.py --bucketed --lake-mults 1 10 100

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
        "--bucketed", action="store_true",
        help="run the bucketed lake-axis probe sweep (VERDICT r10 #4) "
        "instead of the streaming cells",
    )
    ap.add_argument("--buckets", type=int, default=1024)
    ap.add_argument("--trickle-docs", type=int, default=64)
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
    for mult in args.mults if not args.bucketed else []:
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

    if not args.bucketed:
        lb1 = freeze_lake(1)
        for rep_i in range(args.reps):
            for mult in args.mults:
                run_cell("arriving", lb1, paths[mult], mult, 1, rep_i)
        for lm in args.lake_mults:
            lbn = freeze_lake(lm)
            for rep_i in range(args.reps):
                run_cell(
                    "lake", lbn, paths[args.mults[0]], args.mults[0], lm, rep_i
                )
            lbn.unpersist()
        lb1.unpersist()
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
        return 0

    # ---- bucketed lake-axis sweep (VERDICT r10 #4) ----------------------
    # The deployment answer to the cached-lake probe residual, MEASURED:
    # the lake band table persisted partitioned on bk = pmod(hash(band,
    # bv), N); a small arriving trickle (the realistic per-trigger gate
    # shape — pruning wins when batch band-keys < N partitions) probes
    # via lsh_match_against_bucketed, and dynamic partition pruning
    # restricts the lake scan to matching partitions. Cells compare the
    # CACHED stand-in (cost term linear in |lake|) vs the BUCKETED table
    # (cost ~ matching partitions) at lake 1x/10x/100x, fixed trickle.
    from proteus_spark.llmops.dedup import (
        lsh_lake_write,
        lsh_match_against_bucketed,
    )

    trickle = arriving_base.orderBy("doc_id").limit(args.trickle_docs)
    trickle_path = os.path.join(root, "trickle")
    trickle.write.parquet(trickle_path)
    trickle = spark.read.parquet(trickle_path)
    n_keys = (
        lsh_band_table(minhash_signatures(shingles(trickle, distinct=False)))
        .select("band", "bv")
        .distinct()
        .count()
    )
    print(
        f"# trickle: {args.trickle_docs} docs, {n_keys} distinct band keys "
        f"vs {args.buckets} partitions",
        file=sys.stderr,
    )

    def time_probe(fn, tag, lake_mult, lake_rows, nb, files_fn=None):
        for rep_i in range(args.reps):
            t0 = time.monotonic()
            out = fn()
            n_out = out.count()
            dt = time.monotonic() - t0
            cell = {
                "op": "lsh_lake_probe",
                "axis": tag,
                "lake_mult": lake_mult,
                "lake_band_rows": lake_rows,
                "trickle_docs": args.trickle_docs,
                "distinct_band_keys": n_keys,
                "buckets": nb,
                "rep": rep_i,
                "sec": round(dt, 2),
                "gated_rows": n_out,
            }
            if files_fn is not None:
                cell.update(files_fn(out))
            print(json.dumps(cell), flush=True)

    for lm in args.lake_mults:
        lbn = freeze_lake(lm)
        lake_rows = lbn.count()
        # deployment invariant: n_buckets scales WITH the lake so the
        # partition size stays constant — the probe then reads
        # ~|batch band keys| constant-size partitions regardless of
        # |lake| (flat lake-axis files/bytes, the sub-linear claim)
        nb = args.buckets * lm
        lake_path = os.path.join(root, f"lake_bk_{lm}")
        lsh_lake_write(lbn, lake_path, n_buckets=nb)

        # filesystem arithmetic for the pruning claim: bytes under the
        # trickle's matched bk= partitions (what the INSET-filtered scan
        # reads) vs the whole lake — matched bytes must stay ~FLAT as
        # the lake grows (buckets scale with it), total grows linearly
        from proteus_spark.llmops.dedup import _lake_bucket_col

        bks = {
            r["bk"]
            for r in lsh_band_table(
                minhash_signatures(shingles(trickle, distinct=False))
            )
            .select(_lake_bucket_col(nb).alias("bk"))
            .distinct()
            .collect()
        }

        def dir_bytes(p):
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(p)
                for f in fs
            )

        matched = sum(
            dir_bytes(os.path.join(lake_path, f"bk={b}"))
            for b in bks
            if os.path.isdir(os.path.join(lake_path, f"bk={b}"))
        )
        total = dir_bytes(lake_path)

        def lake_files(_out, _m=matched, _t=total, _k=len(bks)):
            return {
                "lake_bytes_matched": _m,
                "lake_bytes_total": _t,
                "partitions_matched": _k,
                "partitions_total": nb,
            }

        time_probe(
            lambda: lsh_match_against(trickle, lbn), "probe_cached", lm,
            lake_rows, nb,
        )
        # resolved ONCE (frozen lake contract) — the file index caches
        # with the DataFrame; via lake_read, the schema-sidecar reader
        # the registered query ships with (r13)
        from proteus_spark.llmops.lake import lake_read

        lake_df = lake_read(spark, lake_path)
        time_probe(
            lambda _nb=nb, _l=lake_df: lsh_match_against_bucketed(
                trickle, _l, n_buckets=_nb
            ),
            "probe_bucketed", lm, lake_rows, nb, files_fn=lake_files,
        )
        lbn.unpersist()

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
