"""SemDeDup cluster-size-cap sweep — the VERDICT-r8 scale-killer check.

The marginal prune (semdedup_prune_assigned over an existing index) costs
one pair-join whose volume is sum(|cluster|^2)/2 — fine under the paper's
k-proportional-to-corpus rule IF cluster sizes stay uniform, but a single
hot cluster makes one task quadratic. The cap bounds the per-cluster pair
space to |c| x C (linear). This sweep measures the marginal prune at a
replica scale (default 100x of sf0.1 embeddings, k = 8 x mult — the same
shape as the round-8 README sweep rows) under:

  - UNIFORM cluster sizes, uncapped vs capped;
  - SKEWED cluster sizes (one hot cluster holding `hot_frac` of the
    corpus — the failure mode the cap exists for), uncapped vs capped.

All four cells run interleaved in ONE session (host drift makes
cross-session absolutes garbage — round-7/8 lesson); compare ratios.

    python scripts/sweep_semdedup_cap.py [--mult 100] [--cap 8]
        [--hot-frac 0.05] [--reps 2]

Output: one JSON line per cell on stdout; progress on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--cap", type=int, default=8)
    ap.add_argument("--hot-frac", type=float, default=0.05)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from proteus_spark.llmops.similarity import (
        _bucket_means,
        semdedup_prune_assigned,
    )
    from proteus_spark.registry import load

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, args.sf_dir, "embeddings")
    mult, k = args.mult, 8 * args.mult
    # perturbed disjoint copies; repartition(32) before write (r5 lesson:
    # a crossJoin-built replica otherwise lands in one near-unsplittable
    # file and every scan-bound number is garbage)
    rep = (
        emb.crossJoin(spark.range(mult).select(F.col("id").alias("_cp")))
        .select(
            (F.col("vec_id") * mult + F.col("_cp")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.col("_cp") * F.lit(1e-4)
            ).alias("embedding"),
        )
        .repartition(args.cores)
    )
    root = tempfile.mkdtemp(prefix="semdedup_cap_sweep_")
    u = F.pmod(F.xxhash64("vec_id"), F.lit(k)).cast("long")
    layouts = {
        # uniform: every cluster ~ |corpus|/k members
        "uniform": rep.withColumn("bucket", u),
        # skewed: one hot cluster holds hot_frac of the corpus (bucket 0),
        # the rest uniform — the single-hot-cluster failure mode
        "skewed": rep.withColumn(
            "bucket",
            F.when(
                F.pmod(F.xxhash64("vec_id", F.lit(1)), F.lit(1_000_000))
                < int(args.hot_frac * 1_000_000),
                F.lit(0),
            ).otherwise(u),
        ),
    }
    frames = {}
    for name, df in layouts.items():
        path = os.path.join(root, name)
        df.write.parquet(path)
        idx = spark.read.parquet(path)
        cents = _bucket_means(idx).localCheckpoint(eager=True)
        pairs = (
            idx.groupBy("bucket")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")).alias("s2"))
            .first()["s2"]
        )
        print(
            f"[{name}] rows={idx.count()} clusters<= {k} "
            f"sum|c|^2/2={pairs // 2}",
            file=sys.stderr,
        )
        frames[name] = (idx, cents)

    cells = [
        (layout, cap)
        for layout in ("uniform", "skewed")
        for cap in (None, args.cap)
    ]
    results: dict[str, list[float]] = {}
    for r in range(args.reps):
        for layout, cap in cells:
            idx, cents = frames[layout]
            key = f"{layout}/{'uncapped' if cap is None else f'cap{cap}'}"
            t0 = time.time()
            n = semdedup_prune_assigned(idx, cents, cap=cap).count()
            dt = round(time.time() - t0, 2)
            results.setdefault(key, []).append(dt)
            print(f"rep{r} {key}: {dt}s pruned={n}", file=sys.stderr)
    out = {
        "mult": mult,
        "k": k,
        "cap": args.cap,
        "hot_frac": args.hot_frac,
        "cells": results,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
