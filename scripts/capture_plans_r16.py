"""Capture .explain('formatted') plans for the r16-touched operators into
plans/r16/ (run once on the BEFORE tree with --tag before, once on the
AFTER tree with --tag after).

The streaming queries' returned frames are spill scans (the pipeline runs
eagerly inside the query fn), so their evidence is per-batch trigger
timings (scripts/triage_stream_one.py), not explain output; this script
captures the operators whose ANALYZED PLANS changed: pq train round /
encode (fold-count reduction, lazy round checkpoints) and the
hierarchical k-means assignment reuse.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, choices=["before", "after"])
    ap.add_argument("--sf", default="sf0.01")
    args = ap.parse_args()
    sf_dir = os.path.join("/root/testdata", args.sf)
    outdir = os.path.join(REPO, "plans", "r16")
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from proteus_spark import registry
    import proteus_spark.llmops.similarity as S

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("capture_plans_r16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = registry.load(spark, sf_dir, "embeddings")

    def dump(name: str, df) -> None:
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print("wrote", path)

    # pq: one training-round frame (the per-round assignment+means chain,
    # pre-checkpoint) and the encode frame — the hot full-corpus passes
    books = S.pq_train(emb)
    dump("pq_encode", S.pq_encode(emb, books))
    queries = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    dump("pq_topk", S.pq_topk(emb, queries, books, k=3, rerank=16))

    # hierarchical k-means + semdedup prune over its index
    cents, idx = S.kmeans_train_hierarchical(emb, k=8, kc=4, rounds=2)
    dump("semdedup_hier_prune", S.semdedup_prune_assigned(idx, cents))
    return 0


if __name__ == "__main__":
    sys.exit(main())
