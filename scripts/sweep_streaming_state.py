"""Streaming-state maintenance sweep: prove per-batch write cost is
O(|delta| + |touched buckets|), not O(|state|).

Round-2's SumView rewrote the whole state table per micro-batch — the
classic incremental-view scale killer (the reference's sink is per-row
UPSERT, mysql_backend.go:147-254). Round 3 replaced it with the
hash-bucket-partitioned `_BucketedState`. This sweep drives the CDC merge
path directly (the exact foreachBatch hook) at two key cardinalities a
decade apart and records bytes written per version:

    python scripts/sweep_streaming_state.py

Expected shape (and what makes it O(delta)): the bootstrap batch writes
the full state once; every subsequent D-key delta batch writes only the
buckets containing those keys — bytes per delta batch grow with
|touched buckets| * |bucket| ≈ min(D, B) * K/B, NOT with a full copy of
K rows. With D << B the cost is a handful of buckets regardless of K. At
deployment scale B rises with key cardinality (it is a constructor knob),
holding bucket size — and so per-batch cost — roughly constant.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from proteus_spark.session import build_session  # noqa: E402
from proteus_spark.streaming.views import SumView  # noqa: E402


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def run(spark, n_keys: int, delta_keys: int, n_batches: int, n_buckets: int):
    base = spark.range(n_keys).select(
        F.col("id").alias("k"),
        F.lit(None).cast("double").alias("old_value"),
        (F.col("id") % 97).cast("double").alias("new_value"),
    )
    view = SumView(
        spark, stream=None, group_by="k", agg_attr="new_value",
        name="sweep", mode="cdc", n_buckets=n_buckets,
    )
    results = []
    try:
        view._on_cdc_batch(base, epoch=0)
        v0 = du(view._state._vdir(0))
        results.append({"batch": 0, "kind": "bootstrap", "bytes": v0})
        for e in range(1, n_batches + 1):
            delta = spark.range(delta_keys).select(
                ((F.col("id") * 7919 + e) % n_keys).alias("k"),
                F.lit(None).cast("double").alias("old_value"),
                F.lit(1.0).alias("new_value"),
            )
            view._on_cdc_batch(delta, epoch=e)
            results.append(
                {"batch": e, "kind": "delta", "bytes": du(view._state._vdir(e))}
            )
        # correctness spot-check: converged total == base + all deltas
        got = view.snapshot().agg(F.sum("new_value_sum")).collect()[0][0]
        exp = sum(i % 97 for i in range(n_keys)) + 1.0 * delta_keys * n_batches
        assert abs(got - exp) < 1e-6, (got, exp)
    finally:
        view.stop()
    return results, v0


def main():
    spark = build_session(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n_keys in (200_000, 2_000_000):
        res, v0 = run(
            spark, n_keys=n_keys, delta_keys=1_000, n_batches=4, n_buckets=32
        )
        deltas = [r["bytes"] for r in res if r["kind"] == "delta"]
        out[f"keys_{n_keys}"] = {
            "bootstrap_bytes": v0,
            "delta_batch_bytes": deltas,
            "delta_over_state": round(max(deltas) / v0, 4),
        }
        print(json.dumps({"n_keys": n_keys, **out[f"keys_{n_keys}"]}),
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()


def run_latency_series(spark, n_keys: int, delta_keys: int, n_batches: int):
    """Per-batch commit latency over a LONG batch sequence: compaction
    must amortize — batch times stay flat (no monotonic growth as chains
    accumulate and fold)."""
    import time

    from pyspark.sql import functions as F

    base = spark.range(n_keys).select(
        F.col("id").alias("k"),
        F.lit(None).cast("double").alias("old_value"),
        (F.col("id") % 97).cast("double").alias("new_value"),
    )
    view = SumView(
        spark, stream=None, group_by="k", agg_attr="new_value",
        name="sweep_lat", mode="cdc", n_buckets=32,
    )
    times = []
    try:
        view._on_cdc_batch(base, epoch=0)
        for e in range(1, n_batches + 1):
            delta = spark.range(delta_keys).select(
                ((F.col("id") * 7919 + e) % n_keys).alias("k"),
                F.lit(None).cast("double").alias("old_value"),
                F.lit(1.0).alias("new_value"),
            )
            t0 = time.perf_counter()
            view._on_cdc_batch(delta, epoch=e)
            times.append(round(time.perf_counter() - t0, 3))
    finally:
        view.stop()
    return times
