"""Deterministic release of localCheckpoint storage blocks.

``DataFrame.unpersist()`` goes through the CacheManager and is a silent
no-op for ``localCheckpoint``-backed frames: their blocks belong to the
LogicalRDD's underlying RDD, not to a cached query plan. Left alone, the
blocks are only freed after a Python ref drop, a py4j detach AND a JVM
ContextCleaner cycle — three conditions a long single-session run (the
175-query oracle gate, the bench best-of-N loop) does not reliably hit
between queries, which let dead checkpoint blocks accrete until a later
query OOMed a 1g plain-session heap (optimization r15 #8).

``release(df)`` frees the blocks NOW by unpersisting the checkpointed RDD
itself. Only call it on frames that are truly dead: a released checkpoint
frame cannot be recomputed (its lineage was truncated), so any later
action on it — including collecting a returned result — would fail.
Iterative operators therefore release round N-2's frame only after round
N's replacement is materialized, and never release the frame they
return."""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)

# Observability (ADVICE r15): release() reaches through py4j internals
# (queryExecution().analyzed().rdd()), so a Spark upgrade that moves the
# accessor — or a Connect-backed session without _jdf — silently turns
# every release into a no-op and resurrects the checkpoint-accretion OOM
# this path exists to prevent. The failure COUNT is surfaced module-wide
# and the first failure per process logs at WARNING, so a degraded
# release path is visible outside the test suite's persistent-RDD pins.
release_failures: int = 0
_warned = False


def release(df: DataFrame | None) -> None:
    """Free a dead localCheckpoint frame's storage blocks immediately.

    Best-effort: release is hygiene, never a failure path (a torn-down
    session mid-release is fine) — but failures are counted in
    ``release_failures`` and the first one logs, so a silently-degraded
    path is observable."""
    global release_failures, _warned
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return  # not checkpoint-backed (nothing persisted): no-op
        plan.rdd().unpersist(False)
    except Exception as exc:
        release_failures += 1
        if not _warned:
            _warned = True
            _log.warning(
                "checkpoint release failed (%s: %s) — localCheckpoint "
                "blocks will only be freed by GC; further failures are "
                "counted in proteus_spark.plans.ckpt.release_failures",
                type(exc).__name__, exc,
            )
